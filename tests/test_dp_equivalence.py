"""DP-vs-single-device numerical equivalence + DP CLI wiring tests.

The DP train step must be *correct*, not just alive: a pmean'd step over a
[D·b] global batch has to produce exactly the gradients/loss of averaging
D independent single-device shard computations with the same per-shard
rngs (the semantics `parallel/dp.py` promises). These tests recompute the
per-shard losses/grads on one device with `jax.value_and_grad` and compare
the resulting parameters against the shard_map step at tight tolerance.
"""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy integration tier (conftest --slow)

import jax
import jax.numpy as jnp
import numpy as np

from text2pos_tpu.config import TrainConfig
from text2pos_tpu.data.hints import (Vocabulary, build_vocabulary,
                                     create_hint_description)
from text2pos_tpu.data.loaders import CoarseLoader, FineLoader
from text2pos_tpu.ops.transforms import prepare_object_points
from text2pos_tpu.parallel.dp import (dp_coarse_train_step, dp_fine_train_step,
                                      make_mesh, stack_microbatches)
from text2pos_tpu.train.coarse import CoarseTrainer
from text2pos_tpu.train.fine import FineTrainer
from text2pos_tpu.train.losses import (matching_loss, pairwise_ranking_loss)

D = 4

TINY = dict(batch_size=2, embed_dim=16, num_layers=2, sinkhorn_iters=10,
            pointnet_numpoints=32, coarse_max_objects=16, pad_size=8,
            num_mentioned=6, max_text_len=48, max_hint_len=12)


def _trees_close(a, b, atol=1e-4, rtol=6e-4):
    """Per-leaf |x−y|∞ ≤ atol + rtol·|x|∞.

    atol+rtol, because (a) f32 reduction-order noise (psum tree vs
    sequential sum; different XLA fusion contexts) scales with gradient
    magnitude and (b) bias-before-BatchNorm leaves have mathematically
    ZERO gradient (BN subtracts the mean), leaving pure float noise where
    any relative metric explodes. A genuine DP bug (wrong pmean, missing
    shard, stale rng) produces diffs at the gradient scale, orders of
    magnitude above these tolerances. Measured noise on the coarse step
    (8 virtual CPU devices): max relative diff ≈ 2.7e-4 on the pointnet
    kernels — the f32 rank-select contractions fuse differently inside
    shard_map than in a plain jit."""
    def ok(x, y):
        return bool(jnp.max(jnp.abs(x - y))
                    <= atol + rtol * jnp.max(jnp.abs(x)))

    bad = [k for k, good in zip(
        jax.tree_util.tree_leaves_with_path(jax.tree.map(ok, a, b)),
        jax.tree.leaves(jax.tree.map(ok, a, b))) if not good]
    return not bad, bad


def _with_sgd(state):
    """Swap the optimizer for SGD(1.0): after one step the parameter delta
    IS the (pmean'd) gradient, so the equivalence check compares gradients
    at tight tolerance. (Adam would amplify reduction-order noise on
    near-zero gradients into sign-flipped ±lr updates.)"""
    import optax

    from text2pos_tpu.train.state import TrainState

    return TrainState.create(state.params, state.batch_stats, optax.sgd(1.0))


@pytest.fixture(scope="module")
def setup(synthetic_data):
    cells, poses = synthetic_data
    cfg = TrainConfig(**TINY)
    vocab = Vocabulary(build_vocabulary(
        [create_hint_description(p) for p in poses]))
    return cells, poses, cfg, vocab


class TestCoarseDPEquivalence:
    def test_dp_step_equals_mean_of_shard_steps(self, setup):
        cells, poses, cfg, vocab = setup
        loader = CoarseLoader(cells, poses, vocab, cfg.batch_size,
                              cfg.coarse_max_objects, cfg.pointnet_numpoints,
                              cfg.max_text_len)
        trainer = CoarseTrainer(cfg, vocab)
        rng = jax.random.PRNGKey(0)
        it = loader.epoch(seed=0, drop_last=False)
        micro = [next(it) for _ in range(D)]
        state = _with_sgd(trainer.init_state(micro[0], rng, steps_per_epoch=1))

        mesh = make_mesh(D)
        step = dp_coarse_train_step(trainer, mesh)
        step_rng = jax.random.PRNGKey(42)
        state_dp, loss_dp = step(state, stack_microbatches(micro), step_rng)

        # Manual single-device reference: same per-shard rngs, same loss,
        # mean over shards, one apply_gradients.
        rngs = jax.random.split(step_rng, D)
        losses, grads_list, bs_list = [], [], []
        for d in range(D):
            batch = {k: jnp.asarray(v) for k, v in micro[d].items()
                     if k not in ("num_real", "pose_idx")}
            pts, cols = prepare_object_points(
                batch["points_xyz"], batch["points_rgb"],
                batch["point_count"], cfg.pointnet_numpoints, rngs[d],
                augment=True, no_pc_augment=cfg.no_pc_augment)

            def loss_fn(p):
                (text, cellsE), updates = trainer.model.apply(
                    {"params": p, "batch_stats": state.batch_stats},
                    batch["tokens"], batch["lengths"], pts, cols,
                    batch["centers"], batch["colors"], batch["class_idx"],
                    batch["color_idx"], batch["flat_valid"],
                    batch["cell_idx"], batch["slot_idx"],
                    batch["tokens"].shape[0], cfg.coarse_max_objects,
                    train=True, mutable=["batch_stats"])
                return (pairwise_ranking_loss(text, cellsE, cfg.margin),
                        updates["batch_stats"])

            (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            losses.append(loss)
            grads_list.append(grads)
            bs_list.append(bs)

        mean = lambda ts: jax.tree.map(lambda *xs: sum(xs) / D, *ts)
        state_ref = state.apply_gradients(mean(grads_list), mean(bs_list))

        assert np.isfinite(float(loss_dp))
        assert abs(float(loss_dp) - float(np.mean([float(l) for l in losses]))
                   ) < 1e-5
        ok, bad = _trees_close(state_dp.params, state_ref.params)
        assert ok, f"param/grad mismatch at {bad}"
        ok, bad = _trees_close(state_dp.batch_stats, state_ref.batch_stats)
        assert ok, f"batch_stats mismatch at {bad}" 


class TestFineDPEquivalence:
    def test_dp_step_equals_mean_of_shard_steps(self, setup):
        cells, poses, cfg, vocab = setup
        loader = FineLoader(cells, poses, vocab, cfg.batch_size, cfg.pad_size,
                            cfg.num_mentioned, cfg.pointnet_numpoints,
                            cfg.max_hint_len)
        trainer = FineTrainer(cfg, vocab)
        rng = jax.random.PRNGKey(0)
        it = loader.epoch(seed=0, drop_last=False)
        micro = [next(it) for _ in range(D)]
        state = _with_sgd(trainer.init_state(micro[0], rng, steps_per_epoch=1))

        mesh = make_mesh(D)
        step = dp_fine_train_step(trainer, mesh)
        step_rng = jax.random.PRNGKey(7)
        state_dp, loss_dp = step(state, stack_microbatches(micro), step_rng)

        rngs = jax.random.split(step_rng, D)
        losses, grads_list, bs_list = [], [], []
        for d in range(D):
            batch = {k: jnp.asarray(v) for k, v in micro[d].items()
                     if k not in ("num_real", "pose_idx")}
            pts, cols = prepare_object_points(
                batch["points_xyz"], batch["points_rgb"],
                batch["point_count"], cfg.pointnet_numpoints, rngs[d],
                augment=True, no_pc_augment=cfg.no_pc_augment)

            def loss_fn(p):
                out, updates = trainer.model.apply(
                    {"params": p, "batch_stats": state.batch_stats},
                    batch["hint_tokens"], batch["hint_lengths"], pts, cols,
                    batch["centers"], batch["colors"], batch["class_idx"],
                    batch["color_idx"], train=True, mutable=["batch_stats"])
                loss = matching_loss(out["log_P"], batch["all_matches"],
                                     batch["all_matches_count"])
                loss = loss + 5.0 * jnp.mean(
                    (out["offsets"] - batch["offsets"]) ** 2)
                return loss, updates["batch_stats"]

            (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            losses.append(loss)
            grads_list.append(grads)
            bs_list.append(bs)

        mean = lambda ts: jax.tree.map(lambda *xs: sum(xs) / D, *ts)
        state_ref = state.apply_gradients(mean(grads_list), mean(bs_list))

        assert np.isfinite(float(loss_dp))
        assert abs(float(loss_dp) - float(np.mean([float(l) for l in losses]))
                   ) < 1e-5
        ok, bad = _trees_close(state_dp.params, state_ref.params)
        assert ok, f"param/grad mismatch at {bad}" 


class TestDPCLIWiring:
    def test_coarse_train_driver_with_data_parallel(self, setup, tmp_path):
        """--data_parallel reaches train.coarse.train: one DP epoch runs,
        loss is finite, a checkpoint lands on disk."""
        from text2pos_tpu.train import coarse

        cells, poses, _, _ = setup
        cfg = TrainConfig(**{**TINY, "epochs": 2, "data_parallel": D,
                             "max_batches": 2})
        state, res = coarse.train(cfg, cells, poses, cells, poses,
                                  checkpoint_dir=str(tmp_path),
                                  log=lambda *a, **k: None)
        assert np.isfinite(res["history"]["train_loss"][-1])
        assert res["best_path"] is not None

    def test_fine_train_driver_with_data_parallel(self, setup, tmp_path):
        from text2pos_tpu.train import fine

        cells, poses, _, _ = setup
        cfg = TrainConfig(**{**TINY, "epochs": 2, "data_parallel": D,
                             "max_batches": 2})
        state, res = fine.train(cfg, cells, poses, cells, poses,
                                checkpoint_dir=str(tmp_path),
                                log=lambda *a, **k: None)
        assert np.isfinite(res["history"]["train"][-1]["loss"])
        assert res["best_path"] is not None

    def test_dp_encode_all_cells_exact_vs_manual(self, setup):
        """dp_encode_all_cells (the pipeline's --data_parallel DB encoding)
        must EXACTLY reproduce a single-device computation that mirrors its
        grouping + per-shard rng folds — including the padded trailing
        group. Exact-index retrieval agreement is not a testable property
        (FixedPoints resampling is rng-fold-dependent), but this is: same
        folds → same sampled points → same embeddings."""
        from text2pos_tpu.data.dense import flatten_bank_slice
        from text2pos_tpu.parallel.dp import dp_encode_all_cells

        import dataclasses

        cells, poses, cfg, vocab = setup
        loader = CoarseLoader(cells, poses, vocab, cfg.batch_size,
                              cfg.coarse_max_objects, cfg.pointnet_numpoints,
                              cfg.max_text_len)
        trainer = CoarseTrainer(cfg, vocab)
        rng0 = jax.random.PRNGKey(0)
        state = trainer.init_state(next(loader.epoch(seed=0)), rng0, 1)
        mesh = make_mesh(D)
        B = cfg.batch_size
        group = B * D
        # Trim the bank so the trailing group is partial and padding is
        # exercised (the fixture's 16 cells divide evenly into 2·4 groups).
        n = loader.bank.num_cells - 3
        bank = dataclasses.replace(
            loader.bank,
            **{f.name: getattr(loader.bank, f.name)[:n]
               for f in dataclasses.fields(loader.bank)})
        assert bank.num_cells % group != 0, bank.num_cells

        rng = jax.random.PRNGKey(3)
        got = dp_encode_all_cells(trainer, state, bank, mesh, rng)
        assert got.shape == (bank.num_cells, cfg.embed_dim)

        flat_cap = B * cfg.coarse_max_objects
        want = []
        for i in range(0, bank.num_cells, group):
            idx = np.arange(i, min(i + group, bank.num_cells))
            real = len(idx)
            if real < group:
                idx = np.concatenate([idx, np.zeros(group - real, np.int64)])
            rngs = jax.random.split(jax.random.fold_in(rng, i), D)
            for d in range(D):
                flat = flatten_bank_slice(bank, idx[d * B:(d + 1) * B],
                                          flat_cap)
                jb = {k: jnp.asarray(v) for k, v in flat.items()}
                pts, cols = prepare_object_points(
                    jb["points_xyz"], jb["points_rgb"], jb["point_count"],
                    cfg.pointnet_numpoints, rngs[d], augment=False,
                    no_pc_augment=cfg.no_pc_augment)
                enc = trainer.model.apply(
                    {"params": state.params,
                     "batch_stats": state.batch_stats},
                    pts, cols, jb["centers"], jb["colors"], jb["class_idx"],
                    jb["color_idx"], jb["flat_valid"], jb["cell_idx"],
                    jb["slot_idx"], B, cfg.coarse_max_objects, train=False,
                    method=type(trainer.model).encode_objects)
                want.append(np.asarray(enc))
            want[-D:] = [np.concatenate(want[-D:])[:real]]
        want = np.concatenate(want)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)

    def test_pipeline_routes_through_mesh(self, setup):
        """A LocalizationPipeline built with a mesh must produce retrievals
        via dp_encode_all_cells (wiring check: shapes + finite accs)."""
        from text2pos_tpu.config import EvalConfig
        from text2pos_tpu.evaluation.pipeline import LocalizationPipeline

        cells, poses, cfg, vocab = setup
        loader = CoarseLoader(cells, poses, vocab, cfg.batch_size,
                              cfg.coarse_max_objects, cfg.pointnet_numpoints,
                              cfg.max_text_len)
        coarse_tr = CoarseTrainer(cfg, vocab)
        fine_tr = FineTrainer(cfg, vocab)
        rng = jax.random.PRNGKey(0)
        cstate = coarse_tr.init_state(next(loader.epoch(seed=0)), rng, 1)
        floader = FineLoader(cells, poses, vocab, cfg.batch_size, cfg.pad_size,
                             cfg.num_mentioned, cfg.pointnet_numpoints,
                             cfg.max_hint_len)
        fstate = fine_tr.init_state(next(floader.epoch(seed=0)), rng, 1)
        ecfg = EvalConfig(top_k=(1, 3), threshs=(5, 10, 15),
                          pad_size=cfg.pad_size,
                          num_mentioned=cfg.num_mentioned,
                          max_hint_len=cfg.max_hint_len,
                          max_text_len=cfg.max_text_len,
                          pointnet_numpoints=cfg.pointnet_numpoints)
        sharded = LocalizationPipeline(coarse_tr, cstate, fine_tr, fstate,
                                       ecfg, mesh=make_mesh(D))
        top_d, accs = sharded.run_coarse(loader, poses)
        assert top_d.shape == (len(poses), 3)
        assert all(np.isfinite(v) for by_t in accs.values()
                   for v in by_t.values())
