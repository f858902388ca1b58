"""Smoke tests for the auxiliary trainers and evaluators."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2pos_tpu.config import TrainConfig
from text2pos_tpu.data.hints import Vocabulary, build_vocabulary, create_hint_description
from text2pos_tpu.data.loaders import FineLoader

TINY = dict(batch_size=4, embed_dim=16, num_layers=1, sinkhorn_iters=10,
            pointnet_numpoints=32, coarse_max_objects=16, pad_size=8,
            num_mentioned=6, max_hint_len=12, epochs=1, regressor_dim=16)


class TestPointNet2Trainer:
    def test_steps(self, synthetic_data):
        from text2pos_tpu.train.pointnet2 import ObjectsDataset, PointNet2Trainer

        cells, _ = synthetic_data
        cfg = TrainConfig(**TINY)
        ds = ObjectsDataset(cells, cfg.pointnet_numpoints)
        assert len(ds) == sum(len(c.objects) for c in cells)
        trainer = PointNet2Trainer(cfg)
        rng = jax.random.PRNGKey(0)
        batch = next(ds.epoch(cfg.batch_size, 0))
        state = trainer.init_state(batch, rng, 1)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        state, loss, acc = trainer.train_step(state, jb, rng)
        assert np.isfinite(float(loss))
        val = trainer.eval_step(state, jb, rng)
        assert 0.0 <= float(val) <= 1.0

    def test_pretrained_grafting(self, synthetic_data, tmp_path):
        """PointNet2 pretraining output must slot into the ObjectEncoder."""
        from text2pos_tpu.train.pointnet2 import (
            ObjectsDataset, PointNet2Trainer, load_pretrained_into)
        from text2pos_tpu.train.coarse import CoarseTrainer
        from text2pos_tpu.train.state import save_checkpoint
        from text2pos_tpu.data.loaders import CoarseLoader

        cells, poses = synthetic_data
        cfg = TrainConfig(**TINY)
        vocab = Vocabulary(build_vocabulary(
            [create_hint_description(p) for p in poses]))

        ds = ObjectsDataset(cells, cfg.pointnet_numpoints)
        pn_trainer = PointNet2Trainer(cfg)
        rng = jax.random.PRNGKey(0)
        pn_state = pn_trainer.init_state(next(ds.epoch(cfg.batch_size, 0)), rng, 1)
        path = str(tmp_path / "pn.msgpack")
        save_checkpoint(path, pn_state)

        loader = CoarseLoader(cells, poses, vocab, cfg.batch_size,
                              cfg.coarse_max_objects, cfg.pointnet_numpoints,
                              cfg.max_text_len)
        trainer = CoarseTrainer(cfg, vocab)
        state = trainer.init_state(next(loader.epoch(seed=0)), rng, 1)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        grafted = load_pretrained_into(variables, path)
        # Shapes must be compatible.
        chex = jax.tree.map(
            lambda a, b: a.shape == b.shape,
            variables["params"]["object_encoder"]["pointnet"],
            grafted["params"]["object_encoder"]["pointnet"])
        assert all(jax.tree.leaves(chex))


class TestOffsetsTrainer:
    def test_steps(self, synthetic_data):
        from text2pos_tpu.train.offsets import OffsetsTrainer

        cells, poses = synthetic_data
        cfg = TrainConfig(**TINY)
        vocab = Vocabulary(build_vocabulary(
            [create_hint_description(p) for p in poses]))
        loader = FineLoader(cells, poses, vocab, cfg.batch_size, cfg.pad_size,
                            cfg.num_mentioned, cfg.pointnet_numpoints,
                            cfg.max_hint_len)
        trainer = OffsetsTrainer(cfg, vocab)
        rng = jax.random.PRNGKey(0)
        batch = next(loader.epoch(seed=0))
        state = trainer.init_state(batch, rng, 1)
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in ("num_real", "pose_idx")}
        state, loss = trainer.train_step(state, jb)
        assert np.isfinite(float(loss))
        mse, err = trainer.eval_step(state, jb)
        assert np.isfinite(float(mse)) and np.isfinite(float(err))


class TestFineEvaluator:
    def test_run_fine_isolation(self, synthetic_data):
        from text2pos_tpu.evaluation.fine import run_fine
        from text2pos_tpu.train.fine import FineTrainer

        cells, poses = synthetic_data
        cfg = TrainConfig(**TINY)
        vocab = Vocabulary(build_vocabulary(
            [create_hint_description(p) for p in poses]))
        loader = FineLoader(cells, poses, vocab, cfg.batch_size, cfg.pad_size,
                            cfg.num_mentioned, cfg.pointnet_numpoints,
                            cfg.max_hint_len)
        trainer = FineTrainer(cfg, vocab)
        rng = jax.random.PRNGKey(0)
        state = trainer.init_state(next(loader.epoch(seed=0)), rng, 1)
        result = run_fine(trainer, state, loader, log=lambda *a: None)
        stats = result["stats"]
        for key in ("recall", "precision", "mid", "mean", "offsets",
                    "matching_oracle", "offset_oracle", "both_oracle"):
            assert np.isfinite(stats[key]), key
        # Perfect matches + perfect offsets must beat predicted offsets on
        # average (untrained model).
        assert stats["both_oracle"] <= stats["offsets"] + 1e-6
        assert 0.0 <= result["thresh"]["both_oracle"][15] <= 1.0
        # The both-oracle predicts (almost) exactly the pose whenever at
        # least one description is matched.
        assert result["thresh"]["both_oracle"][5] > 0.9


class TestContinueTraining:
    def test_coarse_continue_path(self, tmp_path, synthetic_data):
        """--continue_path restores saved weights into a fresh trainer.

        Mirrors the reference's resume flow (training/coarse.py
        ``args.continue_path`` → ``torch.load``): the restored state must
        carry the checkpoint's parameters, not a fresh initialization,
        and training must proceed from them.
        """
        import dataclasses

        from text2pos_tpu.data.loaders import CoarseLoader
        from text2pos_tpu.train.coarse import CoarseTrainer
        from text2pos_tpu.train.state import save_checkpoint

        cells, poses = synthetic_data
        cfg = TrainConfig(**TINY)
        vocab = Vocabulary(build_vocabulary(
            [create_hint_description(p) for p in poses]))
        loader = CoarseLoader(cells, poses, vocab, cfg.batch_size,
                              cfg.coarse_max_objects, cfg.pointnet_numpoints,
                              cfg.max_text_len)
        rng = jax.random.PRNGKey(0)
        batch = next(loader.epoch(seed=0))

        state = CoarseTrainer(cfg, vocab).init_state(batch, rng, 1)
        state, _ = CoarseTrainer(cfg, vocab).train_step(
            state, {k: jnp.asarray(v) for k, v in batch.items()}, rng)
        path = str(tmp_path / "coarse.msgpack")
        save_checkpoint(path, state)

        cont_cfg = dataclasses.replace(cfg, continue_path=path)
        resumed = CoarseTrainer(cont_cfg, vocab).init_state(
            batch, jax.random.PRNGKey(7), 1)  # different init RNG
        trained = jax.tree_util.tree_leaves(state.params)
        restored = jax.tree_util.tree_leaves(resumed.params)
        for a, b in zip(trained, restored):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        resumed, loss = CoarseTrainer(cont_cfg, vocab).train_step(
            resumed, {k: jnp.asarray(v) for k, v in batch.items()}, rng)
        assert np.isfinite(float(loss))


class TestCheckpointRoundtrip:
    def test_save_load(self, tmp_path, synthetic_data):
        from text2pos_tpu.train.state import (
            TrainState, load_checkpoint, make_optimizer, save_checkpoint)

        tx = make_optimizer(1e-3)
        params = {"w": jnp.arange(6.0).reshape(2, 3)}
        bs = {"m": jnp.ones(3)}
        state = TrainState.create(params, bs, tx)
        path = str(tmp_path / "ckpt.msgpack")
        save_checkpoint(path, state, extra={"known_words": ["a", "b"]})
        payload = load_checkpoint(path)
        np.testing.assert_allclose(payload["params"]["w"], params["w"])
        assert payload["extra"]["known_words"] == ["a", "b"]
