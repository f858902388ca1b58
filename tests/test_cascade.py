"""Cascaded re-ranking (serve_batch prune_m): cheap truncated-matcher
pass over all rerank_k candidates → keep top prune_m → full fine pass.

Covers: exact equivalence to brute-force re-ranking when the cheap pass
is the full model, the manual-reorder contract of the truncated cascade,
the int8-quantized cheap bank, and DP equivalence (query-sharded and
DB-sharded) on the virtual 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy integration tier (conftest --slow)

from text2pos_tpu.config import EvalConfig, TrainConfig
from text2pos_tpu.data.hints import (Vocabulary, build_vocabulary,
                                     create_hint_description)

TINY = dict(batch_size=4, embed_dim=16, num_layers=2, sinkhorn_iters=10,
            pointnet_numpoints=32, coarse_max_objects=16, pad_size=8,
            num_mentioned=6, max_text_len=48, max_hint_len=12)
TOP_K, K_ALL, M = 3, 12, 6


@pytest.fixture(scope="module")
def calibrated(synthetic_data):
    """Calibrated tiny pipeline + serve args on the synthetic map."""
    from text2pos_tpu.data.loaders import CoarseLoader, FineLoader
    from text2pos_tpu.evaluation.pipeline import LocalizationPipeline
    from text2pos_tpu.ops.retrieval import topk_retrieval
    from text2pos_tpu.train.coarse import CoarseTrainer
    from text2pos_tpu.train.fine import FineTrainer

    cells, poses = synthetic_data
    cfg = TrainConfig(**TINY)
    vocab = Vocabulary(build_vocabulary(
        [create_hint_description(p) for p in poses]))
    rng = jax.random.PRNGKey(0)
    loader = CoarseLoader(cells, poses, vocab, cfg.batch_size,
                          cfg.coarse_max_objects, cfg.pointnet_numpoints,
                          cfg.max_text_len)
    ct = CoarseTrainer(cfg, vocab)
    cstate = ct.init_state(next(loader.epoch(seed=0)), rng, 1)
    fl = FineLoader(cells, poses, vocab, cfg.batch_size, cfg.pad_size,
                    cfg.num_mentioned, cfg.pointnet_numpoints,
                    cfg.max_hint_len)
    ft = FineTrainer(cfg, vocab)
    fstate = ft.init_state(next(fl.epoch(seed=0)), rng, 1)
    ecfg = EvalConfig(top_k=(1, TOP_K), threshs=(5, 10, 15),
                      pad_size=cfg.pad_size,
                      num_mentioned=cfg.num_mentioned,
                      max_hint_len=cfg.max_hint_len,
                      max_text_len=cfg.max_text_len,
                      coarse_max_objects=cfg.coarse_max_objects,
                      pointnet_numpoints=cfg.pointnet_numpoints)
    pipe0 = LocalizationPipeline(ct, cstate, ft, fstate, ecfg)
    bank = loader.bank
    bank_dev = {k: jnp.asarray(getattr(bank, k)) for k in (
        "points_xyz", "points_rgb", "point_count", "centers", "colors",
        "class_idx", "color_idx", "mask")}

    tokens, lengths = loader.all_query_tokens()
    Q, H, Th = 8, cfg.num_mentioned, cfg.max_hint_len
    htk = np.zeros((Q, H, Th), np.int32)
    hln = np.ones((Q, H), np.int32)
    for i, p in enumerate(poses[:Q]):
        tk, ln = vocab.encode_batch(create_hint_description(p)[:H], Th)
        htk[i, : len(tk)] = tk
        hln[i, : len(ln)] = ln

    cell_enc = pipe0.coarse.encode_all_cells(cstate, bank,
                                             jax.random.PRNGKey(0))
    text_enc = pipe0.coarse.encode_all_queries(cstate, loader)[:Q]
    _, cal_idx = topk_retrieval(jnp.asarray(text_enc),
                                jnp.asarray(cell_enc), TOP_K)
    pipe, fine_bank = pipe0.calibrated_for_serving(
        bank, bank_dev, htk, hln, np.asarray(cal_idx))
    dyn = (jnp.asarray(tokens[:Q]), jnp.asarray(lengths[:Q]),
           jnp.asarray(htk), jnp.asarray(hln))
    return pipe, bank, fine_bank, jnp.asarray(cell_enc), dyn


def _serve(pipe, cell_enc, fine_bank, dyn, *extra):
    return pipe.serve_batch(pipe.coarse_state, pipe.fine_state, *dyn,
                            cell_enc, TOP_K, fine_bank[0], fine_bank[1],
                            *extra)


class TestCascade:
    def test_full_depth_cheap_pass_equals_brute_rerank(self, calibrated):
        """With prune_layers/prune_sinkhorn = the full model, the cheap
        score IS the full score, so pruning to M > top_k then re-ranking
        must reproduce brute-force rerank@K_ALL exactly."""
        pipe, bank, fine_bank, cell_enc, dyn = calibrated
        nl, si = pipe.fine.model.num_layers, pipe.fine.model.sinkhorn_iters
        brute = _serve(pipe, cell_enc, fine_bank, dyn, K_ALL, 2.0, 1.0)
        casc = _serve(pipe, cell_enc, fine_bank, dyn, K_ALL, 2.0, 1.0,
                      M, nl, si)
        for a, b in zip(brute, casc):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_truncated_cascade_matches_manual_two_stage(self, calibrated):
        """serve_batch(prune_m, prune_layers=1) ≡ manual cheap pass with
        the truncated clone → top-M keep → full pass → final re-rank."""
        pipe, bank, fine_bank, cell_enc, dyn = calibrated
        from text2pos_tpu.ops.retrieval import topk_retrieval

        lam, gam, L, S = 2.0, 1.0, 1, 4
        got = _serve(pipe, cell_enc, fine_bank, dyn, K_ALL, lam, gam,
                     M, L, S)

        # Manual mirror.
        cmodel = pipe.coarse.model
        text_enc = cmodel.apply(
            {"params": pipe.coarse_state.params,
             "batch_stats": pipe.coarse_state.batch_stats},
            dyn[0], dyn[1], method=type(cmodel).encode_text)
        sims, wide = topk_retrieval(text_enc, cell_enc, K_ALL)
        fmodel = pipe.fine.model
        hint_enc = fmodel.apply(
            {"params": pipe.fine_state.params,
             "batch_stats": pipe.fine_state.batch_stats},
            dyn[2], dyn[3], method=type(fmodel).encode_hints)
        cheap = fmodel.clone(num_layers=L, sinkhorn_iters=S)
        B = wide.shape[0]
        flat = wide.reshape(-1)
        obj = fine_bank[0][flat].reshape(B, K_ALL, *fine_bank[0].shape[1:])
        ctr = fine_bank[1][flat].reshape(B, K_ALL, *fine_bank[1].shape[1:])
        _, _, _, _, c_conf, c_spread = pipe._match_from_enc(
            pipe.fine_state, obj, ctr, hint_enc, model=cheap)
        score = (np.asarray(c_conf, np.float32)
                 + lam * np.asarray(sims, np.float32)
                 - gam * np.asarray(c_spread, np.float32))
        keep = np.argsort(-score, axis=1, kind="stable")[:, :M]
        rows = np.arange(B)[:, None]
        kept_idx = np.asarray(wide)[rows, keep]
        kept_sims = np.asarray(sims)[rows, keep]
        _, pm, po, cf, cs, sp = pipe._match_chunk_cached(
            pipe.fine_state, fine_bank[0], fine_bank[1],
            jnp.asarray(kept_idx), dyn[2], dyn[3])
        final = (np.asarray(cs, np.float32) + lam * kept_sims
                 - gam * np.asarray(sp, np.float32))
        order = np.argsort(-final, axis=1, kind="stable")[:, :TOP_K]
        np.testing.assert_array_equal(
            np.asarray(got[0], np.int64),
            np.take_along_axis(kept_idx, order, axis=1))
        np.testing.assert_allclose(
            np.asarray(got[2], np.float32),
            np.take_along_axis(np.asarray(po, np.float32),
                               order[..., None], axis=1).astype(np.float16),
            atol=1e-3)

    def test_zero_layer_cheap_pass_serves(self, calibrated):
        """prune_layers=0 — cheap scoring straight from the projected
        pre-GNN descriptors, the cheapest cascade config (no attention
        blocks at all) — must serve: the returned top-k are drawn from
        the wide coarse pool and positions are finite, for both hard
        and soft cheap scores."""
        pipe, bank, fine_bank, cell_enc, dyn = calibrated
        from text2pos_tpu.ops.retrieval import topk_retrieval

        cmodel = pipe.coarse.model
        text_enc = cmodel.apply(
            {"params": pipe.coarse_state.params,
             "batch_stats": pipe.coarse_state.batch_stats},
            dyn[0], dyn[1], method=type(cmodel).encode_text)
        _, wide = topk_retrieval(text_enc, cell_enc, K_ALL)
        wide_sets = [set(r) for r in np.asarray(wide, np.int64)]
        for soft in (False, True):
            got = _serve(pipe, cell_enc, fine_bank, dyn, K_ALL, 2.0, 1.0,
                         M, 0, 4, soft)
            idx = np.asarray(got[0], np.int64)
            assert idx.shape == (dyn[0].shape[0], TOP_K)
            for r, ws in zip(idx, wide_sets):
                assert set(r) <= ws
            assert np.all(np.isfinite(np.asarray(got[2], np.float32)))

    def test_int8_cheap_bank_roundtrip_and_serving(self, calibrated):
        """quantize_fine_bank error stays within the per-object scale
        bound, and the int8-cheap-bank cascade selects exactly what a
        manually dequantized cheap pass selects."""
        pipe, bank, fine_bank, cell_enc, dyn = calibrated
        from text2pos_tpu.evaluation.pipeline import quantize_fine_bank

        qb, qs = quantize_fine_bank(fine_bank[0])
        deq = np.asarray(qb, np.float32) * np.asarray(qs, np.float32)
        err = np.abs(deq - np.asarray(fine_bank[0], np.float32))
        bound = np.asarray(qs, np.float32) * 0.5 + 1e-7
        assert np.all(err <= bound)

        got = _serve(pipe, cell_enc, fine_bank, dyn, K_ALL, 2.0, 1.0,
                     M, 1, 4, False, qb, qs)
        assert np.asarray(got[0]).shape == (dyn[0].shape[0], TOP_K)
        assert np.all(np.isfinite(np.asarray(got[2], np.float32)))
        # The int8 cheap pass must pick (nearly) the same survivors as a
        # full-precision cheap pass — quantization noise may flip exact
        # near-ties, so compare top-k SETS with a high overlap bar. (The
        # full pass reads the real bank in both runs.)
        ref = _serve(pipe, cell_enc, fine_bank, dyn, K_ALL, 2.0, 1.0,
                     M, 1, 4)
        overlap = np.mean([len(set(x) & set(y)) / TOP_K
                           for x, y in zip(np.asarray(got[0], np.int64),
                                           np.asarray(ref[0], np.int64))])
        assert overlap >= 0.9


class TestCascadeSoft:
    def test_soft_cheap_pass_matches_manual_soft_scores(self, calibrated):
        """serve_batch(prune_soft=True) keeps exactly the top-M by the
        soft transport-mass/vote-spread score (losses.soft_mass_and_
        spread) — verified against a manual mirror."""
        from text2pos_tpu.ops.retrieval import topk_retrieval
        from text2pos_tpu.train.losses import soft_mass_and_spread

        pipe, bank, fine_bank, cell_enc, dyn = calibrated
        lam, gam, L, S = 2.0, 1.0, 1, 4
        got = _serve(pipe, cell_enc, fine_bank, dyn, K_ALL, lam, gam,
                     M, L, S, True)
        assert np.asarray(got[0]).shape == (dyn[0].shape[0], TOP_K)

        # Manual: soft cheap scores over the wide pool.
        cmodel = pipe.coarse.model
        text_enc = cmodel.apply(
            {"params": pipe.coarse_state.params,
             "batch_stats": pipe.coarse_state.batch_stats},
            dyn[0], dyn[1], method=type(cmodel).encode_text)
        sims, wide = topk_retrieval(text_enc, cell_enc, K_ALL)
        fmodel = pipe.fine.model
        variables = {"params": pipe.fine_state.params,
                     "batch_stats": pipe.fine_state.batch_stats}
        hint_enc = fmodel.apply(variables, dyn[2], dyn[3],
                                method=type(fmodel).encode_hints)
        cheap = fmodel.clone(num_layers=L, sinkhorn_iters=S)
        B = wide.shape[0]
        flat = wide.reshape(-1)
        obj = fine_bank[0][flat]
        ctr = fine_bank[1][flat]
        pad = obj.shape[1]
        out = cheap.apply(variables, obj,
                          jnp.repeat(hint_enc, K_ALL, axis=0),
                          train=False, method=type(cheap).match_encoded)
        mass, spr = soft_mass_and_spread(
            out["P"].reshape(B, K_ALL, pad + 1, -1),
            ctr.reshape(B, K_ALL, pad, 2),
            out["offsets"].reshape(B, K_ALL, -1, 2))
        score = (np.asarray(mass) + lam * np.asarray(sims, np.float32)
                 - gam * np.asarray(spr))
        keep = np.argsort(-score, axis=1, kind="stable")[:, :M]
        rows = np.arange(B)[:, None]
        kept_idx = np.asarray(wide)[rows, keep]
        # The final top-k must be a subset of the soft-kept set, per row.
        got_idx = np.asarray(got[0], np.int64)
        for r in range(B):
            assert set(got_idx[r]) <= set(kept_idx[r])


class TestCascadeDP:
    def test_query_sharded_cascade_matches_single_device(self, calibrated):
        from text2pos_tpu.parallel.dp import dp_serve_batch, make_mesh

        pipe, bank, fine_bank, cell_enc, dyn = calibrated
        ref = _serve(pipe, cell_enc, fine_bank, dyn, K_ALL, 2.0, 1.0,
                     M, 1, 4)
        serve = dp_serve_batch(pipe, make_mesh(4), TOP_K, K_ALL,
                               rerank_lambda=2.0, rerank_gamma=1.0,
                               prune_m=M, prune_layers=1, prune_sinkhorn=4)
        got = serve(pipe.coarse_state, pipe.fine_state, cell_enc,
                    fine_bank[0], fine_bank[1], *dyn)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_db_sharded_cascade_matches_single_device(self, calibrated):
        from text2pos_tpu.parallel.dp import (dp_serve_batch_dbsharded,
                                              make_mesh)

        pipe, bank, fine_bank, cell_enc, dyn = calibrated
        ref = _serve(pipe, cell_enc, fine_bank, dyn, K_ALL, 2.0, 1.0,
                     M, 1, 4)
        D = 4
        C = cell_enc.shape[0]
        padn = (-C) % D
        z = lambda a: jnp.concatenate(
            [a, jnp.zeros((padn,) + a.shape[1:], a.dtype)]) if padn else a
        serve = dp_serve_batch_dbsharded(
            pipe, make_mesh(D), TOP_K, K_ALL, num_real_cells=C,
            rerank_lambda=2.0, rerank_gamma=1.0, prune_m=M,
            prune_layers=1, prune_sinkhorn=4)
        got = serve(pipe.coarse_state, pipe.fine_state, z(cell_enc),
                    z(fine_bank[0]), z(fine_bank[1]), *dyn)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
