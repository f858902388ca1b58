"""Serving-time BatchNorm calibration (models/blocks.py calibration path +
pipeline.calibrated_for_serving).

The reference's fine model always normalizes with current-batch BN
statistics (training/fine.py:121 never calls eval(); evaluation/pipeline.py
applies eval() only to the retrieval model), which couples each query's
result to its co-batched queries and forces cross-pair reductions into the
serving program. Calibration freezes population statistics once and serves
in true eval mode. These tests pin the two properties that make that
correct and worthwhile:

 1. equivalence — on the calibration population the eval-mode output
    equals the batch-stats output (the captured stats ARE that batch's
    stats, biased variance on purpose);
 2. independence — a calibrated pipeline returns bit-identical positions
    for a query whether it is served alone or inside a larger batch,
    while the batch-stats mode demonstrably does not.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2pos_tpu.config import EvalConfig, TrainConfig
from text2pos_tpu.data.hints import (Vocabulary, build_vocabulary,
                                     create_hint_description)
from text2pos_tpu.data.loaders import CoarseLoader, FineLoader
from text2pos_tpu.evaluation.pipeline import LocalizationPipeline
from text2pos_tpu.train.coarse import CoarseTrainer
from text2pos_tpu.train.fine import FineTrainer

TINY = dict(batch_size=4, embed_dim=16, num_layers=2, sinkhorn_iters=10,
            pointnet_numpoints=32, coarse_max_objects=16, pad_size=8,
            num_mentioned=6, max_text_len=48, max_hint_len=12)

BANK_KEYS = ("points_xyz", "points_rgb", "point_count", "centers", "colors",
             "class_idx", "color_idx", "mask")


@pytest.fixture(scope="module")
def setup(synthetic_data):
    cells, poses = synthetic_data
    cfg = TrainConfig(**TINY)
    vocab = Vocabulary(build_vocabulary(
        [create_hint_description(p) for p in poses]))
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
    ecfg = EvalConfig(top_k=(1, 3), threshs=(5, 10, 15), pad_size=cfg.pad_size,
                      num_mentioned=cfg.num_mentioned,
                      max_hint_len=cfg.max_hint_len,
                      max_text_len=cfg.max_text_len,
                      pointnet_numpoints=cfg.pointnet_numpoints)
    pipe = LocalizationPipeline(coarse_tr, cstate, fine_tr, fstate, ecfg)

    bank = loader.bank
    bank_dev = {k: jnp.asarray(getattr(bank, k)) for k in BANK_KEYS}

    Q, K = 12, 3
    H, Th = cfg.num_mentioned, cfg.max_hint_len
    htk = np.zeros((Q, H, Th), np.int32)
    hln = np.ones((Q, H), np.int32)
    for i, p in enumerate(poses[:Q]):
        tk, ln = vocab.encode_batch(create_hint_description(p)[:H], Th)
        htk[i, : len(tk)] = tk
        hln[i, : len(ln)] = ln
    top_idx = np.random.default_rng(0).integers(0, bank.num_cells, (Q, K))

    serving, fine_bank = pipe.calibrated_for_serving(
        bank, bank_dev, htk, hln, top_idx)
    return pipe, serving, fine_bank, htk, hln, top_idx


class TestCalibrationEquivalence:
    def test_eval_mode_matches_batch_stats_on_population(self, setup):
        pipe, serving, fine_bank, htk, hln, top_idx = setup
        model = pipe.fine.model          # eval_batch_stats=True variant
        assert model.eval_batch_stats
        assert not serving.fine.model.eval_batch_stats

        # Batch-stats forward over the calibration population, using the
        # calibrated object-encoder stats + the calibrated bank (exactly
        # what step 3 of calibration saw).
        variables = {"params": serving.fine_state.params,
                     "batch_stats": serving.fine_state.batch_stats}
        hint_enc = model.apply(variables, jnp.asarray(htk), jnp.asarray(hln),
                               method=type(model).encode_hints)
        K = top_idx.shape[1]
        flat = jnp.asarray(top_idx).reshape(-1)
        obj = fine_bank[0][flat]
        rep = jnp.repeat(hint_enc, K, axis=0)
        out_bs = model.apply(variables, obj, rep, train=False,
                             method=type(model).match_encoded)
        out_ev = serving.fine.model.apply(
            variables, obj, rep, train=False,
            method=type(serving.fine.model).match_encoded)
        np.testing.assert_allclose(np.asarray(out_ev["log_P"]),
                                   np.asarray(out_bs["log_P"]),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out_ev["offsets"]),
                                   np.asarray(out_bs["offsets"]),
                                   atol=1e-4, rtol=1e-4)

    def test_calibrated_stats_differ_from_running(self, setup):
        pipe, serving, *_ = setup
        diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                            pipe.fine_state.batch_stats,
                            serving.fine_state.batch_stats)
        assert max(jax.tree.leaves(diff)) > 1e-3


class TestPerQueryIndependence:
    def test_calibrated_results_independent_of_cobatch(self, setup):
        pipe, serving, fine_bank, htk, hln, top_idx = setup
        args = lambda s: (jnp.asarray(top_idx[s]), jnp.asarray(htk[s]),
                          jnp.asarray(hln[s]))
        full = serving._match_chunk_cached(serving.fine_state, fine_bank[0],
                                           fine_bank[1], *args(slice(0, 8)))
        sub = serving._match_chunk_cached(serving.fine_state, fine_bank[0],
                                          fine_bank[1], *args(slice(0, 2)))
        # positions for queries 0-1 must agree to XLA fusion noise (the two
        # batch shapes compile to different programs; measured cross-shape
        # noise ≤ 1e-7, batch-stats coupling is ≥ 1e-3)
        np.testing.assert_allclose(np.asarray(full[2])[:2],
                                   np.asarray(sub[2]), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(full[0])[:2],
                                      np.asarray(sub[0]))

    def test_batch_stats_mode_couples_cobatched_queries(self, setup):
        """The property calibration buys: WITHOUT it, results depend on the
        rest of the batch (this is the reference's serving semantics)."""
        pipe, serving, fine_bank, htk, hln, top_idx = setup
        args = lambda s: (jnp.asarray(top_idx[s]), jnp.asarray(htk[s]),
                          jnp.asarray(hln[s]))
        full = pipe._match_chunk_cached(pipe.fine_state, fine_bank[0],
                                        fine_bank[1], *args(slice(0, 8)))
        sub = pipe._match_chunk_cached(pipe.fine_state, fine_bank[0],
                                       fine_bank[1], *args(slice(0, 2)))
        diff = np.max(np.abs(np.asarray(full[2])[:2] - np.asarray(sub[2])))
        assert diff > 1e-4, diff  # well above cross-shape fusion noise
