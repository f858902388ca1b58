"""Query-sharded serving over the 8-device virtual mesh (parallel/dp.py).

dp_serve_batch must produce EXACTLY the single-device serving outputs:
serving is embarrassingly parallel once the fine stage runs with
calibrated (population) BN statistics — with the reference's
batch-statistics BN the shards would normalize by their own sub-batches
and the result would depend on the device count.
"""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy integration tier (conftest --slow)

import jax
import jax.numpy as jnp
import numpy as np

from text2pos_tpu.config import EvalConfig, TrainConfig
from text2pos_tpu.data.hints import (Vocabulary, build_vocabulary,
                                     create_hint_description)
from text2pos_tpu.data.loaders import CoarseLoader, FineLoader
from text2pos_tpu.evaluation.pipeline import LocalizationPipeline
from text2pos_tpu.parallel.dp import dp_serve_batch, make_mesh
from text2pos_tpu.train.coarse import CoarseTrainer
from text2pos_tpu.train.fine import FineTrainer

D = 8
TINY = dict(batch_size=4, embed_dim=16, num_layers=2, sinkhorn_iters=10,
            pointnet_numpoints=32, coarse_max_objects=16, pad_size=8,
            num_mentioned=6, max_text_len=48, max_hint_len=12)
BANK_KEYS = ("points_xyz", "points_rgb", "point_count", "centers", "colors",
             "class_idx", "color_idx", "mask")


@pytest.fixture(scope="module")
def serving_setup(synthetic_data):
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

    Q = 16  # divides the 8-device mesh
    H, Th = cfg.num_mentioned, cfg.max_hint_len
    htk = np.zeros((Q, H, Th), np.int32)
    hln = np.ones((Q, H), np.int32)
    texts = []
    for i, p in enumerate(poses[:Q]):
        hints = create_hint_description(p)[:H]
        texts.append(" ".join(hints))
        tk, ln = vocab.encode_batch(hints, Th)
        htk[i, : len(tk)] = tk
        hln[i, : len(ln)] = ln
    tokens, lengths = vocab.encode_batch(texts, cfg.max_text_len)

    cal_idx = np.random.default_rng(0).integers(0, bank.num_cells, (Q, 3))
    serving, fine_bank = pipe.calibrated_for_serving(
        bank, bank_dev, htk, hln, cal_idx)
    cell_enc = jnp.asarray(serving.coarse.encode_all_cells(
        serving.coarse_state, bank, jax.random.PRNGKey(0)))
    return serving, fine_bank, cell_enc, tokens, lengths, htk, hln


def _pad_db(cell_enc, fine_bank, d):
    """Zero-pad the DB arrays to a multiple of d cells."""
    C = cell_enc.shape[0]
    pad = (-C) % d
    if pad == 0:
        return cell_enc, fine_bank
    z = lambda a: jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
    return z(cell_enc), (z(fine_bank[0]), z(fine_bank[1]))


class TestDBShardedServing:
    """dp_serve_batch_dbsharded: queries AND the map sharded over the
    mesh (two ICI ring passes — rotating retrieval, rotating fine-bank
    gather). Must reproduce single-device serve_batch exactly."""

    @pytest.mark.parametrize("rerank_k,rerank_lambda,rerank_gamma",
                             [(0, 0.0, 0.0), (5, 0.0, 0.0), (5, 0.7, 0.0),
                              (5, 0.7, 5.0)])
    def test_ring_sharded_equals_single_device(self, serving_setup,
                                               rerank_k, rerank_lambda,
                                               rerank_gamma):
        from text2pos_tpu.parallel.dp import dp_serve_batch_dbsharded

        serving, fine_bank, cell_enc, tokens, lengths, htk, hln = \
            serving_setup
        k = 3
        args = (jnp.asarray(tokens), jnp.asarray(lengths),
                jnp.asarray(htk), jnp.asarray(hln))

        single = serving.serve_batch(serving.coarse_state,
                                     serving.fine_state, *args, cell_enc, k,
                                     fine_bank[0], fine_bank[1], rerank_k,
                                     rerank_lambda, rerank_gamma)

        mesh = make_mesh(D)
        C = cell_enc.shape[0]
        ce_p, fb_p = _pad_db(cell_enc, fine_bank, D)
        serve = dp_serve_batch_dbsharded(serving, mesh, k, rerank_k,
                                         num_real_cells=C,
                                         rerank_lambda=rerank_lambda,
                                         rerank_gamma=rerank_gamma)
        sharded = serve(serving.coarse_state, serving.fine_state, ce_p,
                        fb_p[0], fb_p[1], *args)

        for s, d, name in zip(single, sharded,
                              ("top_idx", "pos_mean", "pos_offsets",
                               "confidences")):
            s, d = np.asarray(s), np.asarray(d)
            assert s.shape == d.shape, name
            if s.dtype.kind in "iub":
                np.testing.assert_array_equal(d, s, err_msg=name)
            else:
                np.testing.assert_allclose(d, s, atol=1e-5, err_msg=name)
        # Padding dummies must never be retrieved.
        assert np.asarray(sharded[0]).max() < C


class TestDPServing:
    def test_sharded_equals_single_device(self, serving_setup):
        serving, fine_bank, cell_enc, tokens, lengths, htk, hln = \
            serving_setup
        k = 3
        args = (jnp.asarray(tokens), jnp.asarray(lengths),
                jnp.asarray(htk), jnp.asarray(hln))

        single = serving.serve_batch(serving.coarse_state,
                                     serving.fine_state, *args, cell_enc, k,
                                     fine_bank[0], fine_bank[1])

        mesh = make_mesh(D)
        serve = dp_serve_batch(serving, mesh, k)
        sharded = serve(serving.coarse_state, serving.fine_state, cell_enc,
                        fine_bank[0], fine_bank[1], *args)

        for s, d, name in zip(single, sharded,
                              ("top_idx", "pos_mean", "pos_offsets",
                               "confidences")):
            s, d = np.asarray(s), np.asarray(d)
            assert s.shape == d.shape, name
            if s.dtype.kind in "iub":
                np.testing.assert_array_equal(d, s, err_msg=name)
            else:
                np.testing.assert_allclose(d, s, atol=1e-5, err_msg=name)
