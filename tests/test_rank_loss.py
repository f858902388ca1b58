"""Rank-aware fine-training loss (losses.soft_rank_score /
listwise_rank_loss): numpy mirrors and ordering properties.

The model-level path (SuperGlueMatch.forward_rank + FineTrainer rank
term) is exercised by tests/test_trainers.py-style step tests; here the
score surrogate itself is pinned down.
"""

import jax.numpy as jnp
import numpy as np

from text2pos_tpu.train.losses import listwise_rank_loss, soft_rank_score


def _np_soft_score(P, centers, offsets, gamma):
    T = P[:-1, :-1]
    mass = T.sum()
    if not gamma:
        return mass
    w_h = T.sum(0)                                   # [N]
    pos_h = (T[:, :, None] * centers[:, None, :]).sum(0) / np.maximum(
        w_h, 1e-9)[:, None]
    votes = pos_h + offsets
    wsum = max(w_h.sum(), 1e-9)
    mean_v = (votes * w_h[:, None]).sum(0) / wsum
    d2 = ((votes - mean_v) ** 2).sum(-1)
    spread = np.sqrt((d2 * w_h).sum() / wsum + 1e-12)
    return mass - gamma * spread


class TestSoftRankScore:
    def test_matches_numpy_mirror(self):
        rng = np.random.default_rng(0)
        M, N = 6, 4
        logits = rng.normal(size=(M + 1, N + 1))
        P = np.exp(logits) / np.exp(logits).sum()
        centers = rng.random((M, 2)).astype(np.float32)
        offsets = rng.normal(scale=0.1, size=(N, 2)).astype(np.float32)
        for gamma in (0.0, 3.0):
            got = float(soft_rank_score(jnp.asarray(P, jnp.float32),
                                        jnp.asarray(centers),
                                        jnp.asarray(offsets), gamma))
            want = _np_soft_score(P.astype(np.float32), centers, offsets,
                                  gamma)
            np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_batched_and_broadcast_offsets(self):
        """[R, B, ...] P with [B, ...] offsets broadcast — the trainer's
        negative-scoring shape."""
        rng = np.random.default_rng(1)
        R, B, M, N = 3, 2, 5, 4
        P = rng.random((R, B, M + 1, N + 1)).astype(np.float32)
        centers = rng.random((R, B, M, 2)).astype(np.float32)
        offsets = rng.normal(scale=0.1, size=(B, N, 2)).astype(np.float32)
        got = np.asarray(soft_rank_score(jnp.asarray(P),
                                         jnp.asarray(centers),
                                         jnp.asarray(offsets), 2.0))
        assert got.shape == (R, B)
        for r in range(R):
            for b in range(B):
                want = _np_soft_score(P[r, b], centers[r, b], offsets[b],
                                      2.0)
                np.testing.assert_allclose(got[r, b], want, rtol=1e-5)

    def test_hard_onehot_transport_equals_hard_conf_minus_spread(self):
        """With a one-hot transport (every hint fully matched to one
        object), the soft score reduces to the hard serving score:
        matched mass − γ · RMS vote spread."""
        M, N = 4, 3
        P = np.zeros((M + 1, N + 1), np.float32)
        match = [0, 2, 3]                       # object per hint
        for h, m in enumerate(match):
            P[m, h] = 1.0
        centers = np.array([[0.1, 0.1], [0.9, 0.9], [0.5, 0.5],
                            [0.2, 0.8]], np.float32)
        offsets = np.zeros((N, 2), np.float32)
        votes = centers[match]
        mean_v = votes.mean(0)
        spread = np.sqrt(((votes - mean_v) ** 2).sum(-1).mean())
        got = float(soft_rank_score(jnp.asarray(P), jnp.asarray(centers),
                                    jnp.asarray(offsets), 6.0))
        np.testing.assert_allclose(got, 3.0 - 6.0 * spread, rtol=1e-5)


class TestListwiseRankLoss:
    def test_prefers_high_positive(self):
        neg = jnp.asarray(np.zeros((4, 8), np.float32))
        lo = float(listwise_rank_loss(jnp.full((8,), 2.0), neg))
        hi = float(listwise_rank_loss(jnp.full((8,), -2.0), neg))
        assert lo < hi

    def test_neg_inf_negatives_are_excluded(self):
        """-inf negatives (same-cell collisions) contribute nothing."""
        pos = jnp.asarray(np.array([1.0, 0.5], np.float32))
        neg = jnp.asarray(np.array([[0.0, 0.2], [-np.inf, -np.inf]],
                                   np.float32))
        with_inf = float(listwise_rank_loss(pos, neg))
        only_real = float(listwise_rank_loss(pos, neg[:1]))
        np.testing.assert_allclose(with_inf, only_real, rtol=1e-6)

    def test_temperature_sharpens(self):
        pos = jnp.asarray(np.array([0.5], np.float32))
        neg = jnp.asarray(np.array([[0.0]], np.float32))
        sharp = float(listwise_rank_loss(pos, neg, tau=0.1))
        soft = float(listwise_rank_loss(pos, neg, tau=10.0))
        assert sharp < soft
