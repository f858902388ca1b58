"""Losses and match metrics vs direct NumPy ports of the reference math."""

import jax.numpy as jnp
import numpy as np

from text2pos_tpu.train.losses import (
    calc_pose_error,
    calc_recall_precision,
    hardest_ranking_loss,
    matching_loss,
    pairwise_ranking_loss,
)


def np_pairwise_ranking(im, s, margin):
    """Port of reference losses.py:139-164."""
    im = im / np.linalg.norm(im, axis=1, keepdims=True)
    s = s / np.linalg.norm(s, axis=1, keepdims=True)
    scores = im @ s.T
    diagonal = np.diag(scores)
    cost_s = np.maximum(0.0, (margin - diagonal)[:, None] + scores)
    cost_im = np.maximum(0.0, ((margin - diagonal)[:, None] + scores.T))
    np.fill_diagonal(cost_s, 0)
    np.fill_diagonal(cost_im, 0)
    return (cost_s.sum() + cost_im.sum()) / len(im)


class TestRankingLosses:
    def test_pairwise_matches_reference(self, rng):
        a = rng.normal(size=(8, 16)).astype(np.float32)
        p = rng.normal(size=(8, 16)).astype(np.float32)
        got = float(pairwise_ranking_loss(jnp.asarray(a), jnp.asarray(p), 0.35))
        want = np_pairwise_ranking(a, p, 0.35)
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_perfect_alignment_low_loss(self, rng):
        a = rng.normal(size=(8, 16)).astype(np.float32) * 10
        got = float(pairwise_ranking_loss(jnp.asarray(a), jnp.asarray(a), 0.35))
        rand = float(pairwise_ranking_loss(
            jnp.asarray(a), jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)), 0.35))
        assert got < rand

    def test_hardest_nonnegative(self, rng):
        a = rng.normal(size=(6, 8)).astype(np.float32)
        p = rng.normal(size=(6, 8)).astype(np.float32)
        assert float(hardest_ranking_loss(jnp.asarray(a), jnp.asarray(p))) >= 0


class TestMatchingLoss:
    def test_gt_pairs_only(self, rng):
        B, M, N = 2, 4, 3
        log_P = jnp.asarray(rng.normal(size=(B, M + 1, N + 1)).astype(np.float32))
        # sample 0: 2 pairs; sample 1: 3 pairs
        am = np.zeros((B, 5, 2), np.int32)
        am[0, :2] = [(0, 1), (4, 2)]
        am[0, 2:] = am[0, 0]
        am[1, :3] = [(1, 0), (2, 3), (0, 2)]
        am[1, 3:] = am[1, 0]
        counts = np.array([2, 3], np.int32)
        got = float(matching_loss(log_P, jnp.asarray(am), jnp.asarray(counts)))
        lp = np.asarray(log_P)
        want = np.mean([
            np.mean([-lp[0, 0, 1], -lp[0, 4, 2]]),
            np.mean([-lp[1, 1, 0], -lp[1, 2, 3], -lp[1, 0, 2]]),
        ])
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestRecallPrecision:
    def test_exact_case(self):
        # 2 hints with gt objects [0, 2]; predictions:
        # matches0: obj0→hint0 (correct), obj1→hint1 (wrong obj), obj2→none
        gt = jnp.asarray([[0, 2]])
        matches0 = jnp.asarray([[0, 1, -1]])
        matches1 = jnp.asarray([[0, -1]])
        recall, precision = calc_recall_precision(gt, matches0, matches1)
        # recall: hint0 recovered (matches0[0]==0 or matches1[0]==0) → 1;
        #         hint1 not (matches0[2]!=1, matches1[1]!=2) → 0  ⇒ 0.5
        np.testing.assert_allclose(float(recall), 0.5)
        # precision: predictions (0→0 correct), (1→1 incorrect) ⇒ 0.5
        np.testing.assert_allclose(float(precision), 0.5)

    def test_no_predictions(self):
        gt = jnp.asarray([[0, 1]])
        matches0 = jnp.full((1, 3), -1)
        matches1 = jnp.full((1, 2), -1)
        recall, precision = calc_recall_precision(gt, matches0, matches1)
        assert float(recall) == 0.0 and float(precision) == 0.0


class TestPoseError:
    def test_reference_example(self):
        """Reference losses.py:203-218 numeric spot-check."""
        centers = jnp.asarray([[[0.0, 0.0], [10.0, 10.0], [99.0, 99.0]]])
        matches0 = jnp.asarray([[0, 1, -1]])
        poses = jnp.asarray([[0.0, 10.0]])
        err_none = float(calc_pose_error(centers, matches0, poses, offsets=None))
        # mean of (0,0) and (10,10) = (5,5); dist to (0,10) = sqrt(50)
        np.testing.assert_allclose(err_none, np.sqrt(50), rtol=1e-5)
        offsets = jnp.asarray([[[2.0, 10.0], [-10.0, 0.0], [0.0, 0.0]]])
        err_off = float(calc_pose_error(centers, matches0, poses, offsets=offsets))
        # preds: (0,0)+(2,10)=(2,10); (10,10)+(-10,0)=(0,10); mean=(1,10)
        np.testing.assert_allclose(err_off, 1.0, rtol=1e-5)

    def test_mid_pred(self):
        centers = jnp.zeros((2, 3, 2))
        matches0 = jnp.zeros((2, 3), jnp.int32)
        poses = jnp.asarray([[0.5, 0.5], [1.0, 0.5]])
        err = float(calc_pose_error(centers, matches0, poses, use_mid_pred=True))
        np.testing.assert_allclose(err, 0.25, rtol=1e-5)
