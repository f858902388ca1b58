"""Objective functions and match/pose metrics, fully vectorized.

TPU-native rebuild of /root/reference/training/losses.py:
 - MatchingLoss            losses.py:13-30   (−log P at gt pairs incl. dustbins)
 - PairwiseRankingLoss     losses.py:126-164 (Kiros et al., margin both ways)
 - HardestRankingLoss      losses.py:167-200
 - calc_recall_precision   losses.py:33-62
 - calc_pose_error         losses.py:81-123

Unlike the reference (which hardcodes ``.cuda()`` in the ranking loss and
computes metrics in per-sample host loops), everything here is
device-neutral jax and batched.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from text2pos_tpu.models.matcher import get_pos_in_cell


def matching_loss(log_P: jnp.ndarray, all_matches: jnp.ndarray,
                  match_counts: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Mean negative log-likelihood of the ground-truth transport pairs.

    Works in log space directly (the reference takes −log(exp(Z))), which is
    numerically identical but avoids the exp/log round-trip.

    Args:
        log_P:        [B, M+1, N+1] log transport matrix
        all_matches:  [B, L, 2] (obj_idx, hint_idx) pairs incl. dustbin rows;
                      entries past match_counts are repeats and masked out
        match_counts: [B] number of valid pairs per sample
    """
    B, L, _ = all_matches.shape
    obj_idx = all_matches[..., 0]
    hint_idx = all_matches[..., 1]
    vals = log_P[jnp.arange(B)[:, None], obj_idx, hint_idx]  # [B, L]
    valid = jnp.arange(L)[None, :] < match_counts[:, None]
    vf = valid.astype(vals.dtype)
    per_sample = jnp.sum(-vals * vf, axis=1) / jnp.maximum(jnp.sum(vf, axis=1), 1.0)
    return jnp.mean(per_sample)


def pairwise_ranking_loss(anchors: jnp.ndarray, positives: jnp.ndarray,
                          margin: float = 0.35) -> jnp.ndarray:
    """Bidirectional margin ranking over the in-batch score matrix
    (reference losses.py:139-164)."""
    im = anchors / jnp.maximum(jnp.linalg.norm(anchors, axis=1, keepdims=True), 1e-12)
    s = positives / jnp.maximum(jnp.linalg.norm(positives, axis=1, keepdims=True), 1e-12)
    scores = im @ s.T
    diagonal = jnp.diag(scores)

    cost_s = jnp.maximum(0.0, (margin - diagonal)[:, None] + scores)
    cost_im = jnp.maximum(0.0, (margin - diagonal)[:, None] + scores.T)
    eye = jnp.eye(scores.shape[0], dtype=bool)
    cost_s = jnp.where(eye, 0.0, cost_s)
    cost_im = jnp.where(eye, 0.0, cost_im)
    return (jnp.sum(cost_s) + jnp.sum(cost_im)) / scores.shape[0]


def hardest_ranking_loss(images: jnp.ndarray, captions: jnp.ndarray,
                         margin: float = 0.35) -> jnp.ndarray:
    """Hardest-negative variant (reference losses.py:173-200)."""
    im = images / jnp.maximum(jnp.linalg.norm(images, axis=1, keepdims=True), 1e-12)
    cap = captions / jnp.maximum(jnp.linalg.norm(captions, axis=1, keepdims=True), 1e-12)
    scores = im @ cap.T
    diagonal = jnp.diag(scores)
    eye = jnp.eye(scores.shape[0], dtype=bool)

    cost_images = jnp.maximum(0.0, margin + scores - diagonal[:, None])
    cost_images = jnp.where(eye, 0.0, cost_images)
    cost_images = jnp.mean(jnp.max(cost_images, axis=1))

    cost_captions = jnp.maximum(0.0, margin + scores.T - diagonal[:, None])
    cost_captions = jnp.where(eye, 0.0, cost_captions)
    cost_captions = jnp.mean(jnp.max(cost_captions, axis=1))
    return cost_images + cost_captions


def triplet_margin_loss(anchor: jnp.ndarray, positive: jnp.ndarray,
                        negative: jnp.ndarray, margin: float = 0.35) -> jnp.ndarray:
    """torch.nn.TripletMarginLoss equivalent (p=2)."""
    dp = jnp.linalg.norm(anchor - positive, axis=1)
    dn = jnp.linalg.norm(anchor - negative, axis=1)
    return jnp.mean(jnp.maximum(0.0, dp - dn + margin))


def calc_recall_precision(gt_obj_for_hint: jnp.ndarray, matches0: jnp.ndarray,
                          matches1: jnp.ndarray,
                          sample_mask: Optional[jnp.ndarray] = None
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched recall/precision of predicted matches vs ground truth.

    Mirrors reference losses.py:33-62: recall over gt pairs (hint side —
    counted if either direction recovers the pair), precision over
    predicted object→hint matches.

    Args:
        gt_obj_for_hint: [B, H] gt object index per hint, −1 if unmatched
        matches0:        [B, O] predicted hint per object (−1 none)
        matches1:        [B, H] predicted object per hint (−1 none)
        sample_mask:     [B] optional — samples to include in the means
    """
    B, H = gt_obj_for_hint.shape
    O = matches0.shape[1]

    has_gt = gt_obj_for_hint >= 0                                  # [B, H]
    safe_obj = jnp.where(has_gt, gt_obj_for_hint, 0)
    # matches0[gt_obj] == hint OR matches1[hint] == gt_obj
    pred_hint_at_gt_obj = jnp.take_along_axis(matches0, safe_obj, axis=1)
    hit0 = pred_hint_at_gt_obj == jnp.arange(H)[None, :]
    hit1 = matches1 == gt_obj_for_hint
    recalled = (hit0 | hit1) & has_gt
    gt_count = jnp.sum(has_gt, axis=1)
    recall = jnp.where(
        gt_count > 0,
        jnp.sum(recalled, axis=1) / jnp.maximum(gt_count, 1),
        0.0,
    )

    pred = matches0 >= 0                                           # [B, O]
    safe_hint = jnp.where(pred, matches0, 0)
    gt_obj_at_pred_hint = jnp.take_along_axis(gt_obj_for_hint, safe_hint, axis=1)
    correct = pred & (gt_obj_at_pred_hint == jnp.arange(O)[None, :])
    pred_count = jnp.sum(pred, axis=1)
    precision = jnp.where(
        pred_count > 0,
        jnp.sum(correct, axis=1) / jnp.maximum(pred_count, 1),
        0.0,
    )

    if sample_mask is None:
        return jnp.mean(recall), jnp.mean(precision)
    mf = sample_mask.astype(recall.dtype)
    denom = jnp.maximum(jnp.sum(mf), 1.0)
    return jnp.sum(recall * mf) / denom, jnp.sum(precision * mf) / denom


def calc_pose_error(centers_xy: jnp.ndarray, matches0: jnp.ndarray,
                    poses_xy: jnp.ndarray, offsets: Optional[jnp.ndarray] = None,
                    use_mid_pred: bool = False,
                    sample_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean in-cell localization error (reference losses.py:81-123).

    Args:
        centers_xy: [B, O, 2] object centers (cell-normalized)
        matches0:   [B, O]
        poses_xy:   [B, 2] ground-truth in-cell positions
        offsets:    [B, H, 2] per-hint offsets, or None for zero offsets
    """
    B, O, _ = centers_xy.shape
    if use_mid_pred:
        preds = jnp.full((B, 2), 0.5, centers_xy.dtype)
    else:
        if offsets is None:
            offsets = jnp.zeros((B, O, 2), centers_xy.dtype)
        preds = get_pos_in_cell(centers_xy, matches0, offsets)
    err = jnp.linalg.norm(poses_xy - preds, axis=1)
    if sample_mask is None:
        return jnp.mean(err)
    mf = sample_mask.astype(err.dtype)
    return jnp.sum(err * mf) / jnp.maximum(jnp.sum(mf), 1.0)


def soft_rank_score(P: jnp.ndarray, centers_xy: jnp.ndarray,
                    offsets: jnp.ndarray, gamma: float = 0.0
                    ) -> jnp.ndarray:
    """Differentiable surrogate of the serving re-ranking score for one
    (query, cell) transport matrix.

    Serving scores candidates by ``conf + λ·sim − γ·spread`` where conf is
    the summed matched transport mass after hard mutual-max extraction and
    spread the RMS disagreement of the matched hints' position votes
    (evaluation/pipeline._match_confidence_scores/_match_vote_spread).
    Both are non-differentiable through the argmax; the soft surrogate
    replaces hard matches with the transport weights themselves:

      mass      = Σ_{m,n} P[m, n]                 (non-dustbin block)
      pos_h     = Σ_m P[m, h]·center_m / Σ_m P[m, h]
      vote_h    = pos_h + offset_h, weighted by w_h = Σ_m P[m, h]
      spread    = sqrt(Σ_h w_h·‖vote_h − mean‖² / Σ_h w_h)
      score     = mass − γ·spread

    Args:
        P: [..., M+1, N+1] transport probabilities (with dustbins)
        centers_xy: [..., M, 2] object centers (cell-normalized)
        offsets: [..., N, 2] per-hint offset predictions
        gamma: soft vote-spread penalty weight

    Returns: [...] float32 scores.
    """
    mass, spread = soft_mass_and_spread(P, centers_xy, offsets)
    return mass - gamma * spread if gamma else mass


def soft_mass_and_spread(P: jnp.ndarray, centers_xy: jnp.ndarray,
                         offsets: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(soft transport mass, soft vote spread) — the two components of
    the serving score's differentiable surrogate (see soft_rank_score).
    Also used by the cascaded re-ranking's soft cheap pass
    (pipeline.serve_batch prune_soft): computing these from the
    transport matrix alone lets XLA dead-code-eliminate the hard
    mutual-max extraction from the cheap pass."""
    T = P[..., :-1, :-1].astype(jnp.float32)          # [..., M, N]
    mass = jnp.sum(T, axis=(-2, -1))
    w_h = jnp.sum(T, axis=-2)                          # [..., N]
    denom = jnp.maximum(w_h, 1e-9)[..., None]
    pos_h = jnp.einsum("...mn,...md->...nd", T,
                       centers_xy.astype(jnp.float32)) / denom
    votes = pos_h + offsets.astype(jnp.float32)        # [..., N, 2]
    wsum = jnp.maximum(jnp.sum(w_h, axis=-1), 1e-9)
    mean_v = (jnp.sum(votes * w_h[..., None], axis=-2)
              / wsum[..., None])                       # [..., 2]
    d2 = jnp.sum((votes - mean_v[..., None, :]) ** 2, axis=-1)
    spread = jnp.sqrt(jnp.sum(d2 * w_h, axis=-1) / wsum + 1e-12)
    return mass, spread


def listwise_rank_loss(pos_score: jnp.ndarray, neg_scores: jnp.ndarray,
                       tau: float = 1.0) -> jnp.ndarray:
    """Listwise softmax cross-entropy: −log σ(s⁺/τ over {s⁺, s⁻…}).

    Args:
        pos_score: [B] true-cell scores
        neg_scores: [R, B] negative-cell scores
    """
    logits = jnp.concatenate([pos_score[None], neg_scores], axis=0) / tau
    return -jnp.mean(jax.nn.log_softmax(logits, axis=0)[0])
