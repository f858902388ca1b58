"""Offline vote-aggregation lab: robust position estimates from raw votes.

The fine stage predicts one position vote per matched hint (matched
object center + that hint's offset); serving averages them
(``models/matcher.py get_pos_in_cell``). This lab replays the dumped
per-(query, slot) votes from ``sweep_rerank.py --save_banks`` through
alternative jit-friendly aggregators and reads top-10@15m accuracy
straight off the recomputed world-space error matrix — no device.

Aggregators (all static-shape over H≤6 votes, implementable in the
serve program):
  mean        masked mean (the serving default / reference behavior,
              superglue_matcher.py:138-161)
  wmean       transport-mass-weighted mean (weights = matching_scores1)
  medoid      vote minimizing summed distance to the other votes
  pair        best-pair consensus: midpoint of the two closest votes
              (RANSAC-style, kills a single outlier among >=3 votes)
  trim        drop the vote farthest from the mean, re-average (n>=3)
  softmedoid  distance-weighted mean: w_i = 1/(eps + sum_j |v_i - v_j|)

Run: python scripts/vote_aggregation_lab.py /tmp/rerank_banks_votes.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def world_err(pos_cell: np.ndarray, d) -> np.ndarray:
    """[Q, K] world-space error for cell-frame positions, inf cross-scene."""
    world = d["bbox_lo"] + pos_cell * d["cell_size"]
    err = np.linalg.norm(world - d["pose_w"][:, None, :], axis=-1)
    return np.where(d["same_scene"], err, np.inf).astype(np.float32)


def aggregate(votes, valid, ms1, kind: str) -> np.ndarray:
    """[Q, K, 2] aggregated cell-frame position (0.5 fallback, like
    get_pos_in_cell)."""
    v = valid[..., None].astype(np.float32)
    n = valid.sum(-1)                                        # [Q, K]
    mean = (votes * v).sum(2) / np.maximum(n, 1)[..., None]
    if kind == "mean":
        out = mean
    elif kind == "wmean":
        w = (ms1 * valid)[..., None]
        out = (votes * w).sum(2) / np.maximum(w.sum(2), 1e-9)
        out = np.where((n > 0)[..., None], out, mean)
    elif kind in ("medoid", "pair", "softmedoid"):
        diff = votes[:, :, :, None, :] - votes[:, :, None, :, :]
        dist = np.linalg.norm(diff, axis=-1)                 # [Q, K, H, H]
        pairmask = valid[:, :, :, None] & valid[:, :, None, :]
        dist = np.where(pairmask, dist, np.inf)
        if kind == "pair":
            H = votes.shape[2]
            dd = dist + np.where(np.eye(H, dtype=bool), np.inf, 0.0)
            flat = dd.reshape(*dd.shape[:2], -1)
            best = flat.argmin(-1)
            i, j = best // H, best % H
            rows = np.arange(dd.shape[0])[:, None]
            cols = np.arange(dd.shape[1])[None, :]
            out = 0.5 * (votes[rows, cols, i] + votes[rows, cols, j])
            out = np.where((n >= 2)[..., None], out, mean)
        else:
            sums = np.where(np.isinf(dist), 0.0, dist).sum(-1)   # [Q, K, H]
            if kind == "medoid":
                sums = np.where(valid, sums, np.inf)
                idx = sums.argmin(-1)
                rows = np.arange(sums.shape[0])[:, None]
                cols = np.arange(sums.shape[1])[None, :]
                out = votes[rows, cols, idx]
                out = np.where((n > 0)[..., None], out, mean)
            else:  # softmedoid
                w = (valid / (1e-3 + sums))[..., None]
                out = (votes * w).sum(2) / np.maximum(w.sum(2), 1e-9)
                out = np.where((n > 0)[..., None], out, mean)
    elif kind == "trim":
        d2 = ((votes - mean[:, :, None, :]) ** 2).sum(-1)
        d2 = np.where(valid, d2, -np.inf)
        far = d2.argmax(-1)
        keep = valid & (np.arange(votes.shape[2])[None, None, :]
                        != far[..., None])
        k = keep[..., None].astype(np.float32)
        out = (votes * k).sum(2) / np.maximum(keep.sum(-1), 1)[..., None]
        out = np.where((n >= 3)[..., None], out, mean)
    else:
        raise ValueError(kind)
    return np.where((n > 0)[..., None], out, 0.5).astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("banks")
    ap.add_argument("--kprime", type=int, nargs="*", default=[100, 128])
    ap.add_argument("--top_k", type=int, default=10)
    ap.add_argument("--gamma", type=float, default=6.0)
    ap.add_argument("--lam", type=float, default=4.0)
    args = ap.parse_args()

    d = np.load(args.banks)
    votes, valid, ms1 = d["votes"], d["valid"], d["ms1"]
    sims, conf, spread = d["sims"], d["conf"], d["spread"]
    Q, K = sims.shape

    def acc(err, score, kp, top_k=args.top_k, thresh=15.0):
        order = np.argsort(-score[:, :kp], axis=1,
                           kind="stable")[:, :top_k]
        chosen = np.take_along_axis(err[:, :kp], order, axis=1)
        return float(np.mean(np.min(chosen, axis=1) <= thresh))

    score = conf + args.lam * sims - args.gamma * spread
    for kind in ("mean", "wmean", "medoid", "pair", "trim", "softmedoid"):
        pos = aggregate(votes, valid, ms1, kind)
        err = world_err(pos, d)
        # spread can be recomputed around the new estimate for the
        # score too — report both fixed-score and re-scored variants.
        d2 = ((votes - pos[:, :, None, :]) ** 2).sum(-1)
        sp2 = np.sqrt((d2 * valid).sum(-1) / np.maximum(valid.sum(-1), 1))
        score2 = conf + args.lam * sims - args.gamma * sp2
        cols = "  ".join(
            f"K'={kp}: {acc(err, score, kp):0.4f}/{acc(err, score2, kp):0.4f}"
            f" (ceil {float(np.mean(np.min(err[:, :kp], 1) <= 15)):0.4f})"
            for kp in args.kprime)
        print(f"{kind:10s} {cols}")


if __name__ == "__main__":
    main()
