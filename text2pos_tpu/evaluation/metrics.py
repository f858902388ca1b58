"""World-coordinate localization accuracy metrics.

Vectorized rebuild of /root/reference/evaluation/utils.py:31-69:
predictions in retrieved cells are mapped to world coordinates, distances
to the ground-truth pose are computed, cross-scene retrievals are discarded
(distance = ∞), and top-k / threshold accuracies are averaged.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def calc_accuracies(
    pose_w: np.ndarray,        # [Q, 2] ground-truth world positions
    cell_bbox_lo: np.ndarray,  # [Q, K, 2] retrieved cells' bbox minima
    cell_sizes: np.ndarray,    # [Q, K]
    pos_in_cells: np.ndarray,  # [Q, K, 2] predicted in-cell positions ∈ [0,1]
    same_scene: np.ndarray,    # [Q, K] bool — retrieval from the pose's scene
    top_k: Sequence[int],
    threshs: Sequence[float],
) -> Dict[int, Dict[float, float]]:
    """Mean accuracy per (k, threshold) over all queries."""
    pred_w = cell_bbox_lo + pos_in_cells * cell_sizes[..., None]   # [Q, K, 2]
    dists = np.linalg.norm(pose_w[:, None, :] - pred_w, axis=2)    # [Q, K]
    dists = np.where(same_scene, dists, np.inf)

    accs: Dict[int, Dict[float, float]] = {}
    for k in top_k:
        kk = min(k, dists.shape[1])
        best = np.min(dists[:, :kk], axis=1)
        accs[k] = {t: float(np.mean(best <= t)) for t in threshs}
    return accs


def print_accuracies(accs: Dict, name: str = "", log=print) -> str:
    """Render the reference's accuracy table (evaluation/utils.py:57-69)."""
    lines = []
    if name:
        lines.append(f"\t\t{name}:")
    top_k = list(accs.keys())
    threshs = list(accs[top_k[0]].keys())
    lines.append("".join(f"\t\t\t\t{k}" for k in top_k))
    row = "/".join(str(t) for t in threshs) + ":"
    for k in top_k:
        row += "\t" + "/".join(f"{accs[k][t]:0.2f}" for t in threshs)
    lines.append(row)
    out = "\n".join(lines)
    log(out)
    return out
