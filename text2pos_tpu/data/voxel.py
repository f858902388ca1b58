"""Voxel-grid downsampling keeping the first point per voxel.

Replaces Open3D's ``voxel_down_sample_and_trace`` as used by the reference
(/root/reference/datapreparation/kitti360pose/prepare.py:70-84): the
reference keeps, per voxel, the *first* point index from the trace. This is
a pure-NumPy hash implementation (a C++ path can be slotted behind the same
function); data prep is offline, so host-side is the right placement.
"""

from __future__ import annotations

import numpy as np


def voxel_downsample_indices(points: np.ndarray, voxel_size: float,
                             force_numpy: bool = False) -> np.ndarray:
    """Indices of the first point in each occupied voxel, in first-occurrence
    order (matching "keep index [0] of each voxel's trace")."""
    assert voxel_size > 0
    if not force_numpy:
        from text2pos_tpu.data import native

        got = native.voxel_downsample_indices(points, voxel_size)
        if got is not None:
            return got
    coords = np.floor(points / voxel_size).astype(np.int64)
    coords -= coords.min(axis=0)
    # Collision-free linear key.
    dims = coords.max(axis=0) + 1
    key = (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2] + coords[:, 2]
    _, first_idx = np.unique(key, return_index=True)
    return np.sort(first_idx)
