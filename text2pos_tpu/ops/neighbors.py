"""Dense neighbor-search ops: ball query and masked kNN.

TPU-native replacements for the reference's CUDA neighbor kernels:
 - torch-cluster ``radius`` (ball query) used by PointNet++ set abstraction
   (/root/reference/models/pointcloud/pointnet2.py:28),
 - the kNN graph inside PyG ``DynamicEdgeConv``
   (/root/reference/models/cell_retrieval.py:46-54).

Both are expressed as batched pairwise-distance computations with fixed
neighbor counts and validity masks — static shapes that XLA tiles onto the
MXU/VPU with no host round-trips, instead of ragged scatter/gather kernels.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared L2 distances [..., M, N] between a[..., M, D] and b[..., N, D].

    Uses the (‖a‖² − 2a·b + ‖b‖²) expansion so the inner product rides the
    MXU; clamps at 0 against cancellation.
    """
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)            # [..., M, 1]
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)            # [..., N, 1]
    ab = jnp.einsum("...md,...nd->...mn", a, b,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    d2 = a2 - 2.0 * ab.astype(a.dtype) + jnp.swapaxes(b2, -1, -2)
    return jnp.maximum(d2, 0.0)


def ball_query(centroids: jnp.ndarray, points: jnp.ndarray, radius: float,
               max_neighbors: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indices of up to ``max_neighbors`` points within ``radius`` of each centroid.

    Matches PyG ``radius(pos, pos[idx], r)`` semantics (first-by-index, not
    nearest-by-distance, up to the neighbor cap; PyG's default cap is 32).

    Args:
        centroids: [B, S, 3]
        points:    [B, N, 3]
        radius:    ball radius (static float)
        max_neighbors: K, static cap.

    Returns:
        idx:   [B, S, K] int32 indices into N (arbitrary where invalid)
        valid: [B, S, K] bool mask of in-radius neighbors
    """
    B, S, _ = centroids.shape
    N = points.shape[1]
    max_neighbors = min(max_neighbors, N)
    d2 = pairwise_sqdist(centroids, points)                 # [B, S, N]
    in_ball = d2 <= radius * radius

    # Prefer valid entries, tie-broken by ascending point index: encode as a
    # score where any valid index beats any invalid one.
    order = jnp.arange(N, dtype=jnp.float32)
    score = jnp.where(in_ball, -order, -jnp.inf)            # [B, S, N]
    _, idx = jax.lax.top_k(score, max_neighbors)            # descending → ascending index
    idx = idx.astype(jnp.int32)
    valid = jnp.take_along_axis(in_ball, idx, axis=-1)
    return idx, valid


def masked_knn(x: jnp.ndarray, mask: jnp.ndarray, k: int,
               include_self: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest neighbors among valid entries of each set.

    Matches PyG ``knn(x, x, k)`` inside DynamicEdgeConv: self-loops are
    included (distance 0) and sets smaller than k return fewer valid
    neighbors.

    Args:
        x:    [B, M, D] features
        mask: [B, M] bool validity of each element
        k:    neighbor count (static)

    Returns:
        idx:   [B, M, k] int32 neighbor indices
        valid: [B, M, k] bool (False where fewer than k valid neighbors, or
               where the query element itself is invalid)
    """
    B, M, _ = x.shape
    k = min(k, M)
    d2 = pairwise_sqdist(x, x)                               # [B, M, M]
    big = jnp.asarray(jnp.inf, d2.dtype)
    pair_ok = mask[:, :, None] & mask[:, None, :]
    if not include_self:
        eye = jnp.eye(M, dtype=bool)
        pair_ok = pair_ok & ~eye
    d2 = jnp.where(pair_ok, d2, big)
    neg, idx = jax.lax.top_k(-d2, k)                         # k smallest distances
    idx = idx.astype(jnp.int32)
    valid = jnp.isfinite(-neg) & mask[:, :, None]
    return idx, valid
