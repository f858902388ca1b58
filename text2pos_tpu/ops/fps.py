"""Farthest-point sampling (FPS) as a jittable batched op.

TPU-native replacement for torch-cluster's CUDA ``fps`` used by the
reference PointNet++ (/root/reference/models/pointcloud/pointnet2.py:26).
Instead of a per-graph scatter kernel over ragged batches, we operate on a
dense ``[B, N, 3]`` buffer: each iteration is an argmax over a running
min-distance field, which XLA maps onto the VPU; all shapes are static.

FPS is inherently sequential in the number of *samples* (S = N·ratio), but
for the point-cloud sizes in this workload (N = 256, S = 128) a
``lax.fori_loop`` of vectorized distance updates is already bandwidth-bound
and fast; the batch dimension provides the parallelism.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def farthest_point_sampling(points: jnp.ndarray, num_samples: int,
                            start_idx: int = 0) -> jnp.ndarray:
    """Select ``num_samples`` indices per batch element by FPS.

    Args:
        points: [B, N, 3] point coordinates.
        num_samples: number of points to select (static).
        start_idx: index of the seed point (the reference uses a random
            start; we default to 0 for determinism — tests rely on it).

    Returns:
        [B, num_samples] int32 indices into N.
    """
    B, N, _ = points.shape
    assert 1 <= num_samples <= N

    def body(i, state):
        min_dist, selected, last_idx = state
        # Distance from every point to the most recently selected point.
        last_pt = jnp.take_along_axis(points, last_idx[:, None, None], axis=1)  # [B,1,3]
        d = jnp.sum((points - last_pt) ** 2, axis=-1)  # [B, N]
        min_dist = jnp.minimum(min_dist, d)
        nxt = jnp.argmax(min_dist, axis=-1).astype(jnp.int32)  # [B]
        selected = selected.at[:, i].set(nxt)
        return min_dist, selected, nxt

    selected = jnp.zeros((B, num_samples), dtype=jnp.int32)
    seed = jnp.full((B,), start_idx, dtype=jnp.int32)
    selected = selected.at[:, 0].set(seed)
    min_dist = jnp.full((B, N), jnp.inf, dtype=points.dtype)

    if num_samples == 1:
        return selected

    _, selected, _ = jax.lax.fori_loop(1, num_samples, body, (min_dist, selected, seed))
    return selected
