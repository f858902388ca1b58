"""Masked pooling and gather helpers.

Replace PyG's scatter-based ``global_max_pool`` / ``global_mean_pool``
(/root/reference/models/pointcloud/pointnet2.py:48,
 /root/reference/models/cell_retrieval.py:98-102): once data is dense and
padded, segment pooling degenerates to a masked reduction over the padded
axis — no scatter kernels required.
"""

from __future__ import annotations

import jax.numpy as jnp

_NEG = -1e30


def masked_max(x: jnp.ndarray, mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Max over ``axis`` counting only masked-in entries; 0 where none valid.

    Args:
        x: input array.
        mask: bool, broadcastable to x.
        axis: reduction axis.
    """
    mask = jnp.broadcast_to(mask, x.shape)
    filled = jnp.where(mask, x, jnp.asarray(_NEG, x.dtype))
    out = jnp.max(filled, axis=axis)
    any_valid = jnp.any(mask, axis=axis)
    return jnp.where(any_valid, out, jnp.zeros_like(out))


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Mean over ``axis`` counting only masked-in entries; 0 where none valid."""
    mask = jnp.broadcast_to(mask, x.shape)
    maskf = mask.astype(x.dtype)
    total = jnp.sum(x * maskf, axis=axis)
    count = jnp.sum(maskf, axis=axis)
    return jnp.where(count > 0, total / jnp.maximum(count, 1), jnp.zeros_like(total))


def gather_neighbors(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-element neighborhoods.

    Args:
        x:   [B, N, C] features
        idx: [B, S, K] int indices into N

    Returns:
        [B, S, K, C]
    """
    B, S, K = idx.shape
    flat = idx.reshape(B, S * K)
    gathered = jnp.take_along_axis(x, flat[:, :, None], axis=1)
    return gathered.reshape(B, S, K, x.shape[-1])
