"""On-device point-cloud transforms (sampling, rotation, normalization).

TPU-native equivalents of the PyG transforms the reference injects into its
dataloaders (/root/reference/training/coarse.py:189-199):
 - ``T.FixedPoints(n)``       → fixed_points (uniform with replacement)
 - ``T.RandomRotate(120, 2)`` → random_rotate_z (uniform ±120° around z)
 - ``T.NormalizeScale()``     → normalize_scale (center, scale to [-1, 1])

All operate on dense batched buffers so augmentation runs inside the jitted
train step instead of the host loader.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def fixed_points(xyz: jnp.ndarray, rgb: jnp.ndarray, counts: jnp.ndarray,
                 num: int, rng: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample ``num`` points per object uniformly with replacement.

    Args:
        xyz:    [..., P, 3] stored points (only the first count are real)
        rgb:    [..., P, 3]
        counts: [...] int valid point counts (≥ 1)
        num:    output point count
        rng:    PRNG key

    Returns:
        (xyz, rgb) with shape [..., num, 3].
    """
    lead = xyz.shape[:-2]
    u = jax.random.uniform(rng, lead + (num,))
    idx = jnp.floor(u * counts[..., None]).astype(jnp.int32)
    idx = jnp.clip(idx, 0, xyz.shape[-2] - 1)
    take = lambda a: jnp.take_along_axis(a, idx[..., None], axis=-2)
    return take(xyz), take(rgb)


def prepare_object_points(xyz: jnp.ndarray, rgb: jnp.ndarray,
                          counts: jnp.ndarray, num_points: int, rng: jax.Array,
                          augment: bool, no_pc_augment: bool = False
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full on-device point pipeline matching the reference transforms.

    train:  FixedPoints → RandomRotate(±120°, z) → NormalizeScale
    eval:   FixedPoints → NormalizeScale
    no_pc_augment: FixedPoints only
    (reference training/coarse.py:189-199).
    """
    k_sample, k_rot = jax.random.split(rng)
    sx, sr = fixed_points(xyz, rgb, counts, num_points, k_sample)
    if no_pc_augment:
        return sx, sr
    if augment:
        sx = random_rotate_z(sx, k_rot)
    return normalize_scale(sx), sr


def random_rotate_z(xyz: jnp.ndarray, rng: jax.Array,
                    max_degrees: float = 120.0) -> jnp.ndarray:
    """Rotate each object independently around the z axis by U(−max, max)°.

    Args:
        xyz: [..., P, 3]; the rotation is sampled per leading element.
    """
    lead = xyz.shape[:-2]
    deg = jax.random.uniform(rng, lead, minval=-max_degrees, maxval=max_degrees)
    theta = deg * (jnp.pi / 180.0)
    c, s = jnp.cos(theta)[..., None], jnp.sin(theta)[..., None]
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    xr = c * x - s * y
    yr = s * x + c * y
    return jnp.stack([xr, yr, z], axis=-1)


def normalize_scale(xyz: jnp.ndarray) -> jnp.ndarray:
    """Center each object at its mean and scale into [-1, 1].

    PyG NormalizeScale: pos −= mean; pos *= 1 / max|pos| · (1 − eps) with
    eps ≈ 0 (we use the exact 0.999999 factor PyG applies).
    """
    centered = xyz - jnp.mean(xyz, axis=-2, keepdims=True)
    max_abs = jnp.max(jnp.abs(centered), axis=(-2, -1), keepdims=True)
    scale = (1.0 / jnp.maximum(max_abs, 1e-12)) * 0.999999
    return centered * scale
