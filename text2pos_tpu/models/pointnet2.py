"""PointNet++ object encoder over dense fixed-size point clouds.

TPU-native rebuild of the reference's PyG PointNet2
(/root/reference/models/pointcloud/pointnet2.py:18-104): three set-
abstraction levels (FPS ratio 0.5, ball radii 0.2/0.3/0.4, PointConv-style
grouped MLP + max) followed by a global abstraction layer, two linear
layers and class/color heads.

The ragged fps/radius/scatter CUDA kernels become dense batched ops
(ops.fps / ops.neighbors / ops.pooling) over a fixed [B, P, 3] buffer —
every object holds exactly ``P`` resampled points, so only the ball-query
neighbor masks are ragged, and those are static-shape boolean masks.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from text2pos_tpu.models.blocks import MLP
from text2pos_tpu.ops.fps import farthest_point_sampling
from text2pos_tpu.ops.neighbors import ball_query
from text2pos_tpu.ops.pooling import gather_neighbors, masked_max


class SetAbstraction(nn.Module):
    """FPS subsample + ball-query grouping + per-edge MLP + masked max.

    Mirrors SetAbstractionLayer (reference pointnet2.py:18-37) with PyG's
    default neighbor cap of 32 for ``radius``.
    """

    ratio: float
    radius: float
    mlp_channels: tuple
    max_neighbors: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos: jnp.ndarray,
                 valid: Optional[jnp.ndarray] = None, train: bool = True):
        """Args:
            x:     [B, N, C] point features
            pos:   [B, N, 3] positions
            valid: [B] optional object-validity mask (invalid objects produce
                   garbage that must not pollute BatchNorm statistics)

        Returns:
            (x' [B, S, C'], pos' [B, S, 3]) with S = N·ratio.
        """
        B, N, _ = pos.shape
        S = max(1, int(N * self.ratio))

        idx = farthest_point_sampling(pos, S)                       # [B, S]
        centroids = jnp.take_along_axis(pos, idx[..., None], axis=1)  # [B, S, 3]

        nb_idx, nb_valid = ball_query(centroids, pos, self.radius,
                                      self.max_neighbors)           # [B, S, K]
        x_j = gather_neighbors(x, nb_idx)                            # [B, S, K, C]
        pos_j = gather_neighbors(pos, nb_idx)
        rel = pos_j - centroids[:, :, None, :]
        h = jnp.concatenate([x_j, rel], axis=-1)

        mask = nb_valid
        if valid is not None:
            mask = mask & valid[:, None, None]
        h = MLP(self.mlp_channels, dtype=self.dtype,
                name="conv_mlp")(h, mask=mask, train=train)
        out = masked_max(h, mask[..., None], axis=2)                 # [B, S, C']
        return out, centroids


class GlobalAbstraction(nn.Module):
    """Concat(pos) → MLP → global max (reference pointnet2.py:40-49)."""

    mlp_channels: tuple
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos: jnp.ndarray,
                 valid: Optional[jnp.ndarray] = None, train: bool = True):
        h = jnp.concatenate([x, pos], axis=-1)
        mask = None
        if valid is not None:
            mask = jnp.broadcast_to(valid[:, None], h.shape[:2])
        h = MLP(self.mlp_channels, dtype=self.dtype,
                name="mlp")(h, mask=mask, train=train)
        return jnp.max(h, axis=1)                                    # [B, C]


class PointNet2(nn.Module):
    """Full PointNet++ classifier / feature extractor.

    Feature tiers (dim0=1024, dim1=512, dim2=256) match the reference; the
    object encoder consumes ``features2`` by default
    (reference object_encoder.py:57-58, args.pointnet_features=2).
    """

    num_classes: int
    num_colors: int
    dtype: Optional[jnp.dtype] = None

    dim0: int = 1024
    dim1: int = 512
    dim2: int = 256

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, rgb: jnp.ndarray,
                 valid: Optional[jnp.ndarray] = None,
                 train: bool = True) -> Dict[str, jnp.ndarray]:
        """Args:
            xyz:   [B, P, 3] (normalize-scale applied upstream)
            rgb:   [B, P, 3] point colors (the initial features)
            valid: [B] optional validity per object (for BN statistics)
        """
        x, pos = rgb, xyz
        dt = self.dtype
        x, pos = SetAbstraction(0.5, 0.2, (32, 64), dtype=dt,
                                name="sa1")(x, pos, valid, train)
        x, pos = SetAbstraction(0.5, 0.3, (128, 128), dtype=dt,
                                name="sa2")(x, pos, valid, train)
        x, pos = SetAbstraction(0.5, 0.4, (256, 256), dtype=dt,
                                name="sa3")(x, pos, valid, train)
        features0 = GlobalAbstraction((512, self.dim0), dtype=dt,
                                      name="ga")(x, pos, valid, train)

        features1 = nn.relu(nn.Dense(self.dim1, dtype=dt, name="lin1")(features0))
        features2 = nn.relu(nn.Dense(self.dim2, dtype=dt, name="lin2")(features1))
        features2 = features2.astype(jnp.float32)
        class_pred = nn.Dense(self.num_classes, name="class_classifier")(features2)
        color_pred = nn.Dense(self.num_colors, name="color_classifier")(features2)

        return {
            "features0": features0,
            "features1": features1,
            "features2": features2,
            "class_pred": class_pred,
            "color_pred": color_pred,
        }
