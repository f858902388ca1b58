"""PointNet++ object encoder over dense fixed-size point clouds.

TPU-native rebuild of the reference's PyG PointNet2
(/root/reference/models/pointcloud/pointnet2.py:18-104): three set-
abstraction levels (FPS ratio 0.5, ball radii 0.2/0.3/0.4, PointConv-style
grouped MLP + max) followed by a global abstraction layer, two linear
layers and class/color heads.

The set-abstraction level is written MXU-first. Two TPU-specific
reformulations replace the reference's ragged CUDA kernels — measured
decisive on v5e (distinct pre-uploaded inputs, host-materialized outputs,
[1536 objects × 256 points]): the naive ``lax.top_k`` + ``take_along_axis``
composition runs 224 ms per SA level; this formulation runs 41 ms — 5.5×:

1. **Separable first layer.** PointConv's per-edge MLP input is
   ``concat(x_j, pos_j − pos_s)`` and its first layer is linear, so the
   edge pre-activation splits into a per-*point* projection
   ``a_j = W·[x_j, pos_j] + b`` (one big MXU matmul) minus a per-*centroid*
   projection ``W_pos·pos_s`` — no per-edge feature tensor is ever built
   at the raw channel width.

2. **Rank-select one-hot contraction instead of top-k + gather.** The
   neighbors of centroid s are the first K in-radius points by index
   (PyG ``radius`` semantics). With ``rank = cumsum(in_ball) − 1``, the
   selection tensor ``sel[s,k,n] = in_ball[s,n] & (rank[s,n] == k)`` turns
   the neighbor gather into ``einsum('skn,nc->skc', sel, a)`` — a plain
   MXU contraction whose one-hot operand XLA fuses from the comparison,
   avoiding both ``lax.top_k`` and low-channel-count gathers (TPU gathers
   move whole lanes; C=6 wastes 95% of each transfer).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from text2pos_tpu.models.blocks import MLP, MaskedBatchNorm
from text2pos_tpu.ops.fps import farthest_point_sampling
from text2pos_tpu.ops.neighbors import pairwise_sqdist
from text2pos_tpu.ops.pooling import masked_max


class _PairLinear(nn.Module):
    """The first PointConv layer, split into point/centroid projections.

    Parameter layout matches a plain Dense (kernel [C_in, C_out], bias) so
    converted/pretrained checkpoints load unchanged.
    """

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xpos: jnp.ndarray, cent: jnp.ndarray):
        """Args:
            xpos: [B, N, C_in] concat(point features, positions)
            cent: [B, S, 3] centroid positions

        Returns:
            a     [B, N, features]  = xpos @ W + b
            cproj [B, S, features]  = cent @ W[-3:]  (no bias)
        """
        c_in = xpos.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (c_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or xpos.dtype
        k = kernel.astype(dt)
        a = xpos.astype(dt) @ k + bias.astype(dt)
        cproj = cent.astype(dt) @ k[-3:]
        return a, cproj


class _SeparablePointConvMLP(nn.Module):
    """The two-layer PointConv MLP on implicitly-gathered neighborhoods.

    Parameter tree (dense_0/bn_0/dense_1/bn_1) is identical to the generic
    ``blocks.MLP`` the previous formulation used, so pretrained/converted
    checkpoints keep loading.
    """

    channels: tuple
    dtype: Optional[jnp.dtype] = None
    eval_batch_stats: bool = False

    @nn.compact
    def __call__(self, xpos: jnp.ndarray, cent: jnp.ndarray,
                 sel: jnp.ndarray, mask: jnp.ndarray, train: bool):
        c1, c2 = self.channels
        a, cproj = _PairLinear(c1, dtype=self.dtype, name="dense_0")(xpos, cent)
        # Neighbor "gather" as a one-hot contraction on the MXU.
        aj = jnp.einsum("bskn,bnc->bskc", sel.astype(a.dtype), a)     # [B,S,K,c1]
        pre1 = aj - cproj[:, :, None, :]

        ebs = self.eval_batch_stats
        h = MaskedBatchNorm(name="bn_0", eval_batch_stats=ebs)(
            pre1, mask=mask, train=train)
        h = nn.relu(h)
        h = nn.Dense(c2, dtype=self.dtype, name="dense_1")(h)
        h = MaskedBatchNorm(name="bn_1", eval_batch_stats=ebs)(
            h, mask=mask, train=train)
        return nn.relu(h)


class SetAbstraction(nn.Module):
    """FPS subsample + ball grouping + per-edge MLP + masked max.

    Mirrors SetAbstractionLayer (reference pointnet2.py:18-37) with PyG's
    default neighbor cap of 32 for ``radius`` (first-K-by-index semantics).
    """

    ratio: float
    radius: float
    mlp_channels: tuple
    max_neighbors: int = 32
    dtype: Optional[jnp.dtype] = None
    eval_batch_stats: bool = False

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
        K = min(self.max_neighbors, N)

        idx = farthest_point_sampling(pos, S)                         # [B, S]
        cent = jnp.take_along_axis(pos, idx[..., None], axis=1)       # [B, S, 3]

        # Ball membership + first-K-by-index selection (PyG radius
        # semantics) without lax.top_k: rank in-ball points by index.
        d2 = pairwise_sqdist(cent, pos)                               # [B, S, N]
        in_ball = d2 <= self.radius * self.radius
        rank = jnp.cumsum(in_ball.astype(jnp.int32), axis=-1) - 1     # [B, S, N]
        count = jnp.minimum(rank[..., -1] + 1, K)                     # [B, S]
        nb_valid = jnp.arange(K)[None, None, :] < count[..., None]    # [B, S, K]
        sel = (in_ball[:, :, None, :]
               & (rank[:, :, None, :] == jnp.arange(K)[None, None, :, None]))

        mask = nb_valid
        if valid is not None:
            mask = mask & valid[:, None, None]

        h = _SeparablePointConvMLP(self.mlp_channels, dtype=self.dtype,
                                   eval_batch_stats=self.eval_batch_stats,
                                   name="conv_mlp")(
            jnp.concatenate([x, pos], axis=-1), cent, sel, mask, train)

        out = masked_max(h, mask[..., None], axis=2)                   # [B, S, c2]
        return out, cent


class GlobalAbstraction(nn.Module):
    """Concat(pos) → MLP → global max (reference pointnet2.py:40-49)."""

    mlp_channels: tuple
    dtype: Optional[jnp.dtype] = None
    eval_batch_stats: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos: jnp.ndarray,
                 valid: Optional[jnp.ndarray] = None, train: bool = True):
        h = jnp.concatenate([x, pos], axis=-1)
        mask = None
        if valid is not None:
            mask = jnp.broadcast_to(valid[:, None], h.shape[:2])
        h = MLP(self.mlp_channels, dtype=self.dtype,
                eval_batch_stats=self.eval_batch_stats,
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
    eval_batch_stats: bool = False

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
        ebs = self.eval_batch_stats
        x, pos = SetAbstraction(0.5, 0.2, (32, 64), dtype=dt,
                                eval_batch_stats=ebs,
                                name="sa1")(x, pos, valid, train)
        x, pos = SetAbstraction(0.5, 0.3, (128, 128), dtype=dt,
                                eval_batch_stats=ebs,
                                name="sa2")(x, pos, valid, train)
        x, pos = SetAbstraction(0.5, 0.4, (256, 256), dtype=dt,
                                eval_batch_stats=ebs,
                                name="sa3")(x, pos, valid, train)
        features0 = GlobalAbstraction((512, self.dim0), dtype=dt,
                                      eval_batch_stats=ebs,
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
