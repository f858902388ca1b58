"""SuperGlue-style attentional matching over object/hint descriptor sets.

TPU-native rebuild of the matching middle-end the reference adapts from
SuperGlue (/root/reference/models/superglue.py:90-330): alternating
self/cross multi-head attention blocks with residual MLPs, a final linear
projection, a scaled dot-product score matrix, log-domain Sinkhorn optimal
transport with a learned dustbin, and mutual-max match extraction.

Descriptors live in [B, N, D] layout (vs the reference's [B, D, N] Conv1d
layout) — the natural layout for MXU einsums. The keypoint encoder of the
original SuperGlue is unused by the reference (superglue.py:271-273) and is
omitted.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from text2pos_tpu.models.blocks import (DenseParams, FastSuperGlueMLP,
                                        SuperGlueMLP)
from text2pos_tpu.ops.sinkhorn import extract_matches, log_optimal_transport


class MultiHeadedAttention(nn.Module):
    """4-head attention (reference superglue.py:97-115).

    The score/value contractions are written as broadcast-multiply-reduce
    rather than einsum matmuls: at this model's shapes (seq ≤ 16, head_dim
    32) the einsum form lowers to tens of thousands of tiny batched MXU
    matmuls that leave the systolic array almost idle, while the broadcast
    form fuses into VPU reduce-fusions. Measured on a v5e at serving scale
    (20480 pose-cell pairs, 12 blocks): 46 ms vs 196 ms for the full GNN —
    a 4.3× win. Same math, same f32 accumulation, different op order.

    ``fast_graph`` (serving-only, checkpoint-compatible): apply q/k/v as
    ONE matmul over the concatenated kernels — one HBM read of the
    activations instead of three (self-attention; two → one for the k/v
    pair in cross-attention). The fine stage is bandwidth-bound at ~78%
    of HBM peak (docs/FINE_MFU.md), so serving time follows bytes.
    """

    num_heads: int
    d_model: int
    dtype: Optional[jnp.dtype] = None
    fast_graph: bool = False

    @nn.compact
    def __call__(self, query: jnp.ndarray, key: jnp.ndarray,
                 value: jnp.ndarray) -> jnp.ndarray:
        assert self.d_model % self.num_heads == 0
        dim = self.d_model // self.num_heads

        if self.fast_graph:
            E, din = self.d_model, query.shape[-1]
            kq, bq = DenseParams(E, din, name="proj_q")()
            kk, bk = DenseParams(E, din, name="proj_k")()
            kv, bv = DenseParams(E, din, name="proj_v")()
            dt = self.dtype or jnp.promote_types(query.dtype, kq.dtype)

            def mm(x, w, b):
                return x.astype(dt) @ w.astype(dt) + b.astype(dt)

            def split_heads(h):
                B, N, _ = h.shape
                return h.reshape(B, N, self.num_heads, dim)

            if query is key:  # self-attention: one read of x for q, k, v
                qkv = mm(query, jnp.concatenate([kq, kk, kv], axis=1),
                         jnp.concatenate([bq, bk, bv]))
                q, k, v = (split_heads(qkv[..., i * E:(i + 1) * E])
                           for i in range(3))
            else:  # cross-attention: one read of the source for k + v
                kv_ = mm(key, jnp.concatenate([kk, kv], axis=1),
                         jnp.concatenate([bk, bv]))
                k = split_heads(kv_[..., :E])
                v = split_heads(kv_[..., E:])
                q = split_heads(mm(query, kq, bq))
        else:
            def proj(x, name):
                h = nn.Dense(self.d_model, dtype=self.dtype, name=name)(x)
                B, N, _ = h.shape
                return h.reshape(B, N, self.num_heads, dim)

            q = proj(query, "proj_q")
            k = proj(key, "proj_k")
            v = proj(value, "proj_v")

        # Attention logits/softmax in float32 regardless of compute dtype.
        # scores[b, n, m, h] — fused broadcast-reduce over head_dim (VPU).
        scores = jnp.sum(q[:, :, None] * k[:, None], axis=-1,
                         dtype=jnp.float32) / (dim ** 0.5)
        prob = jax.nn.softmax(scores, axis=2).astype(v.dtype)
        # out[b, n, h, d] = Σ_m prob[b, n, m, h] · v[b, m, h, d]
        out = jnp.sum(prob[..., None] * v[:, None], axis=2)
        out = out.reshape(query.shape[0], query.shape[1], self.d_model)
        return nn.Dense(self.d_model, dtype=self.dtype, name="merge")(out)


class AttentionalPropagation(nn.Module):
    """x ← x + MLP([x, attn(x, source)]) (reference superglue.py:118-127)."""

    feature_dim: int
    num_heads: int = 4
    dtype: Optional[jnp.dtype] = None
    eval_batch_stats: bool = False
    bn_stat_groups: int = 1  # ≥2: per-set BN stats (see blocks.MaskedBatchNorm)
    fast_graph: bool = False  # serving: fused q/k/v + concat-free MLP

    @nn.compact
    def __call__(self, x: jnp.ndarray, source: jnp.ndarray,
                 train: bool = True, stat_group: int = 0) -> jnp.ndarray:
        message = MultiHeadedAttention(self.num_heads, self.feature_dim,
                                       dtype=self.dtype,
                                       fast_graph=self.fast_graph,
                                       name="attn")(x, source, source)
        if self.fast_graph:
            return FastSuperGlueMLP(self.feature_dim, dtype=self.dtype,
                                    eval_batch_stats=self.eval_batch_stats,
                                    stat_groups=self.bn_stat_groups,
                                    name="mlp")(x, message.astype(x.dtype),
                                                train=train,
                                                stat_group=stat_group)
        h = jnp.concatenate([x, message.astype(x.dtype)], axis=-1)
        return SuperGlueMLP((self.feature_dim * 2, self.feature_dim),
                            dtype=self.dtype,
                            eval_batch_stats=self.eval_batch_stats,
                            stat_groups=self.bn_stat_groups,
                            name="mlp")(h, train=train, stat_group=stat_group)


class AttentionalGNN(nn.Module):
    """Alternating self/cross attention blocks (reference superglue.py:130-146).

    Each block is applied to both descriptor sets with *shared* weights,
    exactly like the reference (one ``layer`` call per set).
    """

    feature_dim: int
    layer_names: Tuple[str, ...]
    dtype: Optional[jnp.dtype] = None
    eval_batch_stats: bool = False
    bn_stat_groups: int = 1
    fast_graph: bool = False

    @nn.compact
    def __call__(self, desc0: jnp.ndarray, desc1: jnp.ndarray,
                 train: bool = True):
        for i, name in enumerate(self.layer_names):
            layer = AttentionalPropagation(self.feature_dim, dtype=self.dtype,
                                           eval_batch_stats=self.eval_batch_stats,
                                           bn_stat_groups=self.bn_stat_groups,
                                           fast_graph=self.fast_graph,
                                           name=f"layer_{i}")
            if name == "cross":
                src0, src1 = desc1, desc0
            else:
                src0, src1 = desc0, desc1
            # The weight-shared block normalizes each descriptor set by its
            # own BN statistics (reference superglue.py:141-144 calls the
            # layer once per set): stat_group keeps those statistics
            # separate when the BN carries per-set rows.
            delta0 = layer(desc0, src0, train=train, stat_group=0)
            delta1 = layer(desc1, src1, train=train,
                           stat_group=min(1, self.bn_stat_groups - 1))
            desc0 = desc0 + delta0.astype(desc0.dtype)
            desc1 = desc1 + delta1.astype(desc1.dtype)
        return desc0, desc1


class SuperGlue(nn.Module):
    """GNN + final projection + Sinkhorn + match extraction
    (reference superglue.py:239-330)."""

    descriptor_dim: int
    num_layers: int = 6            # self/cross pairs; total blocks = 2·num_layers
    sinkhorn_iterations: int = 50
    match_threshold: float = 0.2
    dtype: Optional[jnp.dtype] = None
    eval_batch_stats: bool = False
    bn_stat_groups: int = 1
    fast_graph: bool = False

    @nn.compact
    def __call__(self, desc0: jnp.ndarray, desc1: jnp.ndarray,
                 train: bool = True) -> Dict[str, jnp.ndarray]:
        """Args:
            desc0: [B, M, D] object descriptors
            desc1: [B, N, D] hint descriptors

        Returns dict with P [B, M+1, N+1] (transport probabilities incl.
        dustbins), matches0/1, matching_scores0/1.
        """
        if self.num_layers > 0:
            names = tuple(["self", "cross"] * self.num_layers)
            desc0, desc1 = AttentionalGNN(self.descriptor_dim, names,
                                          dtype=self.dtype,
                                          eval_batch_stats=self.eval_batch_stats,
                                          bn_stat_groups=self.bn_stat_groups,
                                          fast_graph=self.fast_graph,
                                          name="gnn")(desc0, desc1, train=train)

        final = nn.Dense(self.descriptor_dim, dtype=self.dtype,
                         name="final_proj")
        mdesc0, mdesc1 = final(desc0), final(desc1)

        # Score matrix and optimal transport in float32 (Sinkhorn numerics).
        scores = jnp.einsum("bmd,bnd->bmn", mdesc0, mdesc1,
                            preferred_element_type=jnp.float32)
        scores = scores / (self.descriptor_dim ** 0.5)

        bin_score = self.param("bin_score",
                               lambda key: jnp.asarray(1.0, jnp.float32))
        # The fused Pallas kernel has no reverse-mode rule; training (which
        # differentiates through the transport) uses the XLA loop, while
        # eval/serving auto-selects the faster Pallas path on TPU.
        Z = log_optimal_transport(scores, bin_score, self.sinkhorn_iterations,
                                  impl="xla" if train else "auto")

        out = extract_matches(Z, self.match_threshold)
        out["P"] = jnp.exp(Z)
        out["log_P"] = Z
        return out
