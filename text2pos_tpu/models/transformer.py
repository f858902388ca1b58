"""Transformer-based matcher alternates (negative-result baselines).

Rebuild of the reference's kept-for-completeness alternates
(/root/reference/models/transformer.py:18 ``TransformerMatch1`` and
/root/reference/models/tf_matcher.py:28 ``TransformerMatch`` — both marked
"did not show promising results, only kept for the sake of completion",
tf_matcher.py:1-3). In the reference these are unrunnable (they import an
absent ``semantic3d`` package, SURVEY.md §5); here they are functional
against the same fine-stage batches so the ablation can actually be run.

Design: standard pre-LN transformer blocks with self-attention over the
concatenated [objects ‖ hints] token sequence, followed by a Sinkhorn
optimal-transport matching head (the tf_matcher variant) and per-hint
offset regression. The aux class/color heads of TransformerMatch1 are
exposed behind ``with_aux_heads``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from text2pos_tpu.models.blocks import HeadMLP, l2_normalize
from text2pos_tpu.models.language import LanguageEncoder
from text2pos_tpu.models.object_encoder import ObjectEncoder
from text2pos_tpu.ops.sinkhorn import extract_matches, log_optimal_transport


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int = 4
    mlp_ratio: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(num_heads=self.num_heads,
                                            qkv_features=self.dim)(h, h)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.dim * self.mlp_ratio)(h)
        h = nn.relu(h)
        h = nn.Dense(self.dim)(h)
        return x + h


class TransformerMatch(nn.Module):
    """Joint-sequence transformer + Sinkhorn matching."""

    vocab_size: int
    embed_dim: int
    num_layers: int = 4
    sinkhorn_iters: int = 50
    num_classes: int = 23
    num_colors: int = 9
    use_features: Tuple[str, ...] = ("class", "color", "position")
    pointnet_features: int = 2
    match_threshold: float = 0.2
    with_aux_heads: bool = False  # TransformerMatch1-style class/color heads

    @nn.compact
    def __call__(self, hint_tokens, hint_lengths, points_xyz, points_rgb,
                 centers, colors, class_idx, color_idx,
                 train: bool = True) -> Dict[str, jnp.ndarray]:
        B, H, T = hint_tokens.shape
        O, P = points_xyz.shape[1], points_xyz.shape[2]

        lang = LanguageEncoder(self.vocab_size, self.embed_dim,
                               name="language_encoder")
        hint_enc = lang(hint_tokens.reshape(B * H, T),
                        hint_lengths.reshape(B * H))
        hint_enc = l2_normalize(hint_enc.reshape(B, H, self.embed_dim))

        obj_encoder = ObjectEncoder(
            embed_dim=self.embed_dim, num_classes=self.num_classes,
            num_colors=self.num_colors, use_features=self.use_features,
            pointnet_features=self.pointnet_features, name="object_encoder")
        obj_enc = obj_encoder(
            points_xyz.reshape(B * O, P, 3), points_rgb.reshape(B * O, P, 3),
            centers.reshape(B * O, 3), colors.reshape(B * O, 3),
            class_idx.reshape(B * O), color_idx.reshape(B * O),
            valid=None, train=train)
        obj_enc = l2_normalize(obj_enc.reshape(B, O, self.embed_dim))

        # Segment embeddings distinguish object vs hint tokens.
        seg = self.param("segment_embed", nn.initializers.normal(0.02),
                         (2, self.embed_dim))
        x = jnp.concatenate([obj_enc + seg[0], hint_enc + seg[1]], axis=1)
        for i in range(self.num_layers):
            x = TransformerBlock(self.embed_dim, name=f"block_{i}")(x)
        obj_out, hint_out = x[:, :O], x[:, O:]

        scores = jnp.einsum("bod,bhd->boh", obj_out, hint_out)
        scores = scores / (self.embed_dim ** 0.5)
        bin_score = self.param("bin_score",
                               lambda key: jnp.asarray(1.0, jnp.float32))
        Z = log_optimal_transport(scores, bin_score, self.sinkhorn_iters)
        out = extract_matches(Z, self.match_threshold)
        out["P"] = jnp.exp(Z)
        out["log_P"] = Z
        out["offsets"] = HeadMLP((self.embed_dim // 2, 2),
                                 name="mlp_offsets")(hint_out)
        if self.with_aux_heads:
            out["class_pred"] = nn.Dense(self.num_classes,
                                         name="aux_class")(obj_out)
            out["color_pred"] = nn.Dense(self.num_colors,
                                         name="aux_color")(obj_out)
        return out
