"""Object encoder: fuse PointNet++ features with color/position encodings.

TPU-native rebuild of /root/reference/models/object_encoder.py:16-149.
Instead of lists of Python objects + per-cell PyG batches, it consumes a
*flat packed object buffer*: all valid objects of a batch concatenated into
fixed-capacity arrays with a validity mask (host packing in data.dense).
This keeps PointNet++ compute proportional to real objects while every
shape stays static.

Feature selection mirrors the reference's ``--use_features`` semantics:
 - "class"    → PointNet features (or a class-id embedding if class_embed)
 - "color"    → mean-RGB MLP (or a color-id embedding if color_embed)
 - "position" → object-center MLP
Each feature is L2-normalized before fusion by ``mlp_merge``
(object_encoder.py:100-140). When "color" is not among the features the
point colors fed into PointNet are zeroed (object_encoder.py:88-90).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from text2pos_tpu.models.blocks import MLP, l2_normalize
from text2pos_tpu.models.pointnet2 import PointNet2


class ObjectEncoder(nn.Module):
    embed_dim: int
    num_classes: int          # known classes + 1 for <unk> at index 0
    num_colors: int
    use_features: Tuple[str, ...] = ("class", "color", "position")
    class_embed: bool = False
    color_embed: bool = False
    pointnet_features: int = 2  # 0/1/2 → features0/1/2
    dtype: Optional[jnp.dtype] = None
    eval_batch_stats: bool = False  # see blocks.MaskedBatchNorm

    @nn.compact
    def __call__(self, points_xyz: jnp.ndarray, points_rgb: jnp.ndarray,
                 centers: jnp.ndarray, colors: jnp.ndarray,
                 class_idx: jnp.ndarray, color_idx: jnp.ndarray,
                 valid: Optional[jnp.ndarray] = None,
                 train: bool = True) -> jnp.ndarray:
        """Encode a flat buffer of objects.

        Args:
            points_xyz: [F, P, 3] per-object point clouds (already sampled,
                augmented and normalize-scaled)
            points_rgb: [F, P, 3]
            centers:    [F, 3] object centers in cell coordinates
            colors:     [F, 3] mean RGB per object
            class_idx:  [F] class indices (0 = <unk>)
            color_idx:  [F] color-name indices
            valid:      [F] bool — padding tail of the flat buffer

        Returns:
            [F, embed_dim] object embeddings (un-normalized, as in the
            reference — callers norm).
        """
        features = []

        use_pointnet = not self.class_embed
        if use_pointnet:
            rgb_in = points_rgb
            if "color" not in self.use_features:
                rgb_in = jnp.zeros_like(points_rgb)
            pn_out = PointNet2(self.num_classes, self.num_colors,
                               dtype=self.dtype,
                               eval_batch_stats=self.eval_batch_stats,
                               name="pointnet")(
                points_xyz, rgb_in, valid=valid, train=train
            )
            pn_feats = pn_out[f"features{self.pointnet_features}"]
            pn_feats = MLP((self.embed_dim,), dtype=self.dtype,
                           eval_batch_stats=self.eval_batch_stats,
                           name="mlp_pointnet")(
                pn_feats, mask=valid, train=train
            )

        if "class" in self.use_features:
            if self.class_embed:
                emb = nn.Embed(self.num_classes, self.embed_dim,
                               name="class_embedding")(class_idx)
                emb = emb * (class_idx != 0)[..., None].astype(emb.dtype)
                features.append(l2_normalize(emb))
            else:
                features.append(l2_normalize(pn_feats))

        if "color" in self.use_features:
            if self.color_embed:
                emb = nn.Embed(self.num_colors, self.embed_dim,
                               name="color_embedding")(color_idx)
                features.append(l2_normalize(emb))
            else:
                emb = MLP((64, self.embed_dim), dtype=self.dtype,
                          eval_batch_stats=self.eval_batch_stats,
                          name="color_encoder")(
                    colors, mask=valid, train=train
                )
                features.append(l2_normalize(emb))

        if "position" in self.use_features:
            emb = MLP((64, self.embed_dim), dtype=self.dtype,
                      eval_batch_stats=self.eval_batch_stats,
                      name="pos_encoder")(
                centers, mask=valid, train=train
            )
            features.append(l2_normalize(emb))

        if len(features) > 1:
            fused = jnp.concatenate(features, axis=-1)
            out = MLP((self.embed_dim,), dtype=self.dtype,
                      eval_batch_stats=self.eval_batch_stats,
                      name="mlp_merge")(
                fused, mask=valid, train=train
            )
        else:
            out = features[0]
        return out.astype(jnp.float32)
