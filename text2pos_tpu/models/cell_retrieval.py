"""Coarse cell-retrieval network: dual text/object-set encoders.

TPU-native rebuild of /root/reference/models/cell_retrieval.py:23-117.
The object tower encodes every object (ObjectEncoder), L2-normalizes,
aggregates per cell with a DynamicEdgeConv-style kNN graph layer (k=8,
max- or mean-aggregation by ``variation``) plus a masked global pool, and
projects with an MLP; the text tower is the bi-LSTM LanguageEncoder. Both
embeddings are L2-normalized so retrieval scores are cosine similarities.

The ragged PyG graph ops become dense masked ops over [B, MaxObj, E]: the
kNN graph is a masked pairwise-distance top-k, edge messages are computed
on a static [B, MaxObj, k, 2E] buffer and BatchNorm statistics count only
valid edges.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from text2pos_tpu.models.blocks import MLP, l2_normalize
from text2pos_tpu.models.language import LanguageEncoder
from text2pos_tpu.models.object_encoder import ObjectEncoder
from text2pos_tpu.ops.neighbors import masked_knn
from text2pos_tpu.ops.pooling import gather_neighbors, masked_max, masked_mean


class EdgeConv(nn.Module):
    """DynamicEdgeConv equivalent: kNN graph + edge MLP + masked aggregation.

    Edge message: MLP([x_i, x_j − x_i]) (PyG EdgeConv); k includes the
    self-loop, matching PyG ``knn(x, x, k)``. Reference
    cell_retrieval.py:46-54 uses get_mlp([2E, E, E]) and aggr max/mean.
    """

    embed_dim: int
    k: int = 8
    aggr: str = "max"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 train: bool = True) -> jnp.ndarray:
        idx, edge_valid = masked_knn(x, mask, self.k)           # [B, O, k]
        x_j = gather_neighbors(x, idx)                           # [B, O, k, E]
        x_i = x[:, :, None, :]
        h = jnp.concatenate(
            [jnp.broadcast_to(x_i, x_j.shape), x_j - x_i], axis=-1
        )
        h = MLP((self.embed_dim, self.embed_dim), dtype=self.dtype,
                name="edge_mlp")(
            h, mask=edge_valid, train=train
        )
        if self.aggr == "max":
            return masked_max(h, edge_valid[..., None], axis=2)
        return masked_mean(h, edge_valid[..., None], axis=2)


class CellRetrievalNetwork(nn.Module):
    vocab_size: int
    embed_dim: int
    num_classes: int
    num_colors: int
    use_features: Tuple[str, ...] = ("class", "color", "position")
    variation: int = 0
    class_embed: bool = False
    color_embed: bool = False
    pointnet_features: int = 2
    k: int = 8
    remat: bool = False  # jax.checkpoint the object encoder (memory ↓)
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay f32)

    def setup(self):
        assert self.variation in (0, 1)
        encoder_cls = (nn.remat(ObjectEncoder, static_argnums=(8,))
                       if self.remat else ObjectEncoder)
        self.object_encoder = encoder_cls(
            embed_dim=self.embed_dim,
            num_classes=self.num_classes,
            num_colors=self.num_colors,
            use_features=self.use_features,
            class_embed=self.class_embed,
            color_embed=self.color_embed,
            pointnet_features=self.pointnet_features,
            dtype=self.dtype,
            name="object_encoder",
        )
        aggr = "max" if self.variation == 0 else "mean"
        self.graph1 = EdgeConv(self.embed_dim, k=self.k, aggr=aggr,
                               dtype=self.dtype, name="graph1")
        self.lin = MLP((self.embed_dim, self.embed_dim), dtype=self.dtype,
                       name="lin")
        self.language_encoder = LanguageEncoder(
            self.vocab_size, self.embed_dim, bi_dir=True, name="language_encoder"
        )

    def encode_text(self, tokens: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        """[B, T] tokens → [B, E] L2-normalized text embeddings."""
        enc = self.language_encoder(tokens, lengths)
        return l2_normalize(enc)

    def encode_objects(
        self,
        points_xyz: jnp.ndarray,   # [F, P, 3] flat packed objects
        points_rgb: jnp.ndarray,   # [F, P, 3]
        centers: jnp.ndarray,      # [F, 3]
        colors: jnp.ndarray,       # [F, 3]
        class_idx: jnp.ndarray,    # [F]
        color_idx: jnp.ndarray,    # [F]
        flat_valid: jnp.ndarray,   # [F] bool
        cell_idx: jnp.ndarray,     # [F] which cell each object belongs to
        slot_idx: jnp.ndarray,     # [F] slot of the object within its cell
        num_cells: int,            # B (static)
        max_objects: int,          # O (static)
        train: bool = True,
    ) -> jnp.ndarray:
        """Flat objects → [B, E] L2-normalized cell embeddings."""
        # Positional call so nn.remat's static_argnums can pin `train`.
        emb = self.object_encoder(
            points_xyz, points_rgb, centers, colors, class_idx, color_idx,
            flat_valid, train,
        )
        emb = l2_normalize(emb)

        # Scatter the flat embeddings into the dense per-cell layout.
        dense = jnp.zeros((num_cells, max_objects, self.embed_dim), emb.dtype)
        safe_cell = jnp.where(flat_valid, cell_idx, 0)
        safe_slot = jnp.where(flat_valid, slot_idx, 0)
        contrib = emb * flat_valid[:, None].astype(emb.dtype)
        dense = dense.at[safe_cell, safe_slot].add(contrib)
        obj_mask = jnp.zeros((num_cells, max_objects), bool).at[
            safe_cell, safe_slot
        ].max(flat_valid)

        x = self.graph1(dense, obj_mask, train=train)            # [B, O, E]
        if self.variation == 0:
            pooled = masked_max(x, obj_mask[..., None], axis=1)
        else:
            pooled = masked_mean(x, obj_mask[..., None], axis=1)
        out = self.lin(pooled, train=train)
        return l2_normalize(out.astype(jnp.float32))

    def __call__(self, tokens, lengths, points_xyz, points_rgb, centers, colors,
                 class_idx, color_idx, flat_valid, cell_idx, slot_idx,
                 num_cells: int, max_objects: int, train: bool = True):
        """Convenience: encode both towers (used for init and training)."""
        text = self.encode_text(tokens, lengths)
        cells = self.encode_objects(
            points_xyz, points_rgb, centers, colors, class_idx, color_idx,
            flat_valid, cell_idx, slot_idx, num_cells, max_objects, train=train,
        )
        return text, cells
