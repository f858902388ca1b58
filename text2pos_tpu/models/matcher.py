"""Fine hints-to-objects matcher with offset regression.

TPU-native rebuild of SuperGlueMatch
(/root/reference/models/superglue_matcher.py:51-135) plus the vectorized
in-cell position estimate ``get_pos_in_cell``
(superglue_matcher.py:138-161) and its least-squares intersection variant
(superglue_matcher.py:164-185).

Shapes are fully static: every cell is padded/cut to ``pad_size`` objects
(padding objects are *real* inputs — tiny random point blobs labelled
"pad" — exactly as in the reference) and every pose has ``num_mentioned``
hints, so the whole fine stage jits and batches across query×top-k cells.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from text2pos_tpu.models.blocks import HeadMLP, l2_normalize
from text2pos_tpu.models.language import LanguageEncoder
from text2pos_tpu.models.object_encoder import ObjectEncoder
from text2pos_tpu.models.superglue import SuperGlue


class SuperGlueMatch(nn.Module):
    vocab_size: int
    embed_dim: int
    num_layers: int = 6
    sinkhorn_iters: int = 50
    num_classes: int = 23
    num_colors: int = 9
    use_features: Tuple[str, ...] = ("class", "color", "position")
    class_embed: bool = False
    color_embed: bool = False
    pointnet_features: int = 2
    match_threshold: float = 0.2
    remat: bool = False  # jax.checkpoint the object encoder (memory ↓)
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay f32)
    # The reference NEVER puts its fine model in eval() mode — not during
    # training eval (training/fine.py:121, eval() commented out) and not in
    # the end-to-end pipeline (evaluation/pipeline.py applies eval() only
    # to the retrieval model at :50) — so its BatchNorms always normalize
    # with current-batch statistics. Reproducing that is also numerically
    # necessary: eval-mode running stats collapse matching recall through
    # the 12-block residual GNN (0.79 → 0.20 measured on held-out scenes).
    eval_batch_stats: bool = True
    # ≥2: the SuperGlue GNN's weight-shared BNs keep one statistics row per
    # descriptor set, which lets calibrated eval-mode serving reproduce
    # batch-stats normalization (pipeline.calibrated_for_serving). Training
    # keeps 1 (the flat [F] layout of every checkpoint).
    bn_stat_groups: int = 1
    # Serving-only HBM-traffic reduction (checkpoint-compatible, same
    # math up to f32 reassociation): fused q/k/v projections + concat-free
    # block MLPs (models/superglue.py fast_graph). The fine stage is
    # bandwidth-bound (docs/FINE_MFU.md), so bytes ≈ time.
    fast_graph: bool = False

    def setup(self):
        self.language_encoder = LanguageEncoder(
            self.vocab_size, self.embed_dim, bi_dir=True)
        # With remat, the PointNet activations are recomputed in the
        # backward pass instead of stored — the standard HBM-for-FLOPs
        # trade for large pad_size × batch products.
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
            eval_batch_stats=self.eval_batch_stats,
        )
        self.superglue = SuperGlue(
            bn_stat_groups=self.bn_stat_groups,
            descriptor_dim=self.embed_dim,
            num_layers=self.num_layers,
            sinkhorn_iterations=self.sinkhorn_iters,
            match_threshold=self.match_threshold,
            dtype=self.dtype,
            eval_batch_stats=self.eval_batch_stats,
            fast_graph=self.fast_graph,
        )
        self.mlp_offsets = HeadMLP((self.embed_dim // 2, 2))

    # -- staged API (used by the serving pipeline to cache the
    #    query-independent object encodings per DB cell) -----------------
    def encode_hints(self, hint_tokens: jnp.ndarray,
                     hint_lengths: jnp.ndarray) -> jnp.ndarray:
        """[B, H, T] tokens → [B, H, E] L2-normalized hint encodings."""
        B, H, T = hint_tokens.shape
        enc = self.language_encoder(hint_tokens.reshape(B * H, T),
                                    hint_lengths.reshape(B * H))
        return l2_normalize(enc.reshape(B, H, self.embed_dim))

    def encode_cell_objects(self, points_xyz, points_rgb, centers, colors,
                            class_idx, color_idx, train: bool = True
                            ) -> jnp.ndarray:
        """[B, O, ...] padded cell objects → [B, O, E] normalized encodings.

        Every slot is a real object (padding objects included), so no
        validity mask is needed.
        """
        B, O, P, _ = points_xyz.shape
        # Positional call so nn.remat's static_argnums can pin `train`.
        enc = self.object_encoder(
            points_xyz.reshape(B * O, P, 3), points_rgb.reshape(B * O, P, 3),
            centers.reshape(B * O, 3), colors.reshape(B * O, 3),
            class_idx.reshape(B * O), color_idx.reshape(B * O),
            None, train,
        )
        return l2_normalize(enc.reshape(B, O, self.embed_dim))

    def match_encoded(self, obj_enc: jnp.ndarray, hint_enc: jnp.ndarray,
                      train: bool = True) -> Dict[str, jnp.ndarray]:
        """Run attention GNN + Sinkhorn + offset head on encodings."""
        matcher_out = self.superglue(obj_enc, hint_enc, train=train)
        offsets = self.mlp_offsets(hint_enc)
        return {
            "P": matcher_out["P"],
            "log_P": matcher_out["log_P"],
            "matches0": matcher_out["matches0"],
            "matches1": matcher_out["matches1"],
            "matching_scores0": matcher_out["matching_scores0"],
            "matching_scores1": matcher_out["matching_scores1"],
            "offsets": offsets,          # [B, H, 2]
        }

    def forward_rank(self, hint_tokens, hint_lengths, points_xyz,
                     points_rgb, centers, colors, class_idx, color_idx,
                     num_negs: int, train: bool = True
                     ) -> Dict[str, jnp.ndarray]:
        """Standard forward PLUS the transport matrices of each query's
        hints matched against ``num_negs`` OTHER cells of the batch
        (cyclic shifts of the object encodings — every negative is a real
        cell from a different pose). Drives the rank-aware fine loss
        (train.losses.listwise_rank_loss): serving re-ranks candidate
        cells by match confidence, so the confidence must be trained to
        order cells, which the reference's per-pair matching NLL
        (/root/reference/training/fine.py:56-63) never does.

        Returns match_encoded's dict plus ``neg_P`` [R, B, M+1, N+1].
        The object/hint encoders run ONCE; negatives reuse the encodings,
        so the extra cost is R matcher passes. Negatives run before the
        diagonal pass so the BN running statistics end on the real pairs.
        """
        hint_enc = self.encode_hints(hint_tokens, hint_lengths)
        obj_enc = self.encode_cell_objects(
            points_xyz, points_rgb, centers, colors, class_idx, color_idx,
            train=train)
        neg_P = []
        for r in range(1, num_negs + 1):
            nout = self.superglue(jnp.roll(obj_enc, r, axis=0), hint_enc,
                                  train=train)
            neg_P.append(nout["P"])
        out = self.match_encoded(obj_enc, hint_enc, train=train)
        out["neg_P"] = (jnp.stack(neg_P) if neg_P
                        else jnp.zeros((0,) + out["P"].shape,
                                       out["P"].dtype))
        return out

    def __call__(
        self,
        hint_tokens: jnp.ndarray,    # [B, H, T] token ids per hint
        hint_lengths: jnp.ndarray,   # [B, H]
        points_xyz: jnp.ndarray,     # [B, O, P, 3] padded cell objects
        points_rgb: jnp.ndarray,     # [B, O, P, 3]
        centers: jnp.ndarray,        # [B, O, 3]
        colors: jnp.ndarray,         # [B, O, 3]
        class_idx: jnp.ndarray,      # [B, O]
        color_idx: jnp.ndarray,      # [B, O]
        train: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        hint_enc = self.encode_hints(hint_tokens, hint_lengths)
        obj_enc = self.encode_cell_objects(
            points_xyz, points_rgb, centers, colors, class_idx, color_idx,
            train=train)
        return self.match_encoded(obj_enc, hint_enc, train=train)


def get_pos_in_cell(centers: jnp.ndarray, matches0: jnp.ndarray,
                    offsets: jnp.ndarray) -> jnp.ndarray:
    """Vectorized in-cell position estimate (superglue_matcher.py:138-161).

    For every matched object, predict center + offset of the matched hint;
    average the predictions, falling back to the cell middle (0.5, 0.5)
    when nothing matched.

    Args:
        centers:  [..., O, 2] object centers (cell-normalized x, y)
        matches0: [..., O] hint index per object, −1 = unmatched
        offsets:  [..., H, 2] per-hint offset predictions

    Returns:
        [..., 2] position estimates.
    """
    valid = matches0 >= 0
    safe = jnp.where(valid, matches0, 0)
    off = jnp.take_along_axis(offsets, safe[..., None], axis=-2)   # [..., O, 2]
    preds = centers + off
    vf = valid[..., None].astype(preds.dtype)
    total = jnp.sum(preds * vf, axis=-2)
    count = jnp.sum(vf, axis=-2)
    mean = total / jnp.maximum(count, 1.0)
    fallback = jnp.full_like(mean, 0.5)
    return jnp.where(count > 0, mean, fallback)


def get_pos_in_cell_intersect(centers: jnp.ndarray, matches0: jnp.ndarray,
                              directions: jnp.ndarray) -> jnp.ndarray:
    """Least-squares intersection of matched direction rays
    (superglue_matcher.py:164-185), vectorized with masked normal equations.

    Falls back to (0.5, 0.5) when fewer than two objects matched.
    """
    dirs = directions / jnp.maximum(
        jnp.linalg.norm(directions, axis=-1, keepdims=True), 1e-12
    )
    valid = matches0 >= 0
    safe = jnp.where(valid, matches0, 0)
    n = jnp.take_along_axis(dirs, safe[..., None], axis=-2)        # [..., O, 2]
    eye = jnp.eye(2, dtype=centers.dtype)
    projs = eye - n[..., :, None] * n[..., None, :]                 # [..., O, 2, 2]
    vf = valid[..., None, None].astype(centers.dtype)
    R = jnp.sum(projs * vf, axis=-3)                                # [..., 2, 2]
    q = jnp.sum(
        jnp.einsum("...oij,...oj->...oi", projs, centers) * vf[..., 0], axis=-2
    )
    # Regularize so the solve is defined even for degenerate systems.
    R = R + 1e-6 * eye
    p = jnp.linalg.solve(R, q[..., None])[..., 0]
    count = jnp.sum(valid, axis=-1, keepdims=True)
    fallback = jnp.full_like(p, 0.5)
    return jnp.where(count >= 2, p, fallback)
