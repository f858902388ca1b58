"""End-to-end localization pipeline: text query → world position.

TPU-native rebuild of /root/reference/evaluation/pipeline.py:38-343. The
reference loops on the host per query and per retrieved cell, shuttling
PyG batches to the GPU and matches back (pipeline.py:190-202). Here the
whole thing is three jitted programs with zero per-query host work:

 1. encode: all query texts [Q, E] and all DB cells [C, E]
 2. retrieve: one [Q, E]×[E, C] matmul + lax.top_k
 3. fine: gather the top-k cells' dense tensors *on device* from the cell
    bank, run the SuperGlue matcher over [chunk·K] pose-cell pairs, and
    reduce matches+offsets to in-cell positions

Oracle modes (--coarse_oracle/--coarse_random/--fine_oracle/--fine_random,
reference evaluation/args.py:44-50) are kept as cheap integration bounds.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from text2pos_tpu.config import EvalConfig, TrainConfig
from text2pos_tpu.constants import CLASS_TO_INDEX
from text2pos_tpu.data.dense import CellBank
from text2pos_tpu.data.hints import Vocabulary, create_hint_description
from text2pos_tpu.evaluation.metrics import calc_accuracies
from text2pos_tpu.models.matcher import get_pos_in_cell
from text2pos_tpu.ops.retrieval import topk_retrieval
from text2pos_tpu.ops.transforms import prepare_object_points
from text2pos_tpu.train.coarse import CoarseTrainer
from text2pos_tpu.train.fine import FineTrainer
from text2pos_tpu.train.state import TrainState

PAD_CLASS_IDX = CLASS_TO_INDEX["pad"] + 1  # dense class_index("pad")
PAD_COLOR_IDX = 5                          # zeros-RGB → "black"


def _match_confidence_scores(matches0: jnp.ndarray,
                             mscores0: jnp.ndarray) -> jnp.ndarray:
    """Float per-(query, cell) match confidence: the summed Sinkhorn
    transport scores of matched objects, [B, K] float32.

    Finer-grained than the integer matched-object count (confidences):
    a cell whose objects match the hints with high transport mass scores
    above one with the same number of marginal matches. Drives the
    fine-confidence re-ranking path (``serve_batch(rerank_k=...)``,
    ``EvalConfig.rerank``) — a TPU-native addition with no reference
    equivalent (the reference only counts matches, pipeline.py:196)."""
    scores = jnp.where(matches0 >= 0, mscores0.astype(jnp.float32), 0.0)
    return jnp.sum(scores, axis=2)


def _match_vote_spread(matches1: jnp.ndarray, offsets: jnp.ndarray,
                       centers_xy: jnp.ndarray) -> jnp.ndarray:
    """RMS distance of the matched hints' position votes (matched object
    center + that hint's predicted offset) to their mean, [B, K] float32
    (0 when <=1 hint matches). A cell whose matched hints AGREE on a
    position is far likelier correct than one with equal match mass but
    scattered votes — the strongest re-ranking signal found by the
    offline scoring lab (scripts/rerank_score_lab.py: conf + 4·sim −
    6·spread lifts bench top-10@15m 0.716 → 0.779 at rerank_k=128,
    top-1 0.385 → 0.520). TPU-native addition; no reference equivalent.

    Args:
        matches1: [B, K, H] per-hint matched object index (−1 unmatched)
        offsets:  [B, K, H, 2] per-hint predicted offsets
        centers_xy: [B, K, pad, 2] candidate cells' object centers
    """
    valid = matches1 >= 0
    ctr = jnp.take_along_axis(centers_xy,
                              jnp.maximum(matches1, 0)[..., None], axis=2)
    votes = (ctr + offsets).astype(jnp.float32)           # [B, K, H, 2]
    n = jnp.maximum(valid.sum(-1), 1)                     # [B, K]
    mean_v = (votes * valid[..., None]).sum(2) / n[..., None]
    d2 = ((votes - mean_v[:, :, None, :]) ** 2).sum(-1)
    return jnp.sqrt((d2 * valid).sum(-1) / n)


def _rerank_order(conf_scores: np.ndarray, spreads: np.ndarray,
                  gamma: float) -> np.ndarray:
    """Re-ranked candidate order per query, [Q, K] int indices into the
    coarse top-k list. Score is ``conf − gamma·spread`` (the offline
    evaluator's analogue of serving's ``conf + λ·sim − γ·spread``; the
    evaluator re-ranks within the already-retrieved top-k so the coarse
    similarity term is a constant tie-break, supplied by the stable sort
    over the coarse order)."""
    score = np.asarray(conf_scores, np.float32)
    if gamma:
        score = score - gamma * np.asarray(spreads, np.float32)
    return np.argsort(-score, axis=1, kind="stable")


def quantize_fine_bank(obj_enc_bank) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Int8-quantize the fine object-encoding bank with per-object scales.

    The bank is the largest serving-resident tensor and the widest rerank
    gather's traffic source; object encodings are L2-normalized rows, so a
    symmetric per-object absmax/127 scale bounds the per-coordinate error
    at ~scale/2 ≈ 4e-3. Returns (q [C, pad, E] int8, scale [C, pad, 1]
    f32); dequantize as ``q * scale``. Feeds ``serve_batch``'s cheap
    cascade pass (``cheap_bank``/``cheap_scale``). TPU-native addition —
    the reference re-encodes every retrieved cell per query instead
    (/root/reference/evaluation/pipeline.py:190-202)."""
    b = jnp.asarray(obj_enc_bank, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(b), axis=-1, keepdims=True),
                        1e-12) / 127.0
    q = jnp.clip(jnp.round(b / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


class LocalizationPipeline:
    """Bundles the coarse retriever + fine matcher for eval + serving."""

    def __init__(self, coarse: CoarseTrainer, coarse_state: TrainState,
                 fine: FineTrainer, fine_state: TrainState, cfg: EvalConfig,
                 mesh=None):
        self.coarse = coarse
        self.coarse_state = coarse_state
        self.fine = fine
        self.fine_state = fine_state
        self.cfg = cfg
        # Optional 1-D 'dp' mesh: DB-cell encoding is sharded over it
        # (built by main() from --data_parallel; SURVEY.md §2.3).
        self.mesh = mesh

    def _encode_db_cells(self, bank) -> np.ndarray:
        if self.mesh is not None:
            from text2pos_tpu.parallel.dp import dp_encode_all_cells

            return dp_encode_all_cells(self.coarse, self.coarse_state, bank,
                                       self.mesh,
                                       jax.random.PRNGKey(self.cfg.seed))
        return self.coarse.encode_all_cells(
            self.coarse_state, bank, jax.random.PRNGKey(self.cfg.seed))

    # ------------------------------------------------------------------
    # Coarse stage
    # ------------------------------------------------------------------
    def run_coarse(self, loader, poses) -> Tuple[np.ndarray, Dict]:
        """Retrieve max(top_k) cells per pose; coarse accuracy predicts cell
        centers (reference pipeline.py:38-137)."""
        cfg = self.cfg
        bank = loader.bank
        # With re-ranking the fine stage sees cfg.rerank candidates and
        # reorders them; retrieve that many here (coarse accuracies below
        # still only look at the first max(top_k) columns).
        max_k = min(max(max(cfg.top_k), getattr(cfg, "rerank", 0)),
                    bank.num_cells)

        if cfg.coarse_oracle:
            target = loader.pose_cell_idx
            top_idx = np.tile(target[:, None], (1, max_k))
        elif cfg.coarse_random:
            rng = np.random.default_rng(cfg.seed)
            top_idx = rng.integers(0, bank.num_cells, size=(len(poses), max_k))
        elif cfg.street_oracle:
            top_idx = self._street_oracle_retrieval(loader, poses, max_k)
        else:
            text_enc = self.coarse.encode_all_queries(self.coarse_state, loader)
            cell_enc = self._encode_db_cells(bank)
            _, top_idx = topk_retrieval(
                jnp.asarray(text_enc), jnp.asarray(cell_enc), max_k)
            top_idx = np.asarray(top_idx)

        accs = self._accuracies(poses, bank, top_idx,
                                pos_in_cells=np.full(top_idx.shape + (2,), 0.5))
        return top_idx, accs

    def _street_oracle_retrieval(self, loader, poses, max_k: int,
                                 street_centers=None) -> np.ndarray:
        """Street-based semi-oracle: run the real retrieval model but mask
        out cells whose nearest street center differs from the pose's
        (reference pipeline.py:68-108).

        Unlike the reference (which hardcodes scene 0010's street centers,
        pipeline.py:77-80), the street centers are loaded per scene — keyed
        by each pose's scene — so multi-scene eval sets work. Pass
        ``street_centers`` either as a single array (applied to all scenes)
        or as a dict {scene_short_name: array}; by default they are loaded
        from {base_path}/street_centers/2013_05_28_drive_<scene>_sync.pkl.
        """
        cfg = self.cfg
        bank = loader.bank
        pose_scenes = np.array([p.scene_name for p in poses])
        cell_scenes = np.array([cid.split("_")[0] for cid in bank.cell_ids])
        scenes = sorted(set(pose_scenes) | set(cell_scenes))

        if street_centers is None:
            import os.path as osp
            import pickle

            street_centers = {}
            for scene in scenes:
                path = osp.join(cfg.base_path, "street_centers",
                                f"2013_05_28_drive_{scene}_sync.pkl")
                with open(path, "rb") as f:
                    street_centers[scene] = np.asarray(pickle.load(f))
        elif not isinstance(street_centers, dict):
            street_centers = {scene: np.asarray(street_centers)
                              for scene in scenes}

        text_enc = self.coarse.encode_all_queries(self.coarse_state, loader)
        cell_enc = self._encode_db_cells(bank)

        cell_centers = 0.5 * (bank.bbox_w[:, 0:3] + bank.bbox_w[:, 3:6])
        pose_w = np.array([p.pose_w for p in poses])
        from scipy.spatial.distance import cdist

        # Per-scene nearest-street assignment; streets of different scenes
        # never compare (a cross-scene retrieval is wrong regardless).
        cell_street = np.full(bank.num_cells, -1, np.int64)
        pose_street = np.full(len(poses), -2, np.int64)
        for si, scene in enumerate(scenes):
            centers = street_centers[scene]
            cm = cell_scenes == scene
            if np.any(cm):
                cell_street[cm] = (
                    np.argmin(cdist(cell_centers[cm], centers), axis=1)
                    + si * 10_000)
            pm = pose_scenes == scene
            if np.any(pm):
                pose_street[pm] = (
                    np.argmin(cdist(pose_w[pm], centers), axis=1)
                    + si * 10_000)

        scores = text_enc @ cell_enc.T                       # [Q, C]
        scores = np.where(cell_street[None, :] == pose_street[:, None],
                          scores, -np.inf)
        return np.argsort(-scores, axis=1)[:, :max_k]

    def _accuracies(self, poses, bank: CellBank, top_idx: np.ndarray,
                    pos_in_cells: np.ndarray,
                    top_k: Optional[Tuple[int, ...]] = None) -> Dict:
        pose_w = np.array([p.pose_w[0:2] for p in poses])
        pose_scenes = np.array([p.cell_id.split("_")[0] for p in poses])
        cell_scenes = np.array([cid.split("_")[0] for cid in bank.cell_ids])
        same_scene = cell_scenes[top_idx] == pose_scenes[:, None]
        return calc_accuracies(
            pose_w,
            bank.bbox_w[top_idx][..., 0:2],
            bank.cell_size[top_idx],
            pos_in_cells,
            same_scene,
            top_k or self.cfg.top_k,
            self.cfg.threshs,
        )

    # ------------------------------------------------------------------
    # Fine stage
    # ------------------------------------------------------------------
    def _pad_filled_cell_tensors(self, bank_dev: Dict, flat_idx: jnp.ndarray,
                                 rng: jax.Array):
        """Gather cells by index, cut to pad_size and fill invalid slots with
        padding objects: 8 near-zero random points, black, class "pad"
        (reference imports.py:75-83, eval.py:152-158)."""
        pad = self.fine.cfg.pad_size
        n = flat_idx.shape[0]

        def take(name):
            return bank_dev[name][flat_idx][:, :pad]

        xyz, rgb = take("points_xyz"), take("points_rgb")
        count, centers = take("point_count"), take("centers")
        colors = take("colors")
        class_idx, color_idx = take("class_idx"), take("color_idx")
        mask = take("mask")

        pad_pts = jax.random.uniform(rng, (n, pad, 8, 3)) * 0.001
        pad_xyz = jnp.zeros_like(xyz).at[:, :, :8, :].set(pad_pts)
        m4 = mask[:, :, None, None]
        xyz = jnp.where(m4, xyz, pad_xyz)
        rgb = jnp.where(m4, rgb, 0.0)
        count = jnp.where(mask, count, 8)
        centers = jnp.where(mask[..., None], centers,
                            jnp.mean(pad_xyz[:, :, :8], axis=2))
        colors = jnp.where(mask[..., None], colors, 0.0)
        class_idx = jnp.where(mask, class_idx, PAD_CLASS_IDX)
        color_idx = jnp.where(mask, color_idx, PAD_COLOR_IDX)
        return xyz, rgb, count, centers, colors, class_idx, color_idx

    @functools.partial(jax.jit, static_argnums=(0,))
    def _encode_cells_chunk(self, fine_state: TrainState, bank_dev: Dict,
                            idx: jnp.ndarray, rng: jax.Array):
        """Query-independent fine object encodings for a chunk of cells.

        Returns (obj_enc [Bc, pad, E], centers_xy [Bc, pad, 2]). This is the
        PointNet++-heavy part of the fine stage; at serving time it runs
        once per DB cell instead of once per query × top-k (the reference
        re-encodes every retrieved cell per query, pipeline.py:190-202).
        """
        cfg = self.fine.cfg
        xyz, rgb, count, centers, colors, class_idx, color_idx = (
            self._pad_filled_cell_tensors(bank_dev, idx, rng))
        xyz, rgb = prepare_object_points(
            xyz, rgb, count, cfg.pointnet_numpoints,
            jax.random.fold_in(rng, 1), augment=False,
            no_pc_augment=cfg.no_pc_augment,
        )
        obj_enc = self.fine.model.apply(
            {"params": fine_state.params, "batch_stats": fine_state.batch_stats},
            xyz, rgb, centers, colors, class_idx, color_idx, train=False,
            method=type(self.fine.model).encode_cell_objects,
        )
        return obj_enc, centers[..., 0:2]

    def precompute_fine_bank(self, bank: CellBank, bank_dev: Dict,
                             chunk: int = 64):
        """Encode every DB cell's objects once → ([C, pad, E], [C, pad, 2])."""
        C = bank.num_cells
        rng = jax.random.PRNGKey(self.cfg.seed)
        enc_parts, ctr_parts = [], []
        for i in range(0, C, chunk):
            idx = np.arange(i, min(i + chunk, C))
            real = len(idx)
            if real < chunk:
                idx = np.concatenate([idx, np.zeros(chunk - real, np.int64)])
            enc, ctr = self._encode_cells_chunk(
                self.fine_state, bank_dev, jnp.asarray(idx),
                jax.random.fold_in(rng, i))
            enc_parts.append(np.asarray(enc)[:real])
            ctr_parts.append(np.asarray(ctr)[:real])
        return (jnp.asarray(np.concatenate(enc_parts)),
                jnp.asarray(np.concatenate(ctr_parts)))

    def calibrated_for_serving(self, bank: CellBank, bank_dev: Dict,
                               hint_tokens: np.ndarray,
                               hint_lengths: np.ndarray,
                               top_idx: np.ndarray,
                               max_cells: int = 128):
        """Freeze the fine stage's BatchNorms on population statistics and
        return (serving_pipeline, fine_bank) that run in TRUE eval mode.

        The reference's fine model always normalizes with current-batch BN
        statistics (see models/matcher.py) — which couples every query's
        result to whatever else happens to be in its serving batch, and
        forces cross-pair reductions into the serving program. This method
        removes both at no accuracy cost:

         1. one eval forward over ≤``max_cells`` DB cells with mutable
            batch_stats overwrites the object-encoder BN stats with that
            population's statistics (MaskedBatchNorm calibration path);
            the sample must fit one device forward (the PointNet++ SA
            neighbor tensors scale linearly in cells — 128 cells ≈ 2×
            the standard 64-cell encode chunk);
         2. the fine bank is re-encoded in true eval mode with those stats;
         3. one eval forward of the matcher over the given calibration
            queries × retrievals (e.g. a representative query batch)
            captures the SuperGlue GNN BN statistics the same way.

        The returned pipeline's fine model has eval_batch_stats=False: the
        serving program is purely per-pair (fusable end to end) and each
        query's positions are independent of co-batched queries.

        The GNN's weight-shared BNs normalize the object set and the hint
        set by DIFFERENT statistics in batch-stats mode (one layer call per
        set, reference superglue.py:141-144), so the serving model carries
        one frozen statistics row per set (bn_stat_groups=2) — a single
        row provably cannot reproduce both (measured recall collapse).
        """
        import copy

        import flax

        model = self.fine.model
        rng = jax.random.PRNGKey(self.cfg.seed)

        def widen_gnn_stats(batch_stats):
            """[F] → [2, F] rows for the GNN's per-set BN statistics."""
            bs = flax.core.unfreeze(batch_stats)
            for layer in bs["superglue"]["gnn"].values():
                bn = layer["mlp"]["bn_0"]
                for key in ("mean", "var"):
                    v = jnp.asarray(bn[key])
                    if v.ndim == 1:
                        bn[key] = jnp.tile(v[None], (2, 1))
            return bs

        # 1. Object-encoder population stats over a cell sample.
        sample = np.arange(min(bank.num_cells, max_cells))
        xyz, rgb, count, centers, colors, class_idx, color_idx = (
            self._pad_filled_cell_tensors(bank_dev, jnp.asarray(sample), rng))
        xyz, rgb = prepare_object_points(
            xyz, rgb, count, self.fine.cfg.pointnet_numpoints,
            jax.random.fold_in(rng, 1), augment=False,
            no_pc_augment=self.fine.cfg.no_pc_augment)
        _, upd = model.apply(
            {"params": self.fine_state.params,
             "batch_stats": self.fine_state.batch_stats},
            xyz, rgb, centers, colors, class_idx, color_idx, train=False,
            mutable=["batch_stats"],
            method=type(model).encode_cell_objects)
        state1 = self.fine_state.replace(
            batch_stats=widen_gnn_stats(upd["batch_stats"]))

        # 2. Eval-mode pipeline with calibrated object-encoder stats; its
        # fine bank is chunk-independent by construction. fast_graph
        # (fused q/k/v + concat-free block MLPs, same parameters, same
        # math up to f32 reassociation — docs/FINE_MFU.md) is OFF by
        # default: measured on the TPU it *raises* the serve program's
        # HBM traffic 63.8 → 82.2 GB and slows fine match 73 → 93 ms
        # (XLA fuses the plain per-block Dense chain better than the
        # pre-fused forms). T2P_FAST_GRAPH=1 re-enables for experiments.
        fine_eval = copy.copy(self.fine)
        fine_eval.model = model.clone(
            eval_batch_stats=False, bn_stat_groups=2,
            fast_graph=os.environ.get("T2P_FAST_GRAPH", "0") == "1")
        serving = LocalizationPipeline(self.coarse, self.coarse_state,
                                       fine_eval, state1, self.cfg,
                                       mesh=self.mesh)
        fine_bank = serving.precompute_fine_bank(bank, bank_dev)

        # 3. SuperGlue GNN per-set population stats over the calibration
        # queries (batch-stats model so the calibration branch fires; the
        # object encoder is not executed by encode_hints/match_encoded).
        capture = model.clone(bn_stat_groups=2)
        variables = {"params": state1.params,
                     "batch_stats": state1.batch_stats}
        hint_enc = capture.apply(variables, jnp.asarray(hint_tokens),
                                 jnp.asarray(hint_lengths),
                                 method=type(capture).encode_hints)
        K = top_idx.shape[1]
        flat = jnp.asarray(top_idx).reshape(-1)
        _, upd = capture.apply(variables, fine_bank[0][flat],
                               jnp.repeat(hint_enc, K, axis=0), train=False,
                               mutable=["batch_stats"],
                               method=type(capture).match_encoded)
        serving.fine_state = state1.replace(batch_stats=upd["batch_stats"])

        serving._maybe_fold_gnn()
        return serving, fine_bank

    def with_calibrated_stats(self, batch_stats) -> "LocalizationPipeline":
        """Rebuild the eval-mode serving pipeline from *previously computed*
        calibration statistics (the ``batch_stats`` of a pipeline returned
        by :meth:`calibrated_for_serving`).

        The DB is static at serving time, so the expensive offline
        precompute (fine bank + BN calibration — the largest XLA programs
        in the whole system) can be run once, persisted next to the model
        checkpoints, and restored here without touching the device. Used
        by ``bench.py``'s DB cache so a cold-cache process skips straight
        to the serving program.
        """
        import copy

        fine_eval = copy.copy(self.fine)
        fine_eval.model = self.fine.model.clone(
            eval_batch_stats=False, bn_stat_groups=2,
            fast_graph=os.environ.get("T2P_FAST_GRAPH", "0") == "1")
        serving = LocalizationPipeline(
            self.coarse, self.coarse_state, fine_eval,
            self.fine_state.replace(batch_stats=batch_stats), self.cfg,
            mesh=self.mesh)
        serving._maybe_fold_gnn()
        return serving

    def _maybe_fold_gnn(self) -> None:
        """Fold the calibrated GNN into the fused Pallas serving kernel's
        parameter layout (per-set BN affines baked in). OPT-IN: the
        kernel is output-equivalent and runs, but measured 84 ms vs the
        XLA graph's 61 ms at serving scale (N=20480) — XLA's fused
        broadcast-reduce attention beats the kernel's cross-pair-masked
        MXU formulation at these tiny per-pair shapes (T≤16, D=32).
        Kept for parity experiments and larger-model regimes."""
        if (os.environ.get("T2P_FUSED_GNN")
                and jax.default_backend() == "tpu"
                and self.fine.cfg.embed_dim % 4 == 0):
            from text2pos_tpu.ops.superglue_gnn_pallas import fold_gnn_params

            self._gnn_folded = {
                k: jnp.asarray(v) for k, v in fold_gnn_params(
                    jax.device_get(self.fine_state.params),
                    jax.device_get(self.fine_state.batch_stats),
                    self.fine.cfg.num_layers).items()}

    # Set by calibrated_for_serving on TPU: folded GNN parameters for the
    # fused Pallas serving kernel (None → XLA graph path).
    _gnn_folded = None

    @functools.partial(jax.jit, static_argnums=(0,))
    def _match_chunk_fused(self, fine_state: TrainState,
                           obj_enc_bank: jnp.ndarray,
                           centers_xy_bank: jnp.ndarray,
                           top_idx: jnp.ndarray, hint_tokens: jnp.ndarray,
                           hint_lengths: jnp.ndarray):
        """Calibrated-serving fine stage with the fused Pallas GNN kernel
        (ops/superglue_gnn_pallas): one program for all 12 attention blocks
        + final projection + score matrix, then Sinkhorn and the offsets
        head. Output-equivalent to _match_chunk_cached on a calibrated
        pipeline (same math, folded BN affines)."""
        from text2pos_tpu.ops.sinkhorn import (extract_matches,
                                               log_optimal_transport)
        from text2pos_tpu.ops.superglue_gnn_pallas import gnn_scores_pallas

        B, K = top_idx.shape
        model = self.fine.model
        variables = {"params": fine_state.params,
                     "batch_stats": fine_state.batch_stats}
        hint_enc = model.apply(variables, hint_tokens, hint_lengths,
                               method=type(model).encode_hints)  # [B, H, E]
        H = hint_enc.shape[1]

        flat_idx = top_idx.reshape(B * K)
        obj_enc = obj_enc_bank[flat_idx]                  # [B·K, pad, E]
        centers_xy = centers_xy_bank[flat_idx]
        hint_rep = jnp.repeat(hint_enc, K, axis=0)        # [B·K, H, E]

        dt = model.dtype or jnp.float32
        # Sweep at serving scale (scripts/sweep_gnn_kernel.py, N=20480,
        # E=128, 12 blocks): G=4 120 ms, G=8 80 ms, G=16 86 ms, G=32
        # 83 ms, G=64 138 ms — all above XLA's 61 ms, hence opt-in.
        pairs = int(os.environ.get("T2P_FUSED_GNN_PAIRS", "8"))
        compact = os.environ.get("T2P_FUSED_GNN_COMPACT", "1") == "1"
        scores = gnn_scores_pallas(obj_enc, hint_rep, self._gnn_folded,
                                   self.fine.cfg.num_layers, dtype=dt,
                                   pairs_per_program=pairs,
                                   compact_softmax=compact)
        bin_score = fine_state.params["superglue"]["bin_score"]
        Z = log_optimal_transport(scores, bin_score,
                                  self.fine.cfg.sinkhorn_iters, impl="auto")
        out = extract_matches(Z, model.match_threshold)

        po = fine_state.params["mlp_offsets"]
        h = jnp.maximum(hint_enc @ po["dense_0"]["kernel"]
                        + po["dense_0"]["bias"], 0.0)
        offsets = h @ po["dense_1"]["kernel"] + po["dense_1"]["bias"]

        pad = obj_enc.shape[1]
        matches0 = out["matches0"].reshape(B, K, pad)
        mscores0 = out["matching_scores0"].reshape(B, K, pad)
        offsets = jnp.broadcast_to(offsets[:, None], (B, K, H, 2))
        centers_xy = centers_xy.reshape(B, K, pad, 2)
        pos_mean = get_pos_in_cell(centers_xy, matches0,
                                   jnp.zeros_like(offsets))
        pos_offsets = get_pos_in_cell(centers_xy, matches0, offsets)
        confidences = jnp.sum(matches0 >= 0, axis=2)
        conf_scores = _match_confidence_scores(matches0, mscores0)
        spreads = _match_vote_spread(out["matches1"].reshape(B, K, H),
                                     offsets, centers_xy)
        return (matches0, pos_mean, pos_offsets, confidences, conf_scores,
                spreads)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _match_chunk_cached(self, fine_state: TrainState,
                            obj_enc_bank: jnp.ndarray,
                            centers_xy_bank: jnp.ndarray,
                            top_idx: jnp.ndarray, hint_tokens: jnp.ndarray,
                            hint_lengths: jnp.ndarray):
        """Fine matching against pre-encoded cells: encode each query's hints
        once, then attention+Sinkhorn per (query, cell)."""
        B, K = top_idx.shape
        variables = {"params": fine_state.params,
                     "batch_stats": fine_state.batch_stats}
        model = self.fine.model

        flat_idx = top_idx.reshape(B * K)
        obj_enc = obj_enc_bank[flat_idx].reshape(
            B, K, *obj_enc_bank.shape[1:])                # [B, K, pad, E]
        centers_xy = centers_xy_bank[flat_idx].reshape(
            B, K, *centers_xy_bank.shape[1:])             # [B, K, pad, 2]
        return self._match_gathered(fine_state, obj_enc, centers_xy,
                                    hint_tokens, hint_lengths)

    def _match_gathered(self, fine_state: TrainState, obj_enc: jnp.ndarray,
                        centers_xy: jnp.ndarray, hint_tokens: jnp.ndarray,
                        hint_lengths: jnp.ndarray):
        """Fine matching when the candidates' encodings are ALREADY
        gathered: obj_enc [B, K, pad, E], centers_xy [B, K, pad, 2].
        Core shared by the bank-indexed path above and the DB-sharded
        serving mode (parallel/dp.dp_serve_batch with shard_db), whose
        ring gather materializes per-candidate encodings directly."""
        model = self.fine.model
        hint_enc = model.apply(
            {"params": fine_state.params,
             "batch_stats": fine_state.batch_stats},
            hint_tokens, hint_lengths, method=type(model).encode_hints)
        return self._match_from_enc(fine_state, obj_enc, centers_xy,
                                    hint_enc)

    def _match_from_enc(self, fine_state: TrainState, obj_enc: jnp.ndarray,
                        centers_xy: jnp.ndarray, hint_enc: jnp.ndarray,
                        model=None):
        """Matcher core on pre-encoded hints: obj_enc [B, K, pad, E],
        hint_enc [B, H, E]. ``model`` overrides the matcher — the cascaded
        re-ranking pruner passes a truncated clone (fewer GNN blocks /
        Sinkhorn iterations, same trained weights) here."""
        model = model if model is not None else self.fine.model
        B, K = obj_enc.shape[:2]
        variables = {"params": fine_state.params,
                     "batch_stats": fine_state.batch_stats}
        H = hint_enc.shape[1]
        hint_rep = jnp.repeat(hint_enc, K, axis=0)        # [B·K, H, E]

        pad = obj_enc.shape[2]
        out = model.apply(variables, obj_enc.reshape(B * K, pad, -1),
                          hint_rep, train=False,
                          method=type(model).match_encoded)

        matches0 = out["matches0"].reshape(B, K, pad)
        mscores0 = out["matching_scores0"].reshape(B, K, pad)
        offsets = out["offsets"].reshape(B, K, H, 2)
        pos_mean = get_pos_in_cell(centers_xy, matches0,
                                   jnp.zeros_like(offsets))
        pos_offsets = get_pos_in_cell(centers_xy, matches0, offsets)
        confidences = jnp.sum(matches0 >= 0, axis=2)
        conf_scores = _match_confidence_scores(matches0, mscores0)
        spreads = _match_vote_spread(out["matches1"].reshape(B, K, H),
                                     offsets, centers_xy)
        return (matches0, pos_mean, pos_offsets, confidences, conf_scores,
                spreads)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _fine_chunk(self, fine_state: TrainState, bank_dev: Dict,
                    top_idx: jnp.ndarray, hint_tokens: jnp.ndarray,
                    hint_lengths: jnp.ndarray, rng: jax.Array):
        """Uncached path: re-encode every retrieved cell per query (the
        reference's execution pattern, for parity checks)."""
        cfg = self.fine.cfg
        B, K = top_idx.shape
        pad = cfg.pad_size

        xyz, rgb, count, centers, colors, class_idx, color_idx = (
            self._pad_filled_cell_tensors(bank_dev, top_idx.reshape(B * K), rng))
        xyz, rgb = prepare_object_points(
            xyz, rgb, count, cfg.pointnet_numpoints,
            jax.random.fold_in(rng, 1), augment=False,
            no_pc_augment=cfg.no_pc_augment,
        )

        H, T = hint_tokens.shape[1], hint_tokens.shape[2]
        tok = jnp.repeat(hint_tokens, K, axis=0)        # [B·K, H, T]
        lng = jnp.repeat(hint_lengths, K, axis=0)

        out = self.fine.model.apply(
            {"params": fine_state.params, "batch_stats": fine_state.batch_stats},
            tok, lng, xyz, rgb, centers, colors, class_idx, color_idx,
            train=False,
        )

        matches0 = out["matches0"].reshape(B, K, pad)
        mscores0 = out["matching_scores0"].reshape(B, K, pad)
        offsets = out["offsets"].reshape(B, K, H, 2)
        centers_xy = centers[..., 0:2].reshape(B, K, pad, 2)
        pos_mean = get_pos_in_cell(centers_xy, matches0,
                                   jnp.zeros_like(offsets))
        pos_offsets = get_pos_in_cell(centers_xy, matches0, offsets)
        confidences = jnp.sum(matches0 >= 0, axis=2)     # [B, K]
        conf_scores = _match_confidence_scores(matches0, mscores0)
        spreads = _match_vote_spread(out["matches1"].reshape(B, K, H),
                                     offsets, centers_xy)
        return (matches0, pos_mean, pos_offsets, confidences, conf_scores,
                spreads)

    def run_fine(self, loader, poses, top_idx: np.ndarray, vocab: Vocabulary,
                 chunk: int = 8, use_cache: bool = True,
                 fine_bank=None) -> Tuple[Dict, Dict, Dict]:
        """Fine matching over every pose × top-k cell (pipeline.py:172-279).

        With ``use_cache`` (default) the query-independent object encodings
        of all DB cells are computed once (``precompute_fine_bank``) and the
        per-query work reduces to hint encoding + attention + Sinkhorn.
        """
        cfg = self.cfg
        bank = loader.bank
        Q, K = top_idx.shape
        H = cfg.num_mentioned

        hint_lists = [create_hint_description(p) for p in poses]
        hint_tokens = np.zeros((Q, H, cfg.max_hint_len), np.int32)
        hint_lengths = np.ones((Q, H), np.int32)
        for i, hints in enumerate(hint_lists):
            tk, ln = vocab.encode_batch(hints[:H], cfg.max_hint_len)
            hint_tokens[i, : len(tk)] = tk
            hint_lengths[i, : len(ln)] = ln

        bank_dev = {
            "points_xyz": jnp.asarray(bank.points_xyz),
            "points_rgb": jnp.asarray(bank.points_rgb),
            "point_count": jnp.asarray(bank.point_count),
            "centers": jnp.asarray(bank.centers),
            "colors": jnp.asarray(bank.colors),
            "class_idx": jnp.asarray(bank.class_idx),
            "color_idx": jnp.asarray(bank.color_idx),
            "mask": jnp.asarray(bank.mask),
        }

        if use_cache and fine_bank is None:
            fine_bank = self.precompute_fine_bank(bank, bank_dev)

        pos_mean = np.zeros((Q, K, 2), np.float32)
        pos_offsets = np.zeros((Q, K, 2), np.float32)
        confidences = np.zeros((Q, K), np.int32)
        conf_scores = np.zeros((Q, K), np.float32)
        spreads = np.zeros((Q, K), np.float32)
        rng = jax.random.PRNGKey(cfg.seed)
        for i in range(0, Q, chunk):
            sl = slice(i, min(i + chunk, Q))
            real = sl.stop - sl.start
            idx = top_idx[sl]
            tok, lng = hint_tokens[sl], hint_lengths[sl]
            if real < chunk:  # pad to static chunk size
                reps = chunk - real
                idx = np.concatenate([idx, idx[:1].repeat(reps, 0)])
                tok = np.concatenate([tok, tok[:1].repeat(reps, 0)])
                lng = np.concatenate([lng, lng[:1].repeat(reps, 0)])
            if use_cache:
                _, pm, po, cf, cs, sp = self._match_chunk_cached(
                    self.fine_state, fine_bank[0], fine_bank[1],
                    jnp.asarray(idx), jnp.asarray(tok), jnp.asarray(lng))
            else:
                _, pm, po, cf, cs, sp = self._fine_chunk(
                    self.fine_state, bank_dev, jnp.asarray(idx),
                    jnp.asarray(tok), jnp.asarray(lng),
                    jax.random.fold_in(rng, i))
            pos_mean[sl] = np.asarray(pm)[:real]
            pos_offsets[sl] = np.asarray(po)[:real]
            confidences[sl] = np.asarray(cf)[:real]
            conf_scores[sl] = np.asarray(cs)[:real]
            spreads[sl] = np.asarray(sp)[:real]

        if getattr(cfg, "rerank", 0) > 0 and K > 1:
            # Fine-confidence re-ranking: reorder each query's candidates
            # by summed matched transport scores (stable → coarse order
            # breaks ties), so top-k accuracy is measured on the re-ranked
            # list. The candidate SET is unchanged; only the order is.
            # cfg.rerank_gamma > 0 penalizes scattered position votes
            # (same signal as serving's rerank_gamma, _match_vote_spread).
            order = _rerank_order(conf_scores, spreads,
                                  float(getattr(cfg, "rerank_gamma", 0.0)))
            rows = np.arange(Q)[:, None]
            top_idx = top_idx[rows, order]
            pos_mean = pos_mean[rows, order]
            pos_offsets = pos_offsets[rows, order]
            confidences = confidences[rows, order]

        accs_mean = self._accuracies(poses, bank, top_idx, pos_mean)
        accs_offsets = self._accuracies(poses, bank, top_idx, pos_offsets)

        conf_idx = np.argmax(confidences, axis=1)
        rows = np.arange(Q)
        accs_conf = self._accuracies(
            poses, bank, top_idx[rows, conf_idx][:, None],
            pos_mean[rows, conf_idx][:, None], top_k=(1,))
        return accs_mean, accs_offsets, accs_conf

    # ------------------------------------------------------------------
    # Single-program serving: the full query batch in one XLA program
    # ------------------------------------------------------------------
    def _cheap_matcher(self, prune_layers: int, prune_sinkhorn: int):
        """Truncated matcher for the cascaded re-ranking's cheap pass: the
        FIRST ``prune_layers`` self/cross block pairs of the trained GNN
        (the residual stream makes intermediate descriptors usable by the
        final projection) and ``prune_sinkhorn`` Sinkhorn iterations.
        Same weights, same BN mode — flax ignores the unused deeper-layer
        parameters. Cached per (layers, iters)."""
        key = (prune_layers, prune_sinkhorn)
        cache = self.__dict__.setdefault("_cheap_models", {})
        if key not in cache:
            cache[key] = self.fine.model.clone(
                num_layers=prune_layers, sinkhorn_iters=prune_sinkhorn)
        return cache[key]

    @functools.partial(jax.jit,
                       static_argnums=(0, 8, 11, 12, 13, 14, 15, 16, 17))
    def serve_batch(self, coarse_state: TrainState, fine_state: TrainState,
                    tokens: jnp.ndarray, lengths: jnp.ndarray,
                    hint_tokens: jnp.ndarray, hint_lengths: jnp.ndarray,
                    cell_enc: jnp.ndarray, top_k: int,
                    obj_enc_bank: jnp.ndarray, centers_xy_bank: jnp.ndarray,
                    rerank_k: int = 0, rerank_lambda: float = 0.0,
                    rerank_gamma: float = 0.0, prune_m: int = 0,
                    prune_layers: int = 1, prune_sinkhorn: int = 10,
                    prune_soft: bool = False,
                    cheap_bank: Optional[jnp.ndarray] = None,
                    cheap_scale: Optional[jnp.ndarray] = None):
        """Localize a batch of queries end-to-end in ONE jitted program:
        LSTM text encode → top-k retrieval matmul → SuperGlue matching vs
        pre-encoded cells → in-cell positions. One host→device transfer of
        the token arrays, one device→host transfer of the results — the
        full realization of the zero-round-trip north star.

        With ``rerank_k > top_k`` the coarse stage retrieves ``rerank_k``
        candidates, the fine matcher runs on all of them, and the returned
        ``top_k`` are the highest by summed matched transport score
        (stable: coarse order breaks ties). Top-k recall is then bounded
        by coarse top-``rerank_k`` recall instead of top-``top_k``, at
        ``rerank_k/top_k``× the fine-stage compute.

        ``rerank_lambda > 0`` blends the coarse retrieval similarity into
        the re-ranking score (``conf + lambda * sim``) — the match
        confidence is a noisy per-cell signal at wide pools, and keeping
        some weight on the retrieval score measurably helps
        (scripts/sweep_rerank.py: +~1 pt top-10@15m at rerank_k=40,
        lambda≈2–4). ``rerank_gamma > 0`` additionally penalizes the
        spread of the matched hints' position votes
        (``… - gamma * spread``, see ``_match_vote_spread``) — the
        strongest re-ranking signal found by the offline scoring lab
        (scripts/rerank_score_lab.py: gamma=6 lifts bench top-10@15m
        0.716 → 0.779 and top-1 0.385 → 0.520 at rerank_k=100-128).
        No reference equivalent; both off by default.

        ``prune_m > 0`` (with ``rerank_k > prune_m > top_k``) enables the
        CASCADED re-ranking: all ``rerank_k`` candidates are first scored
        by a cheap pass — the first ``prune_layers`` GNN block pairs of
        the SAME trained matcher (the residual stream keeps intermediate
        descriptors projectable) with ``prune_sinkhorn`` Sinkhorn
        iterations — the top ``prune_m`` by the blended cheap score
        (``conf + λ·sim − γ·spread``) survive, and only those get the
        full-depth fine pass + final re-rank. This collapses the
        accuracy/throughput cliff of brute-force re-ranking: the fine
        stage pays ``rerank_k·cheap + prune_m·full`` instead of
        ``rerank_k·full``. Extends the reference's coarse→fine cascade
        (/root/reference/evaluation/pipeline.py:38,172) by one level.

        ``cheap_bank``/``cheap_scale`` optionally feed the cheap pass an
        int8-quantized fine bank (``quantize_fine_bank``) — per-object
        scales, dequantized after the gather — halving the widest
        gather's HBM traffic vs bf16.

        Returns only the compact serving outputs (top_idx, pos_mean,
        pos_offsets, confidences) — per-object match indices are ~70% of
        the result bytes and not part of the serving contract; call
        ``_match_chunk_cached`` directly when they are needed.
        """
        text_enc = self.coarse.model.apply(
            {"params": coarse_state.params,
             "batch_stats": coarse_state.batch_stats},
            tokens, lengths, method=type(self.coarse.model).encode_text)
        k_all = rerank_k if rerank_k > top_k else top_k
        sims, top_idx = topk_retrieval(text_enc, cell_enc, k_all)

        eff_rerank = rerank_k
        if prune_m and top_k < prune_m < k_all:
            model = self.fine.model
            cheap = self._cheap_matcher(prune_layers, prune_sinkhorn)
            hint_enc = model.apply(
                {"params": fine_state.params,
                 "batch_stats": fine_state.batch_stats},
                hint_tokens, hint_lengths, method=type(model).encode_hints)
            B = top_idx.shape[0]
            flat = top_idx.reshape(B * k_all)
            if cheap_bank is not None:
                dt = model.dtype or jnp.float32
                obj_c = (cheap_bank[flat].astype(dt)
                         * cheap_scale[flat].astype(dt))
            else:
                obj_c = obj_enc_bank[flat]
            ctr_c = centers_xy_bank[flat]
            if prune_soft:
                # Soft cheap scores straight from the transport matrix
                # (losses.soft_mass_and_spread) — no mutual-max
                # extraction, no hard-match gathers; XLA dead-code-
                # eliminates the extraction ops of match_encoded. Also
                # the very surrogate the rank-aware fine loss trains
                # (losses.soft_rank_score), so a rank-trained model's
                # cheap pass scores with the signal it was optimized on.
                from text2pos_tpu.train.losses import soft_mass_and_spread

                pad = obj_c.shape[1]
                hint_rep = jnp.repeat(hint_enc, k_all, axis=0)
                out = cheap.apply(
                    {"params": fine_state.params,
                     "batch_stats": fine_state.batch_stats},
                    obj_c, hint_rep, train=False,
                    method=type(cheap).match_encoded)
                P = out["P"].reshape(B, k_all, pad + 1, -1)
                offs = out["offsets"].reshape(B, k_all, -1, 2)
                c_conf, c_spread = soft_mass_and_spread(
                    P, ctr_c.reshape(B, k_all, pad, 2), offs)
            else:
                _, _, _, _, c_conf, c_spread = self._match_from_enc(
                    fine_state, obj_c.reshape(B, k_all, *obj_c.shape[1:]),
                    ctr_c.reshape(B, k_all, *ctr_c.shape[1:]), hint_enc,
                    model=cheap)
            score = c_conf.astype(jnp.float32)
            if rerank_lambda:
                score = score + rerank_lambda * sims.astype(jnp.float32)
            if rerank_gamma:
                score = score - rerank_gamma * c_spread.astype(jnp.float32)
            keep = jnp.argsort(-score, axis=1, stable=True)[:, :prune_m]
            top_idx = jnp.take_along_axis(top_idx, keep, axis=1)
            sims = jnp.take_along_axis(sims, keep, axis=1)
            eff_rerank = prune_m
            # Full pass on the survivors, reusing the cheap pass's hint
            # encodings (the LSTM encode is per-query, not per-pair —
            # re-encoding inside _match_chunk_cached would double it).
            kept_flat = top_idx.reshape(-1)
            obj_f = obj_enc_bank[kept_flat].reshape(
                B, prune_m, *obj_enc_bank.shape[1:])
            ctr_f = centers_xy_bank[kept_flat].reshape(
                B, prune_m, *centers_xy_bank.shape[1:])
            _, pos_mean, pos_offsets, confidences, conf_scores, spreads = (
                self._match_from_enc(fine_state, obj_f, ctr_f, hint_enc))
            return self._compact_results(
                top_idx, pos_mean, pos_offsets, confidences, conf_scores,
                top_k, eff_rerank, cell_enc.shape[0], sims=sims,
                rerank_lambda=rerank_lambda, spreads=spreads,
                rerank_gamma=rerank_gamma)

        match = (self._match_chunk_fused if self._gnn_folded is not None
                 else self._match_chunk_cached)
        _, pos_mean, pos_offsets, confidences, conf_scores, spreads = match(
            fine_state, obj_enc_bank, centers_xy_bank, top_idx,
            hint_tokens, hint_lengths)
        return self._compact_results(top_idx, pos_mean, pos_offsets,
                                     confidences, conf_scores, top_k,
                                     eff_rerank, cell_enc.shape[0],
                                     sims=sims, rerank_lambda=rerank_lambda,
                                     spreads=spreads,
                                     rerank_gamma=rerank_gamma)

    @staticmethod
    def _compact_results(top_idx, pos_mean, pos_offsets, confidences,
                         conf_scores, top_k: int, rerank_k: int,
                         num_cells: int, sims=None,
                         rerank_lambda: float = 0.0, spreads=None,
                         rerank_gamma: float = 0.0):
        """Re-rank (when enabled) + compact wire types — the tail shared
        by serve_batch and the DB-sharded serving mode."""
        if rerank_k > top_k:
            score = conf_scores.astype(jnp.float32)
            if sims is not None and rerank_lambda:
                score = score + rerank_lambda * sims.astype(jnp.float32)
            if spreads is not None and rerank_gamma:
                # Penalize scattered position votes (_match_vote_spread):
                # conf + lam*sim - gamma*spread is the best hand form found
                # by the offline lab (0.716 -> 0.779 top-10@15m at K'=128).
                score = score - rerank_gamma * spreads.astype(jnp.float32)
            order = jnp.argsort(-score, axis=1, stable=True)[:, :top_k]
            top_idx = jnp.take_along_axis(top_idx, order, axis=1)
            pos_mean = jnp.take_along_axis(pos_mean, order[..., None], axis=1)
            pos_offsets = jnp.take_along_axis(pos_offsets, order[..., None],
                                              axis=1)
            confidences = jnp.take_along_axis(confidences, order, axis=1)
        # Compact wire types: the device→host fetch rides a high-latency
        # link (~17 ms for the f32 results at Q=2048); int16 cell indices,
        # f16 in-cell positions (resolution 2⁻¹¹ of a cell ≈ 1.5 cm at
        # 30 m cells) and u8 match counts carry the same information in a
        # third of the bytes.
        if num_cells < 2 ** 15:  # int16-addressable DB
            top_idx = top_idx.astype(jnp.int16)
        return (top_idx, pos_mean.astype(jnp.float16),
                pos_offsets.astype(jnp.float16),
                confidences.astype(jnp.uint8))

    def run_fine_oracle(self, loader, poses, top_idx: np.ndarray,
                        random_oracle: bool = False) -> Dict:
        """Perfect (or random) in-cell positions (pipeline.py:140-168)."""
        bank = loader.bank
        pose_w = np.array([p.pose_w[0:2] for p in poses])
        if random_oracle:
            rng = np.random.default_rng(self.cfg.seed)
            pos = rng.random(top_idx.shape + (2,))
        else:
            lo = bank.bbox_w[top_idx][..., 0:2]
            size = bank.cell_size[top_idx][..., None]
            pos = np.clip((pose_w[:, None, :] - lo) / size, 0, 1)
        return self._accuracies(poses, bank, top_idx, pos)


def build_pipeline_from_checkpoints(cfg: EvalConfig, path_coarse: str,
                                    path_fine: str, dtype: Optional[str] = None
                                    ) -> Tuple["LocalizationPipeline",
                                               Vocabulary, Vocabulary]:
    """Restore both stages from msgpack checkpoints into a ready pipeline.

    The checkpoints carry their vocab + model hyperparameters in ``extra``
    (saved by train.coarse/train.fine); ``dtype`` optionally overrides the
    compute dtype of the restored model bodies (e.g. "bfloat16" serving).
    Returns (pipeline, coarse_vocab, fine_vocab).
    """
    from text2pos_tpu.train.state import load_checkpoint

    coarse_payload = load_checkpoint(path_coarse)
    fine_payload = load_checkpoint(path_fine)
    vocab = Vocabulary(coarse_payload["extra"]["known_words"])
    fine_vocab = Vocabulary(fine_payload["extra"].get(
        "known_words", coarse_payload["extra"]["known_words"]))

    cx, fx = coarse_payload["extra"], fine_payload["extra"]
    common = dict(
        batch_size=cfg.batch_size,
        pointnet_numpoints=cfg.pointnet_numpoints,
        coarse_max_objects=cfg.coarse_max_objects,
        num_mentioned=cfg.num_mentioned, pad_size=cfg.pad_size,
        no_pc_augment=cfg.no_pc_augment)
    if dtype is not None:
        common["dtype"] = dtype
    ctrain_cfg = TrainConfig(
        embed_dim=cx.get("embed_dim", 256),
        variation=cx.get("variation", 0),
        use_features=tuple(cx.get("use_features",
                                  ("class", "color", "position"))),
        **common)
    ftrain_cfg = TrainConfig(
        embed_dim=fx.get("embed_dim", 128),
        num_layers=fx.get("num_layers", 6),
        sinkhorn_iters=fx.get("sinkhorn_iters", 50),
        use_features=tuple(fx.get("use_features",
                                  ("class", "color", "position"))),
        **common)

    coarse = CoarseTrainer(ctrain_cfg, vocab)
    fine = FineTrainer(ftrain_cfg, fine_vocab)
    # Optimizer-free eval states: a live optax tx in the (static) pytree
    # metadata would make the serve programs unshareable across processes
    # (bench.py's executable snapshots failed pytree matching on restore).
    cstate = TrainState.create_eval(coarse_payload["params"],
                                    coarse_payload["batch_stats"])
    fstate = TrainState.create_eval(fine_payload["params"],
                                    fine_payload["batch_stats"])
    mesh = None
    if getattr(cfg, "data_parallel", 1) > 1:
        from text2pos_tpu.parallel.dp import make_mesh

        mesh = make_mesh(cfg.data_parallel)
    pipe = LocalizationPipeline(coarse, cstate, fine, fstate, cfg, mesh=mesh)
    return pipe, vocab, fine_vocab


def main():
    """CLI entry: python -m text2pos_tpu.evaluation.pipeline
    (reference evaluation/pipeline.py:282-343)."""
    from text2pos_tpu.config import parse_config
    from text2pos_tpu.data.loaders import CoarseLoader
    from text2pos_tpu.evaluation.metrics import print_accuracies
    from text2pos_tpu.utils.cli import load_split

    cfg = parse_config(EvalConfig)
    split = "test" if cfg.use_test_set else "val"
    cells, poses = load_split(cfg, split)

    pipe, vocab, fine_vocab = build_pipeline_from_checkpoints(
        cfg, cfg.path_coarse, cfg.path_fine)

    loader = CoarseLoader(cells, poses, vocab, cfg.batch_size,
                          cfg.coarse_max_objects, cfg.pointnet_numpoints,
                          cfg.max_text_len)

    top_idx, coarse_accs = pipe.run_coarse(loader, poses)
    print_accuracies(coarse_accs, "Coarse")
    if cfg.plot_retrievals:
        # Render success/failure examples, then stop
        # (reference pipeline.py:325-328).
        import cv2

        from text2pos_tpu.utils.drawing import plot_retrievals

        retrievals = [[loader.bank.cell_ids[ci] for ci in row]
                      for row in top_idx]
        os_dir = "./plots/retrievals"
        import os

        os.makedirs(os_dir, exist_ok=True)
        for i, (ok, img) in enumerate(plot_retrievals(retrievals, cells, poses)):
            tag = "success" if ok else "fail"
            cv2.imwrite(f"{os_dir}/{tag}_{i}.png", img)
        print(f"wrote retrieval examples to {os_dir}")
        return
    if cfg.coarse_only:
        return

    if cfg.fine_oracle or cfg.fine_random:
        accs = pipe.run_fine_oracle(loader, poses, top_idx,
                                    random_oracle=cfg.fine_random)
        print_accuracies(accs, "Fine (oracle)")
    else:
        accs_mean, accs_offsets, accs_conf = pipe.run_fine(
            loader, poses, top_idx, fine_vocab)
        tag = f", reranked@{cfg.rerank}" if cfg.rerank > 0 else ""
        print_accuracies(accs_mean, f"Fine (mean{tag})")
        print_accuracies(accs_offsets, f"Fine (offsets{tag})")
        print_accuracies(accs_conf, f"Fine (mean-conf{tag})")


if __name__ == "__main__":
    main()
