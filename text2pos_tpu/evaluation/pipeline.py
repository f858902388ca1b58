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
import time
from typing import Dict, List, Optional, Tuple

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


class LocalizationPipeline:
    """Bundles the coarse retriever + fine matcher for end-to-end eval."""

    def __init__(self, coarse: CoarseTrainer, coarse_state: TrainState,
                 fine: FineTrainer, fine_state: TrainState, cfg: EvalConfig):
        self.coarse = coarse
        self.coarse_state = coarse_state
        self.fine = fine
        self.fine_state = fine_state
        self.cfg = cfg

    # ------------------------------------------------------------------
    # Coarse stage
    # ------------------------------------------------------------------
    def run_coarse(self, loader, poses) -> Tuple[np.ndarray, Dict]:
        """Retrieve max(top_k) cells per pose; coarse accuracy predicts cell
        centers (reference pipeline.py:38-137)."""
        cfg = self.cfg
        bank = loader.bank
        max_k = min(max(cfg.top_k), bank.num_cells)

        if cfg.coarse_oracle:
            target = loader.pose_cell_idx
            top_idx = np.tile(target[:, None], (1, max_k))
        elif cfg.coarse_random:
            rng = np.random.default_rng(cfg.seed)
            top_idx = rng.integers(0, bank.num_cells, size=(len(poses), max_k))
        else:
            text_enc = self.coarse.encode_all_queries(self.coarse_state, loader)
            cell_enc = self.coarse.encode_all_cells(
                self.coarse_state, bank, jax.random.PRNGKey(cfg.seed))
            _, top_idx = topk_retrieval(
                jnp.asarray(text_enc), jnp.asarray(cell_enc), max_k)
            top_idx = np.asarray(top_idx)

        accs = self._accuracies(poses, bank, top_idx,
                                pos_in_cells=np.full(top_idx.shape + (2,), 0.5))
        return top_idx, accs

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
    @functools.partial(jax.jit, static_argnums=(0,))
    def _fine_chunk(self, fine_state: TrainState, bank_dev: Dict,
                    top_idx: jnp.ndarray, hint_tokens: jnp.ndarray,
                    hint_lengths: jnp.ndarray, rng: jax.Array):
        """Run the matcher for a chunk of queries against their top-k cells.

        Args:
            bank_dev:     device-resident dense cell bank arrays
            top_idx:      [B, K] retrieved cell indices for this chunk
            hint_tokens:  [B, H, T] per-pose hints
        Returns per-(query, cell) matches, in-cell position estimates and
        confidences — all [B, K, ...].
        """
        cfg = self.fine.cfg
        B, K = top_idx.shape
        pad = cfg.pad_size
        flat_idx = top_idx.reshape(B * K)

        def take(name):
            return bank_dev[name][flat_idx]

        # Cut the bank's object axis to pad_size (reference eval.py:152-154).
        xyz = take("points_xyz")[:, :pad]
        rgb = take("points_rgb")[:, :pad]
        count = take("point_count")[:, :pad]
        centers = take("centers")[:, :pad]
        colors = take("colors")[:, :pad]
        class_idx = take("class_idx")[:, :pad]
        color_idx = take("color_idx")[:, :pad]
        mask = take("mask")[:, :pad]

        # Fill invalid slots with padding objects: 8 near-zero random points,
        # black, class "pad" (reference imports.py:75-83, eval.py:156-158).
        pad_pts = jax.random.uniform(rng, (B * K, pad, 8, 3)) * 0.001
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
        offsets = out["offsets"].reshape(B, K, H, 2)
        centers_xy = centers[..., 0:2].reshape(B, K, pad, 2)
        pos_mean = get_pos_in_cell(centers_xy, matches0,
                                   jnp.zeros_like(offsets))
        pos_offsets = get_pos_in_cell(centers_xy, matches0, offsets)
        confidences = jnp.sum(matches0 >= 0, axis=2)     # [B, K]
        return matches0, pos_mean, pos_offsets, confidences

    def run_fine(self, loader, poses, top_idx: np.ndarray, vocab: Vocabulary,
                 chunk: int = 8) -> Tuple[Dict, Dict, Dict]:
        """Fine matching over every pose × top-k cell (pipeline.py:172-279)."""
        cfg = self.cfg
        bank = loader.bank
        Q, K = top_idx.shape
        H = cfg.num_mentioned

        hint_lists = [create_hint_description(p) for p in poses]
        hint_tokens = np.zeros((Q, H, cfg.max_hint_len), np.int32)
        hint_lengths = np.ones((Q, H), np.int32)
        for i, hints in enumerate(hint_lists):
            tk, ln = vocab.encode_batch(hints, cfg.max_hint_len)
            hint_tokens[i, : len(hints)] = tk
            hint_lengths[i, : len(hints)] = ln

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

        pos_mean = np.zeros((Q, K, 2), np.float32)
        pos_offsets = np.zeros((Q, K, 2), np.float32)
        confidences = np.zeros((Q, K), np.int32)
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
            _, pm, po, cf = self._fine_chunk(
                self.fine_state, bank_dev, jnp.asarray(idx), jnp.asarray(tok),
                jnp.asarray(lng), jax.random.fold_in(rng, i))
            pos_mean[sl] = np.asarray(pm)[:real]
            pos_offsets[sl] = np.asarray(po)[:real]
            confidences[sl] = np.asarray(cf)[:real]

        accs_mean = self._accuracies(poses, bank, top_idx, pos_mean)
        accs_offsets = self._accuracies(poses, bank, top_idx, pos_offsets)

        conf_idx = np.argmax(confidences, axis=1)
        rows = np.arange(Q)
        accs_conf = self._accuracies(
            poses, bank, top_idx[rows, conf_idx][:, None],
            pos_mean[rows, conf_idx][:, None], top_k=(1,))
        return accs_mean, accs_offsets, accs_conf

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


def main():
    """CLI entry: python -m text2pos_tpu.evaluation.pipeline
    (reference evaluation/pipeline.py:282-343)."""
    from text2pos_tpu.config import parse_config
    from text2pos_tpu.data.loaders import CoarseLoader
    from text2pos_tpu.evaluation.metrics import print_accuracies
    from text2pos_tpu.train.state import TrainState, load_checkpoint, make_optimizer
    from text2pos_tpu.utils.cli import load_split

    cfg = parse_config(EvalConfig)
    split = "test" if cfg.use_test_set else "val"
    cells, poses = load_split(cfg, split)

    # Restore models: vocab + params live in the msgpack checkpoints.
    coarse_payload = load_checkpoint(cfg.path_coarse)
    fine_payload = load_checkpoint(cfg.path_fine)
    vocab = Vocabulary(coarse_payload["extra"]["known_words"])
    fine_vocab = Vocabulary(fine_payload["extra"].get(
        "known_words", coarse_payload["extra"]["known_words"]))

    ctrain_cfg = TrainConfig(
        batch_size=cfg.batch_size,
        embed_dim=coarse_payload["extra"].get("embed_dim", 256),
        pointnet_numpoints=cfg.pointnet_numpoints,
        coarse_max_objects=cfg.coarse_max_objects,
        num_mentioned=cfg.num_mentioned, pad_size=cfg.pad_size,
        no_pc_augment=cfg.no_pc_augment)
    ftrain_cfg = TrainConfig(
        batch_size=cfg.batch_size,
        embed_dim=fine_payload["extra"].get("embed_dim", 128),
        num_layers=fine_payload["extra"].get("num_layers", 6),
        sinkhorn_iters=fine_payload["extra"].get("sinkhorn_iters", 50),
        pointnet_numpoints=cfg.pointnet_numpoints,
        coarse_max_objects=cfg.coarse_max_objects,
        num_mentioned=cfg.num_mentioned, pad_size=cfg.pad_size,
        no_pc_augment=cfg.no_pc_augment)

    coarse = CoarseTrainer(ctrain_cfg, vocab)
    fine = FineTrainer(ftrain_cfg, fine_vocab)
    tx = make_optimizer(1e-3)
    cstate = TrainState.create(coarse_payload["params"],
                               coarse_payload["batch_stats"], tx)
    fstate = TrainState.create(fine_payload["params"],
                               fine_payload["batch_stats"], tx)
    pipe = LocalizationPipeline(coarse, cstate, fine, fstate, cfg)

    loader = CoarseLoader(cells, poses, vocab, cfg.batch_size,
                          cfg.coarse_max_objects, cfg.pointnet_numpoints,
                          cfg.max_text_len)

    top_idx, coarse_accs = pipe.run_coarse(loader, poses)
    print_accuracies(coarse_accs, "Coarse")
    if cfg.coarse_only:
        return

    if cfg.fine_oracle or cfg.fine_random:
        accs = pipe.run_fine_oracle(loader, poses, top_idx,
                                    random_oracle=cfg.fine_random)
        print_accuracies(accs, "Fine (oracle)")
    else:
        accs_mean, accs_offsets, accs_conf = pipe.run_fine(
            loader, poses, top_idx, fine_vocab)
        print_accuracies(accs_mean, "Fine (mean)")
        print_accuracies(accs_offsets, "Fine (offsets)")
        print_accuracies(accs_conf, "Fine (mean-conf)")


if __name__ == "__main__":
    main()
