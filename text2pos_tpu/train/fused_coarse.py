"""Device-resident coarse training: zero host work per step.

The host batch builder (numpy packing + tokenization + flip rewrites,
tens of ms per batch) costs as much as the device step itself and adds a
host→device transfer per step — on remote-attached TPUs that transfer is
the dominant cost. This module keeps the entire dataset on device and
fuses batch assembly INTO the train step:

 - the cell bank (points/centers/colors/classes/masks) lives in HBM;
 - per-pose hint tokens are pre-tokenized once ([Q, H, T_hint]);
 - a step takes only (state, pose_indices [B], rng): it gathers the poses'
   cells from the bank, applies horizontal/vertical flips to the geometry
   AND to the text via direction-word token swap tables
   (east↔west / north↔south — the reference's string rewrite,
   dataloading/kitti360pose/utils.py:44-79, done on token ids), shuffles
   hint order per sample, packs the shuffled hints into one joined token
   sequence, and runs the contrastive update.

The epoch loop shuffles pose indices on the host — that is all the host
does. Geometric point augmentation (resample/rotate/normalize) was already
on device (ops.transforms).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from text2pos_tpu.config import TrainConfig
from text2pos_tpu.data.dense import build_cell_bank
from text2pos_tpu.data.hints import Vocabulary, create_hint_description
from text2pos_tpu.ops.transforms import prepare_object_points
from text2pos_tpu.train.coarse import CoarseTrainer
from text2pos_tpu.train.losses import (
    hardest_ranking_loss,
    pairwise_ranking_loss,
    triplet_margin_loss,
)
from text2pos_tpu.train.state import TrainState

_SWAPS = {1: (("east", "west"),), -1: (("north", "south"),)}


def build_token_swap(vocab: Vocabulary, direction: int) -> np.ndarray:
    """Identity permutation over the vocab except the direction pair."""
    table = np.arange(vocab.size, dtype=np.int32)
    for a, b in _SWAPS[direction]:
        ia, ib = vocab.word_to_index.get(a), vocab.word_to_index.get(b)
        if ia is not None and ib is not None:
            table[ia], table[ib] = ib, ia
    return table


class FusedCoarseTrainer(CoarseTrainer):
    """CoarseTrainer whose training batches are assembled on device."""

    def __init__(self, cfg: TrainConfig, vocab: Vocabulary, cells, poses,
                 seed: int = 0):
        super().__init__(cfg, vocab)
        self.bank = build_cell_bank(cells, cfg.coarse_max_objects,
                                    cfg.pointnet_numpoints, seed)
        id2idx = self.bank.id_to_index()
        self.pose_cell_idx = np.array([id2idx[p.cell_id] for p in poses],
                                      np.int32)
        self.num_poses = len(poses)

        H, Th = cfg.num_mentioned, cfg.max_hint_len
        hint_tokens = np.zeros((len(poses), H, Th), np.int32)
        hint_lengths = np.zeros((len(poses), H), np.int32)
        for i, p in enumerate(poses):
            hints = create_hint_description(p)[:H]
            tk, ln = vocab.encode_batch(hints, Th)
            hint_tokens[i, : len(tk)] = tk
            hint_lengths[i, : len(ln)] = ln

        b = self.bank
        self.dev = {
            "points_xyz": jnp.asarray(b.points_xyz),
            "points_rgb": jnp.asarray(b.points_rgb),
            "point_count": jnp.asarray(b.point_count),
            "centers": jnp.asarray(b.centers),
            "colors": jnp.asarray(b.colors),
            "class_idx": jnp.asarray(b.class_idx),
            "color_idx": jnp.asarray(b.color_idx),
            "mask": jnp.asarray(b.mask),
            "hint_tokens": jnp.asarray(hint_tokens),
            "hint_lengths": jnp.asarray(hint_lengths),
            "pose_cell_idx": jnp.asarray(self.pose_cell_idx),
            "swap_h": jnp.asarray(build_token_swap(vocab, 1)),
            "swap_v": jnp.asarray(build_token_swap(vocab, -1)),
        }

        if cfg.neg_bank:
            # Global-negative memory bank: embeddings of every train cell,
            # refreshed once per epoch (refresh_neg_bank). Anchors are scored
            # against the whole table each step; negatives that could also
            # describe the pose (same scene, pose within ~a cell size of the
            # cell center — the sample_close_cell neighborhood) are masked.
            scene_ids = {s: i for i, s in
                         enumerate(dict.fromkeys(b.scene_names))}
            cell_scene = np.array([scene_ids[s] for s in b.scene_names],
                                  np.int32)
            centers_w = 0.5 * (b.bbox_w[:, 0:2] + b.bbox_w[:, 3:5])
            pose_w = np.array([p.pose_w[:2] for p in poses], np.float32)
            self.dev.update({
                "neg_bank": jnp.zeros((b.num_cells, cfg.embed_dim),
                                      jnp.float32),
                "neg_weight": jnp.asarray(0.0, jnp.float32),
                "cell_scene": jnp.asarray(cell_scene),
                "cell_center_w": jnp.asarray(centers_w.astype(np.float32)),
                "cell_size_w": jnp.asarray(b.cell_size.astype(np.float32)),
                "pose_w": jnp.asarray(pose_w),
            })

    # ------------------------------------------------------------------
    def _assemble_text(self, tokens: jnp.ndarray, lengths: jnp.ndarray,
                       flip_h: jnp.ndarray, flip_v: jnp.ndarray,
                       rng: jax.Array, dev: Dict = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-sample: swap direction tokens by flips, shuffle hint order,
        pack hints into one joined sequence (no interior padding)."""
        dev = self.dev if dev is None else dev
        B, H, Th = tokens.shape
        T = self.cfg.max_text_len

        # Direction-word rewrites (token-id permutation tables).
        tok = jnp.where(flip_h[:, None, None], dev["swap_h"][tokens], tokens)
        tok = jnp.where(flip_v[:, None, None], dev["swap_v"][tok], tok)

        # Per-sample random hint order (reference shuffle_hints).
        perm = jnp.argsort(jax.random.uniform(rng, (B, H)), axis=1)
        tok = jnp.take_along_axis(tok, perm[:, :, None], axis=1)
        lens = jnp.take_along_axis(lengths, perm, axis=1)

        # Pack: hint h starts at the cumulative length of the hints before it.
        offsets = jnp.cumsum(lens, axis=1) - lens                    # [B, H]
        pos = offsets[:, :, None] + jnp.arange(Th)[None, None, :]    # [B, H, Th]
        valid = jnp.arange(Th)[None, None, :] < lens[:, :, None]
        pos = jnp.where(valid, pos, T)          # park padding out of range
        joined = jnp.zeros((B, T + 1), jnp.int32)
        joined = joined.at[
            jnp.arange(B)[:, None, None], pos
        ].add(jnp.where(valid, tok, 0))
        joined = joined[:, :T]
        total = jnp.minimum(jnp.sum(lens, axis=1), T)
        return joined, total

    def fused_train_step(self, state: TrainState, pose_idx: jnp.ndarray,
                         rng: jax.Array):
        """One contrastive update from pose indices alone."""
        return self._fused_train_step(state, self.dev, pose_idx, rng)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _fused_train_step(self, state: TrainState, dev: Dict,
                          pose_idx: jnp.ndarray, rng: jax.Array):
        return self._step_core(state, dev, pose_idx, rng)

    def _step_core(self, state: TrainState, dev: Dict,
                   pose_idx: jnp.ndarray, rng: jax.Array):
        # The bank is passed as an argument pytree (device-resident arrays →
        # zero-copy), not closed over: closure constants are baked into the
        # executable and behave poorly through remote-attached runtimes.
        cfg = self.cfg
        B = pose_idx.shape[0]
        O = cfg.coarse_max_objects
        k_flip, k_shuffle, k_points = jax.random.split(rng, 3)

        cell_idx = dev["pose_cell_idx"][pose_idx]                     # [B]
        xyz = dev["points_xyz"][cell_idx]                             # [B,O,P,3]
        rgb = dev["points_rgb"][cell_idx]
        count = dev["point_count"][cell_idx]
        centers = dev["centers"][cell_idx]
        colors = dev["colors"][cell_idx]
        class_idx = dev["class_idx"][cell_idx]
        color_idx = dev["color_idx"][cell_idx]
        mask = dev["mask"][cell_idx]                                  # [B,O]

        # Geometric flips (reference flip_pose_in_cell: v → 1 − v).
        flips = jax.random.bernoulli(k_flip, 0.5, (B, 2))
        flip_h, flip_v = flips[:, 0], flips[:, 1]
        fxy = jnp.stack([flip_h, flip_v], axis=-1)                    # [B,2]
        sign = jnp.where(fxy, -1.0, 1.0)
        off = jnp.where(fxy, 1.0, 0.0)
        xyz = xyz.at[..., :2].set(
            off[:, None, None, :] + sign[:, None, None, :] * xyz[..., :2])
        centers = centers.at[..., :2].set(
            off[:, None, :] + sign[:, None, :] * centers[..., :2])

        tokens, lengths = self._assemble_text(
            dev["hint_tokens"][pose_idx], dev["hint_lengths"][pose_idx],
            flip_h, flip_v, k_shuffle, dev=dev)

        pts, cols = prepare_object_points(
            xyz, rgb, count, cfg.pointnet_numpoints, k_points,
            augment=True, no_pc_augment=cfg.no_pc_augment)

        # Dense-as-flat object layout for the shared encode_objects API.
        F = B * O
        P = pts.shape[2]
        flat = lambda a, shape: a.reshape((F,) + shape)
        cell_ids = jnp.repeat(jnp.arange(B, dtype=jnp.int32), O)
        slot_ids = jnp.tile(jnp.arange(O, dtype=jnp.int32), B)

        def loss_fn(params):
            (text, cells), updates = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                tokens, lengths,
                flat(pts, (P, 3)), flat(cols, (P, 3)), flat(centers, (3,)),
                flat(colors, (3,)), class_idx.reshape(F),
                color_idx.reshape(F), mask.reshape(F), cell_ids, slot_ids,
                B, O, train=True, mutable=["batch_stats"],
            )
            if cfg.ranking_loss == "hardest":
                loss = hardest_ranking_loss(text, cells, cfg.margin)
            elif cfg.ranking_loss == "triplet":
                # In-batch rolled negatives (see train/coarse.py).
                loss = triplet_margin_loss(
                    text, cells, jnp.roll(cells, 1, axis=0), cfg.margin)
            else:
                loss = pairwise_ranking_loss(text, cells, cfg.margin)
            if cfg.neg_bank:
                loss = loss + dev["neg_weight"] * self._neg_bank_loss(
                    dev, pose_idx, cell_idx, text, cells)
            return loss, updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads, new_bs), loss

    # ------------------------------------------------------------------
    # Global-negative memory bank
    # ------------------------------------------------------------------
    def _neg_bank_loss(self, dev: Dict, pose_idx: jnp.ndarray,
                       cell_idx: jnp.ndarray, text: jnp.ndarray,
                       cells: jnp.ndarray) -> jnp.ndarray:
        """Hinge against the hardest-M cells of the WHOLE train database.

        ``text``/``cells`` are the model's L2-normalized embeddings; the
        bank holds last-refresh embeddings of every train cell (stale by at
        most one epoch, the standard memory-bank approximation). One
        [B, E] × [E, C] MXU matmul scores each anchor against all C cells;
        cells that could legitimately describe the pose (its own cell, or a
        same-scene cell whose center is within one cell size of the pose)
        are masked out before the top-k.
        """
        cfg = self.cfg
        s_pos = jnp.sum(text * cells, axis=-1)                        # [B]
        scores = text @ dev["neg_bank"].T                             # [B, C]

        pw = dev["pose_w"][pose_idx]                                  # [B, 2]
        d = jnp.linalg.norm(
            dev["cell_center_w"][None, :, :] - pw[:, None, :], axis=-1)
        same_scene = (dev["cell_scene"][None, :]
                      == dev["cell_scene"][cell_idx][:, None])
        close = d <= dev["cell_size_w"][None, :]
        own = (jnp.arange(scores.shape[1])[None, :] == cell_idx[:, None])
        invalid = own | (same_scene & close)
        scores = jnp.where(invalid, -jnp.inf, scores)

        hard = jax.lax.top_k(scores, cfg.neg_bank_hardest)[0]         # [B, M]
        # Sum over the M hardest per anchor, mean over anchors — the same
        # scale convention as pairwise_ranking_loss (sum of hinges / B), so
        # neg_bank_weight=1 makes one bank negative count like one in-batch
        # negative rather than 1/M of one.
        return jnp.mean(jnp.sum(
            jnp.maximum(0.0, cfg.margin - s_pos[:, None] + hard), axis=1))

    def _encode_cells_core(self, state: TrainState, dev: Dict,
                           idx: jnp.ndarray) -> jnp.ndarray:
        """Eval-mode cell embeddings for bank cells ``idx`` ([B] → [B, E])."""
        cfg = self.cfg
        B = idx.shape[0]
        O = cfg.coarse_max_objects
        pts, cols = prepare_object_points(
            dev["points_xyz"][idx], dev["points_rgb"][idx],
            dev["point_count"][idx], cfg.pointnet_numpoints,
            jax.random.PRNGKey(0), augment=False,
            no_pc_augment=cfg.no_pc_augment)
        F = B * O
        P = pts.shape[2]
        cell_ids = jnp.repeat(jnp.arange(B, dtype=jnp.int32), O)
        slot_ids = jnp.tile(jnp.arange(O, dtype=jnp.int32), B)
        return self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            pts.reshape(F, P, 3), cols.reshape(F, P, 3),
            dev["centers"][idx].reshape(F, 3),
            dev["colors"][idx].reshape(F, 3),
            dev["class_idx"][idx].reshape(F),
            dev["color_idx"][idx].reshape(F),
            dev["mask"][idx].reshape(F), cell_ids, slot_ids, B, O,
            train=False, method=type(self.model).encode_objects)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _encode_bank_scan(self, state: TrainState, dev: Dict,
                          idx_chunks: jnp.ndarray) -> jnp.ndarray:
        """All bank-cell embeddings as ONE program: scan over [n, B] chunks."""
        def body(carry, idx):
            return carry, self._encode_cells_core(state, dev, idx)

        _, embs = jax.lax.scan(body, 0, idx_chunks)
        return embs                                       # [n, B, E]

    def refresh_neg_bank(self, state: TrainState) -> None:
        """Re-embed every train cell with the current parameters."""
        C = self.bank.num_cells
        B = self.cfg.batch_size
        n = -(-C // B)
        idx = np.arange(n * B) % C
        embs = self._encode_bank_scan(
            state, self.dev, jnp.asarray(idx.reshape(n, B), jnp.int32))
        self.dev["neg_bank"] = embs.reshape(n * B, -1)[:C].astype(jnp.float32)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _fused_epoch(self, state: TrainState, dev: Dict,
                     epoch_idx: jnp.ndarray, rng: jax.Array):
        """An entire epoch as one XLA program: lax.scan over the steps.

        One host→device transfer (the shuffled [steps, B] index array) and
        one dispatch per epoch.
        """
        steps = epoch_idx.shape[0]
        rngs = jax.random.split(rng, steps)

        def body(carry, inp):
            idx, step_rng = inp
            new_state, loss = self._step_core(carry, dev, idx, step_rng)
            return new_state, loss

        state, losses = jax.lax.scan(body, state, (epoch_idx, rngs))
        return state, jnp.mean(losses)

    # ------------------------------------------------------------------
    def fused_train_epoch(self, state: TrainState, epoch: int,
                          rng: jax.Array) -> Tuple[TrainState, float]:
        """Shuffle pose indices (the only host work) and scan the epoch."""
        B = self.cfg.batch_size
        steps = self.num_poses // B
        if steps == 0:
            return state, float("nan")
        bank_active = self.cfg.neg_bank and epoch > self.cfg.neg_bank_warmup
        if bank_active:
            # Bank term active this epoch: re-embed the database with the
            # parameters as of the previous epoch's end.
            self.refresh_neg_bank(state)
            self.dev["neg_weight"] = jnp.asarray(
                self.cfg.neg_bank_weight, jnp.float32)
        order = np.random.default_rng(self.cfg.seed * 10_000 + epoch).permutation(
            self.num_poses)
        step_idx = order[: steps * B].reshape(steps, B).astype(np.int32)

        # Segmented dispatch (default 128 steps per program execution):
        # bounds the wall-time of any single device dispatch so a relay /
        # worker drop costs at most one segment, and gives the retry
        # wrapper per-segment visibility. T2P_FUSED_SEG=0 restores the
        # one-dispatch-per-epoch behavior. The scan body is identical, so
        # at most two scan lengths (seg and the remainder) are compiled.
        seg = int(os.environ.get("T2P_FUSED_SEG", "128"))
        erng = jax.random.fold_in(rng, epoch)
        if seg <= 0 or steps <= seg:
            state, loss = self._fused_epoch(
                state, self.dev, jnp.asarray(step_idx), erng)
            return state, float(loss)
        verbose = os.environ.get("T2P_FUSED_VERBOSE") == "1"
        num_segs = -(-steps // seg)
        # Mid-epoch bank refreshes (cfg.neg_bank_refresh > 1): the memory
        # bank's staleness bounds how accurate the hardest-negative mining
        # is — with one refresh per epoch the last steps mine against
        # embeddings a whole epoch old. Refreshing every
        # num_segs/refresh segments costs ~C/B extra eval-encode steps per
        # refresh and keeps mining aligned with the current parameters.
        refresh_every = (max(1, num_segs // max(self.cfg.neg_bank_refresh, 1))
                         if bank_active else 0)
        losses, seg_lengths = [], []
        for i, s0 in enumerate(range(0, steps, seg)):
            if refresh_every and i and i % refresh_every == 0:
                self.refresh_neg_bank(state)
            t0 = time.time()
            state, loss = self._fused_epoch(
                state, self.dev, jnp.asarray(step_idx[s0:s0 + seg]),
                jax.random.fold_in(erng, i))
            losses.append(float(loss))  # sync: bounds in-flight work
            seg_lengths.append(min(s0 + seg, steps) - s0)
            if verbose:
                print(f"    seg {i} steps {s0}..{min(s0+seg, steps)} "
                      f"loss {losses[-1]:0.3f} ({time.time()-t0:0.1f}s)",
                      flush=True)
        # Per-step mean, not per-segment mean: the final remainder segment
        # has fewer steps and must not be overweighted in the epoch loss.
        return state, float(np.average(losses, weights=seg_lengths))
