"""Device-resident fine-stage training: zero host work per step.

Counterpart of train/fused_coarse.py for the matching stage. The fine
supervision (padded objects, hint tokens, gt matches, dustbin pairs,
offset targets) is *static per pose* — the reference trains the fine stage
without cell augmentation (training/fine.py:241-243, flip_pose=False), and
the only stochastic parts are the geometric point transforms, which were
already on device. So every FineSample is materialized once into device
arrays [Q, ...]; an epoch is a single ``lax.scan`` program over shuffled
pose indices gathering its batches from HBM.
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
from text2pos_tpu.data.hints import Vocabulary
from text2pos_tpu.data.loaders import FineLoader
from text2pos_tpu.ops.transforms import prepare_object_points
from text2pos_tpu.train.fine import FineTrainer
from text2pos_tpu.train.state import TrainState

_BATCH_KEYS = (
    "points_xyz", "points_rgb", "point_count", "centers", "colors",
    "class_idx", "color_idx", "hint_tokens", "hint_lengths",
    "gt_obj_for_hint", "all_matches", "all_matches_count", "offsets",
    "offsets_best_center", "pose_in_cell", "pose_w",
)


class FusedFineTrainer(FineTrainer):
    """FineTrainer whose training batches are assembled on device."""

    def __init__(self, cfg: TrainConfig, vocab: Vocabulary, cells, poses,
                 seed: int = 0):
        super().__init__(cfg, vocab)
        loader = FineLoader(cells, poses, vocab, cfg.batch_size, cfg.pad_size,
                            cfg.num_mentioned, cfg.pointnet_numpoints,
                            cfg.max_hint_len,
                            regressor_cell=cfg.regressor_cell,
                            regressor_learn=cfg.regressor_learn, seed=seed)
        self.loader = loader
        self.num_poses = len(poses)

        # Materialize every pose's supervision once.
        rng = np.random.default_rng(seed)
        samples = [loader.make_sample(i, rng) for i in range(len(poses))]
        collated = loader._collate(samples, len(samples),
                                   np.arange(len(samples), dtype=np.int32))
        self.dev = {k: jnp.asarray(collated[k]) for k in _BATCH_KEYS}

    def _step_core(self, state: TrainState, dev: Dict, pose_idx: jnp.ndarray,
                   rng: jax.Array):
        cfg = self.cfg
        batch = {k: dev[k][pose_idx] for k in _BATCH_KEYS}
        pts, cols = prepare_object_points(
            batch["points_xyz"], batch["points_rgb"], batch["point_count"],
            cfg.pointnet_numpoints, rng, augment=True,
            no_pc_augment=cfg.no_pc_augment)

        def loss_fn(params):
            # Shared objective incl. the optional rank-aware term
            # (FineTrainer._loss_fn).
            loss, (new_bs, _out, _lm, _lo) = self._loss_fn(
                params, state.batch_stats, batch, pts, cols)
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads, new_bs), loss

    @functools.partial(jax.jit, static_argnums=(0,))
    def _fused_epoch(self, state: TrainState, dev: Dict,
                     epoch_idx: jnp.ndarray, rng: jax.Array):
        steps = epoch_idx.shape[0]
        rngs = jax.random.split(rng, steps)

        def body(carry, inp):
            idx, step_rng = inp
            new_state, loss = self._step_core(carry, dev, idx, step_rng)
            return new_state, loss

        state, losses = jax.lax.scan(body, state, (epoch_idx, rngs))
        return state, jnp.mean(losses)

    def fused_train_epoch(self, state: TrainState, epoch: int,
                          rng: jax.Array) -> Tuple[TrainState, float]:
        B = self.cfg.batch_size
        steps = self.num_poses // B
        if steps == 0:
            return state, float("nan")
        order = np.random.default_rng(
            self.cfg.seed * 10_000 + epoch).permutation(self.num_poses)
        step_idx = order[: steps * B].reshape(steps, B).astype(np.int32)

        # Segmented dispatch — same rationale as FusedCoarseTrainer
        # (bounds per-dispatch wall time; a relay drop costs one segment).
        seg = int(os.environ.get("T2P_FUSED_SEG", "128"))
        erng = jax.random.fold_in(rng, epoch)
        if seg <= 0 or steps <= seg:
            state, loss = self._fused_epoch(state, self.dev,
                                            jnp.asarray(step_idx), erng)
            return state, float(loss)
        verbose = os.environ.get("T2P_FUSED_VERBOSE") == "1"
        losses, seg_lengths = [], []
        for i, s0 in enumerate(range(0, steps, seg)):
            t0 = time.time()
            state, loss = self._fused_epoch(
                state, self.dev, jnp.asarray(step_idx[s0:s0 + seg]),
                jax.random.fold_in(erng, i))
            losses.append(float(loss))
            seg_lengths.append(min(s0 + seg, steps) - s0)
            if verbose:
                print(f"    seg {i} steps {s0}..{min(s0+seg, steps)} "
                      f"loss {losses[-1]:0.3f} ({time.time()-t0:0.1f}s)",
                      flush=True)
        # Per-step mean: don't overweight the shorter remainder segment.
        return state, float(np.average(losses, weights=seg_lengths))
