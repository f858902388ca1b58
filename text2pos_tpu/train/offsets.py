"""Standalone offset/direction regressor training.

Rebuild of /root/reference/training/offsets.py:28-223: MSE on normalized
direction vectors per hint, with a gt-match-oracle intersection-error
evaluation. A study script in the reference; kept for capability parity.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from text2pos_tpu.config import TrainConfig
from text2pos_tpu.data.hints import Vocabulary
from text2pos_tpu.data.loaders import FineLoader
from text2pos_tpu.models.matcher import get_pos_in_cell_intersect
from text2pos_tpu.models.offsets import OffsetRegressor
from text2pos_tpu.train.state import TrainState, make_optimizer


class OffsetsTrainer:
    def __init__(self, cfg: TrainConfig, vocab: Vocabulary):
        self.cfg = cfg
        self.model = OffsetRegressor(vocab.size, cfg.regressor_dim)

    def init_state(self, batch, rng, steps_per_epoch: int) -> TrainState:
        variables = jax.jit(self.model.init)(
            rng, jnp.asarray(batch["hint_tokens"]),
            jnp.asarray(batch["hint_lengths"]))
        tx = make_optimizer(self.cfg.learning_rate, self.cfg.lr_gamma,
                            steps_per_epoch)
        return TrainState.create(variables["params"],
                                 variables.get("batch_stats", {}), tx)

    @staticmethod
    def _normalized_targets(offsets: jnp.ndarray) -> jnp.ndarray:
        return offsets / jnp.maximum(
            jnp.linalg.norm(offsets, axis=-1, keepdims=True), 1e-12)

    @functools.partial(jax.jit, static_argnums=(0,))
    def train_step(self, state: TrainState, batch):
        targets = self._normalized_targets(batch["offsets"])

        def loss_fn(params):
            pred = self.model.apply({"params": params}, batch["hint_tokens"],
                                    batch["hint_lengths"], train=True)
            return jnp.mean((pred - targets) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    @functools.partial(jax.jit, static_argnums=(0,))
    def eval_step(self, state: TrainState, batch):
        """Direction MSE + intersection localization error using the gt
        matches as oracle (reference offsets.py:59-90)."""
        pred = self.model.apply({"params": state.params},
                                batch["hint_tokens"], batch["hint_lengths"],
                                train=False)
        targets = self._normalized_targets(batch["offsets"])
        mse = jnp.mean((pred - targets) ** 2)

        # Oracle matches: hint h ↔ gt object (if matched). Scatter only the
        # valid pairs: add (hint+1)·valid so unmatched hints contribute 0
        # (an unconditional scatter of −1 at the safe index would clobber a
        # real match on object 0).
        gt = batch["gt_obj_for_hint"]                      # [B, H]
        B, O = batch["centers"].shape[0:2]
        H = gt.shape[1]
        hint_ids = jnp.broadcast_to(jnp.arange(H)[None, :], gt.shape)
        valid = gt >= 0
        safe = jnp.where(valid, gt, 0)
        accum = jnp.zeros((B, O), jnp.int32).at[
            jnp.arange(B)[:, None], safe
        ].add(((hint_ids + 1) * valid).astype(jnp.int32))
        matches0 = jnp.where(accum > 0, accum - 1, -1)
        pos = get_pos_in_cell_intersect(batch["centers"][..., 0:2], matches0,
                                        pred)
        err = jnp.mean(jnp.linalg.norm(
            pos - batch["pose_in_cell"][..., 0:2], axis=-1))
        return mse, err


def train(cfg: TrainConfig, cells_train, poses_train, cells_val, poses_val,
          log=print) -> Tuple[TrainState, Dict]:
    from text2pos_tpu.data.hints import build_vocabulary, create_hint_description

    vocab = Vocabulary(build_vocabulary(
        [create_hint_description(p) for p in poses_train]))

    def make_loader(cells, poses):
        return FineLoader(cells, poses, vocab, cfg.batch_size, cfg.pad_size,
                          cfg.num_mentioned, cfg.pointnet_numpoints,
                          cfg.max_hint_len,
                          regressor_cell=cfg.regressor_cell,
                          regressor_learn=cfg.regressor_learn)

    loader_train = make_loader(cells_train, poses_train)
    loader_val = make_loader(cells_val, poses_val)

    trainer = OffsetsTrainer(cfg, vocab)
    rng = jax.random.PRNGKey(cfg.seed)
    first = next(loader_train.epoch(seed=0))
    state = trainer.init_state(first, rng,
                               loader_train.num_batches(drop_last=True))

    history = {"loss": [], "val_mse": [], "val_err": []}
    for epoch in range(cfg.epochs):
        losses = []
        for batch in loader_train.epoch(seed=epoch):
            jb = {k: jnp.asarray(v) for k, v in batch.items()
                  if k not in ("num_real", "pose_idx")}
            state, loss = trainer.train_step(state, jb)
            losses.append(float(loss))
        val_mse, val_err = [], []
        for batch in loader_val.epoch(seed=0, shuffle=False):
            jb = {k: jnp.asarray(v) for k, v in batch.items()
                  if k not in ("num_real", "pose_idx")}
            m, e = trainer.eval_step(state, jb)
            val_mse.append(float(m))
            val_err.append(float(e))
        history["loss"].append(float(np.mean(losses)))
        history["val_mse"].append(float(np.mean(val_mse)))
        history["val_err"].append(float(np.mean(val_err)))
        log(f"epoch {epoch} loss {np.mean(losses):0.4f} "
            f"val-mse {np.mean(val_mse):0.4f} val-err {np.mean(val_err):0.3f}")

    return state, {"history": history, "vocab": vocab, "trainer": trainer}


if __name__ == "__main__":
    from text2pos_tpu.config import parse_config
    from text2pos_tpu.utils.cli import load_split

    cfg = parse_config(TrainConfig)
    cells_train, poses_train = load_split(cfg, "train")
    cells_val, poses_val = load_split(cfg, "val")
    train(cfg, cells_train, poses_train, cells_val, poses_val)
