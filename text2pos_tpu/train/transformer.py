"""Training entry for the transformer matcher alternates.

Rebuild of /root/reference/training/transformer.py (which is unrunnable in
the reference — it imports the absent semantic3d package). Trains
``models.transformer.TransformerMatch`` with the same objective as the fine
stage (matching NLL + 5·MSE offsets) on KITTI360Pose/synthetic fine
batches, so the negative-result baseline can actually be reproduced.

Run: python -m text2pos_tpu.train.transformer --dataset SYNTHETIC
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from text2pos_tpu.config import TrainConfig
from text2pos_tpu.data.dense import NUM_CLASS_INDICES, NUM_COLOR_INDICES
from text2pos_tpu.data.hints import Vocabulary
from text2pos_tpu.data.loaders import FineLoader
from text2pos_tpu.models.transformer import TransformerMatch
from text2pos_tpu.ops.transforms import prepare_object_points
from text2pos_tpu.train.losses import calc_recall_precision, matching_loss
from text2pos_tpu.train.state import TrainState, make_optimizer


class TransformerTrainer:
    def __init__(self, cfg: TrainConfig, vocab: Vocabulary,
                 with_aux_heads: bool = False):
        self.cfg = cfg
        self.model = TransformerMatch(
            vocab_size=vocab.size, embed_dim=cfg.embed_dim,
            num_layers=cfg.num_layers, sinkhorn_iters=cfg.sinkhorn_iters,
            num_classes=NUM_CLASS_INDICES, num_colors=NUM_COLOR_INDICES,
            use_features=cfg.use_features,
            pointnet_features=cfg.pointnet_features,
            with_aux_heads=with_aux_heads)

    def _prep(self, batch, rng, augment):
        return prepare_object_points(
            batch["points_xyz"], batch["points_rgb"], batch["point_count"],
            self.cfg.pointnet_numpoints, rng, augment=augment,
            no_pc_augment=self.cfg.no_pc_augment)

    def init_state(self, batch, rng, steps_per_epoch: int) -> TrainState:
        pts, cols = self._prep(
            {k: jnp.asarray(v) for k, v in batch.items()
             if isinstance(v, np.ndarray)}, rng, False)
        variables = jax.jit(self.model.init)(
            rng, jnp.asarray(batch["hint_tokens"]),
            jnp.asarray(batch["hint_lengths"]), pts, cols,
            jnp.asarray(batch["centers"]), jnp.asarray(batch["colors"]),
            jnp.asarray(batch["class_idx"]), jnp.asarray(batch["color_idx"]))
        tx = make_optimizer(self.cfg.learning_rate, self.cfg.lr_gamma,
                            steps_per_epoch)
        return TrainState.create(variables["params"],
                                 variables.get("batch_stats", {}), tx)

    @functools.partial(jax.jit, static_argnums=(0,))
    def train_step(self, state: TrainState, batch, rng):
        pts, cols = self._prep(batch, rng, augment=True)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, updates = self.model.apply(
                variables, batch["hint_tokens"], batch["hint_lengths"],
                pts, cols, batch["centers"], batch["colors"],
                batch["class_idx"], batch["color_idx"], train=True,
                mutable=["batch_stats"])
            loss = matching_loss(out["log_P"], batch["all_matches"],
                                 batch["all_matches_count"])
            loss = loss + 5.0 * jnp.mean(
                (out["offsets"] - batch["offsets"]) ** 2)
            if "class_pred" in out:
                loss = loss + 0.1 * jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(
                        out["class_pred"], batch["class_idx"]))
            return loss, (updates.get("batch_stats", {}), out)

        (loss, (new_bs, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads, new_bs or state.batch_stats)
        recall, precision = calc_recall_precision(
            batch["gt_obj_for_hint"], out["matches0"], out["matches1"])
        return state, {"loss": loss, "recall": recall, "precision": precision}


def train(cfg: TrainConfig, cells_train, poses_train, cells_val, poses_val,
          log=print) -> Tuple[TrainState, Dict]:
    from text2pos_tpu.data.hints import build_vocabulary, create_hint_description

    vocab = Vocabulary(build_vocabulary(
        [create_hint_description(p) for p in poses_train]))
    loader = FineLoader(cells_train, poses_train, vocab, cfg.batch_size,
                        cfg.pad_size, cfg.num_mentioned,
                        cfg.pointnet_numpoints, cfg.max_hint_len)
    trainer = TransformerTrainer(cfg, vocab)
    rng = jax.random.PRNGKey(cfg.seed)
    state = trainer.init_state(next(loader.epoch(seed=0)), rng,
                               loader.num_batches(drop_last=True))
    history = []
    for epoch in range(cfg.epochs):
        stats = {}
        for i, batch in enumerate(loader.epoch(seed=epoch)):
            jb = {k: jnp.asarray(v) for k, v in batch.items()
                  if k not in ("num_real", "pose_idx")}
            state, metrics = trainer.train_step(
                state, jb, jax.random.fold_in(rng, epoch * 10_000 + i))
            for k, v in metrics.items():
                stats.setdefault(k, []).append(float(v))
        means = {k: float(np.mean(v)) for k, v in stats.items()}
        history.append(means)
        log(f"epoch {epoch} " + " ".join(f"{k} {v:0.3f}" for k, v in means.items()))
    return state, {"history": history, "vocab": vocab, "trainer": trainer}


if __name__ == "__main__":
    from text2pos_tpu.config import parse_config
    from text2pos_tpu.utils.cli import load_split

    cfg = parse_config(TrainConfig)
    cells_train, poses_train = load_split(cfg, "train")
    cells_val, poses_val = load_split(cfg, "val")
    train(cfg, cells_train, poses_train, cells_val, poses_val)
