"""Coarse cell-retrieval training and retrieval evaluation.

TPU-native rebuild of /root/reference/training/coarse.py:
 - train_epoch (coarse.py:31-62): contrastive pairwise/hardest ranking on
   (text, cell) embedding pairs — here a single jitted step including the
   on-device point augmentations.
 - eval_epoch (coarse.py:69-167): encode all queries + all DB cells and
   compute top-k best-cell and close-by accuracies — here the scoring is
   one [Q, E] × [E, C] matmul + top_k on device instead of a per-query host
   loop.
 - __main__ driver (coarse.py:170-353): LR sweep, exponential decay,
   best-checkpoint retention, metric curves.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from text2pos_tpu.config import TrainConfig
from text2pos_tpu.data.dense import (
    NUM_CLASS_INDICES,
    NUM_COLOR_INDICES,
    CellBank,
    flatten_bank_slice,
)
from text2pos_tpu.data.hints import Vocabulary
from text2pos_tpu.data.loaders import CoarseLoader
from text2pos_tpu.models.cell_retrieval import CellRetrievalNetwork
from text2pos_tpu.ops.retrieval import topk_retrieval
from text2pos_tpu.ops.transforms import prepare_object_points
from text2pos_tpu.train.losses import (
    hardest_ranking_loss,
    pairwise_ranking_loss,
    triplet_margin_loss,
)
from text2pos_tpu.train.state import TrainState, make_optimizer, save_checkpoint


def build_model(cfg: TrainConfig, vocab_size: int) -> CellRetrievalNetwork:
    return CellRetrievalNetwork(
        vocab_size=vocab_size,
        embed_dim=cfg.embed_dim,
        num_classes=NUM_CLASS_INDICES,
        num_colors=NUM_COLOR_INDICES,
        use_features=cfg.use_features,
        variation=cfg.variation,
        class_embed=cfg.class_embed,
        color_embed=cfg.color_embed,
        pointnet_features=cfg.pointnet_features,
        remat=cfg.remat,
        dtype=(jnp.bfloat16 if cfg.dtype == "bfloat16" else None),
    )


class CoarseTrainer:
    """Owns the jitted train/encode steps for one model configuration."""

    def __init__(self, cfg: TrainConfig, vocab: Vocabulary):
        self.cfg = cfg
        self.vocab = vocab
        self.model = build_model(cfg, vocab.size)

    # ------------------------------------------------------------------
    # Initialization
    # ------------------------------------------------------------------
    def init_state(self, batch: Dict[str, np.ndarray], rng: jax.Array,
                   steps_per_epoch: int, learning_rate: Optional[float] = None
                   ) -> TrainState:
        cfg = self.cfg
        pts, cols = self._example_points(batch, rng)
        variables = jax.jit(self.model.init, static_argnums=(12, 13))(
            rng,
            jnp.asarray(batch["tokens"]), jnp.asarray(batch["lengths"]),
            pts, cols,
            jnp.asarray(batch["centers"]), jnp.asarray(batch["colors"]),
            jnp.asarray(batch["class_idx"]), jnp.asarray(batch["color_idx"]),
            jnp.asarray(batch["flat_valid"]), jnp.asarray(batch["cell_idx"]),
            jnp.asarray(batch["slot_idx"]),
            cfg.batch_size, cfg.coarse_max_objects,
        )
        variables = dict(variables)
        variables.setdefault("batch_stats", {})
        if cfg.pointnet_path:
            # Seed the object encoder with pretrained PointNet2 weights
            # (reference object_encoder.py:43-46).
            from text2pos_tpu.train.pointnet2 import load_pretrained_into

            variables = load_pretrained_into(variables, cfg.pointnet_path)
        if cfg.continue_path:
            from text2pos_tpu.train.state import restore_variables

            variables = restore_variables(cfg.continue_path)
        freeze = (("object_encoder/pointnet",) if cfg.pointnet_freeze else ())
        tx = make_optimizer(learning_rate or cfg.learning_rate, cfg.lr_gamma,
                            steps_per_epoch, params=variables["params"],
                            freeze_paths=freeze)
        return TrainState.create(variables["params"],
                                 variables.get("batch_stats", {}), tx)

    def _example_points(self, batch, rng):
        return prepare_object_points(
            jnp.asarray(batch["points_xyz"]), jnp.asarray(batch["points_rgb"]),
            jnp.asarray(batch["point_count"]), self.cfg.pointnet_numpoints,
            rng, augment=False, no_pc_augment=self.cfg.no_pc_augment,
        )

    # ------------------------------------------------------------------
    # Jitted steps
    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0,))
    def train_step(self, state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array) -> Tuple[TrainState, jnp.ndarray]:
        cfg = self.cfg

        pts, cols = prepare_object_points(
            batch["points_xyz"], batch["points_rgb"], batch["point_count"],
            cfg.pointnet_numpoints, rng, augment=True,
            no_pc_augment=cfg.no_pc_augment,
        )

        def loss_fn(params):
            (text, cells), updates = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["tokens"], batch["lengths"], pts, cols,
                batch["centers"], batch["colors"], batch["class_idx"],
                batch["color_idx"], batch["flat_valid"], batch["cell_idx"],
                batch["slot_idx"], cfg.batch_size, cfg.coarse_max_objects,
                train=True, mutable=["batch_stats"],
            )
            if cfg.ranking_loss == "pairwise":
                loss = pairwise_ranking_loss(text, cells, cfg.margin)
            elif cfg.ranking_loss == "hardest":
                loss = hardest_ranking_loss(text, cells, cfg.margin)
            elif cfg.ranking_loss == "triplet":
                # One negative cell per anchor (reference coarse.py:46-50).
                # The reference draws it from a batch["negative_cells"] key
                # its dataloader never actually provides; the dense
                # equivalent is the in-batch roll: each text pairs with the
                # next sample's (distinct) cell as its negative.
                loss = triplet_margin_loss(
                    text, cells, jnp.roll(cells, 1, axis=0), cfg.margin)
            else:
                raise ValueError(f"Unsupported ranking loss {cfg.ranking_loss}")
            return loss, updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads, new_bs), loss

    @functools.partial(jax.jit, static_argnums=(0,))
    def encode_text_step(self, state: TrainState, tokens, lengths):
        return self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            tokens, lengths, method=CellRetrievalNetwork.encode_text,
        )

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def encode_cells_step(self, state: TrainState, batch, num_cells: int,
                          rng: jax.Array):
        cfg = self.cfg
        pts, cols = prepare_object_points(
            batch["points_xyz"], batch["points_rgb"], batch["point_count"],
            cfg.pointnet_numpoints, rng, augment=False,
            no_pc_augment=cfg.no_pc_augment,
        )
        return self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            pts, cols, batch["centers"], batch["colors"], batch["class_idx"],
            batch["color_idx"], batch["flat_valid"], batch["cell_idx"],
            batch["slot_idx"], num_cells, cfg.coarse_max_objects,
            train=False, method=CellRetrievalNetwork.encode_objects,
        )

    # ------------------------------------------------------------------
    # Epochs
    # ------------------------------------------------------------------
    def train_epoch(self, state: TrainState, loader: CoarseLoader, epoch: int,
                    rng: jax.Array) -> Tuple[TrainState, float]:
        losses = []
        for i, batch in enumerate(loader.epoch(seed=self.cfg.seed * 10_000 + epoch)):
            if self.cfg.max_batches is not None and i >= self.cfg.max_batches:
                break
            step_rng = jax.random.fold_in(rng, i)
            jb = {k: jnp.asarray(v) for k, v in batch.items()
                  if k not in ("num_real", "pose_idx")}
            state, loss = self.train_step(state, jb, step_rng)
            losses.append(float(loss))
        return state, float(np.mean(losses)) if losses else float("nan")

    def encode_all_queries(self, state: TrainState, loader: CoarseLoader
                           ) -> np.ndarray:
        tokens, lengths = loader.all_query_tokens()
        B = self.cfg.batch_size
        out = []
        for i in range(0, len(tokens), B):
            tk, ln = tokens[i : i + B], lengths[i : i + B]
            real = len(tk)
            if real < B:  # pad to the static batch shape
                tk = np.concatenate([tk, np.zeros((B - real, tk.shape[1]), tk.dtype)])
                ln = np.concatenate([ln, np.ones(B - real, ln.dtype)])
            enc = self.encode_text_step(state, jnp.asarray(tk), jnp.asarray(ln))
            out.append(np.asarray(enc)[:real])
        return np.concatenate(out)

    def encode_all_cells(self, state: TrainState, bank: CellBank,
                         rng: jax.Array) -> np.ndarray:
        B = self.cfg.batch_size
        flat_cap = B * self.cfg.coarse_max_objects
        out = []
        for i in range(0, bank.num_cells, B):
            idx = np.arange(i, min(i + B, bank.num_cells))
            real = len(idx)
            if real < B:
                idx = np.concatenate([idx, np.zeros(B - real, np.int64)])
            flat = flatten_bank_slice(bank, idx, flat_cap)
            jb = {k: jnp.asarray(v) for k, v in flat.items()}
            enc = self.encode_cells_step(state, jb, B, jax.random.fold_in(rng, i))
            out.append(np.asarray(enc)[:real])
        return np.concatenate(out)

    def eval_epoch(self, state: TrainState, loader: CoarseLoader,
                   top_k: Tuple[int, ...], return_encodings: bool = False):
        """Full retrieval evaluation (reference coarse.py:69-167)."""
        rng = jax.random.PRNGKey(self.cfg.seed)
        text_enc = self.encode_all_queries(state, loader)
        cell_enc = self.encode_all_cells(state, loader.bank, rng)

        max_k = min(max(top_k), loader.bank.num_cells)
        _, top_idx = topk_retrieval(jnp.asarray(text_enc), jnp.asarray(cell_enc),
                                    max_k)
        top_idx = np.asarray(top_idx)  # [Q, max_k]

        target_idx = loader.pose_cell_idx                     # [Q]
        accuracies = {}
        accuracies_close = {}
        cell_centers = 0.5 * (loader.bank.bbox_w[:, 0:2] + loader.bank.bbox_w[:, 3:5])
        cell_size = float(loader.bank.cell_size[0])
        pose_w = np.array([p.pose_w[0:2] for p in loader.poses])

        retrieved_centers = cell_centers[top_idx]             # [Q, K, 2]
        dists = np.linalg.norm(retrieved_centers - pose_w[:, None, :], axis=2)
        hit = top_idx == target_idx[:, None]
        for k in top_k:
            kk = min(k, max_k)
            accuracies[k] = float(np.mean(np.any(hit[:, :kk], axis=1)))
            accuracies_close[k] = float(
                np.mean(np.any(dists[:, :kk] <= cell_size / 2, axis=1)))

        retrievals = {qi: [loader.bank.cell_ids[ci] for ci in top_idx[qi]]
                      for qi in range(len(top_idx))}
        if return_encodings:
            return accuracies, accuracies_close, retrievals, cell_enc, text_enc
        return accuracies, accuracies_close, retrievals


def train(cfg: TrainConfig, cells_train, poses_train, cells_val, poses_val,
          checkpoint_dir: str = "./checkpoints",
          log=print) -> Tuple[TrainState, Dict]:
    """Full training driver (reference coarse.py:170-353)."""
    from text2pos_tpu.data.hints import build_vocabulary, create_hint_description

    vocab = Vocabulary(build_vocabulary(
        [create_hint_description(p) for p in poses_train]))

    def make_loader(cells, poses, train_mode):
        return CoarseLoader(
            cells, poses, vocab, cfg.batch_size, cfg.coarse_max_objects,
            cfg.pointnet_numpoints, cfg.max_text_len,
            shuffle_hints=train_mode and not cfg.no_cell_augment,
            flip_poses=train_mode and not cfg.no_cell_augment,
            flat_cap=cfg.flat_cap, seed=cfg.seed,
        )

    loader_train = make_loader(cells_train, poses_train, True)
    loader_val = make_loader(cells_val, poses_val, False)

    if cfg.fused:
        # Device-resident training epochs (train/fused_coarse.py); host
        # loaders are still used for initialization and evaluation.
        from text2pos_tpu.train.fused_coarse import FusedCoarseTrainer

        assert cfg.data_parallel <= 1, "--fused and --data_parallel exclude"
        trainer = FusedCoarseTrainer(cfg, vocab, cells_train, poses_train,
                                     seed=cfg.seed)
    else:
        trainer = CoarseTrainer(cfg, vocab)
    rng = jax.random.PRNGKey(cfg.seed)
    first_batch = next(loader_train.epoch(seed=cfg.seed))
    steps_per_epoch = loader_train.num_batches(drop_last=True)
    # --lr_idx selects from the reference's sweep grid (coarse.py:246-251).
    lr = (float(np.logspace(-2.5, -3.5, 3)[cfg.lr_idx])
          if cfg.lr_idx is not None else cfg.learning_rate)
    state = trainer.init_state(first_batch, rng, steps_per_epoch,
                               learning_rate=lr)

    dp_step = None
    if cfg.data_parallel > 1:
        # Batch-sharded training over a 1-D 'dp' mesh (SURVEY.md §2.3);
        # cfg.batch_size is the per-device batch. pmean'd grads/BN stats;
        # --global_negatives all-gathers both towers for the ranking loss.
        from text2pos_tpu.parallel.dp import dp_coarse_train_step, make_mesh

        mesh = make_mesh(cfg.data_parallel)
        dp_step = dp_coarse_train_step(trainer, mesh,
                                       global_negatives=cfg.global_negatives)

    from text2pos_tpu.utils.profiling import MetricsLogger, enable_nan_tripwire

    if os.environ.get("T2P_DEBUG_NANS"):
        # TPU-native stand-in for torch.autograd.set_detect_anomaly(True)
        # (reference training/coarse.py:244, fine.py:268).
        enable_nan_tripwire()
    metrics_log = MetricsLogger(os.environ.get("T2P_METRICS_JSONL"))
    history = {"train_loss": [], "train_acc": [], "val_acc": [], "val_acc_close": []}
    best_acc, best_path = -1.0, None

    # Outage-resilient resume: a rolling full-state checkpoint lets a run
    # killed mid-flight (e.g. TPU relay drop) continue from the last eval
    # point with the exact optimizer trajectory.
    start_epoch = 0
    if cfg.resume_path and os.path.isfile(cfg.resume_path):
        from text2pos_tpu.train.state import load_resume_checkpoint

        state, start_epoch, best_acc, best_path = load_resume_checkpoint(
            cfg.resume_path, state)
        log(f"resumed from {cfg.resume_path}: epoch {start_epoch} done, "
            f"best val-acc {best_acc:0.3f}")

    for epoch in range(start_epoch + 1, cfg.epochs + 1):
        t0 = time.time()
        if cfg.fused:
            state, loss = trainer.fused_train_epoch(state, epoch, rng)
        elif dp_step is not None:
            from text2pos_tpu.parallel.dp import dp_train_epoch

            state, loss = dp_train_epoch(dp_step, trainer, state, loader_train,
                                         epoch, rng, cfg.data_parallel)
        else:
            state, loss = trainer.train_epoch(state, loader_train, epoch, rng)
        history["train_loss"].append(loss)
        if cfg.resume_path:
            # Rolling resume state EVERY epoch (host-side, ~28 MB): a
            # crash-looping relay must never cost more than one epoch
            # (round-4 lesson — eval-point-only saves lost whole runs).
            from text2pos_tpu.train.state import save_resume_checkpoint

            save_resume_checkpoint(cfg.resume_path, state, epoch,
                                   best_acc, best_path)
        if epoch % cfg.eval_every and epoch != cfg.epochs:
            log(f"epoch {epoch} loss {loss:0.3f} ({time.time()-t0:0.1f}s)")
            continue
        train_acc, _, _ = trainer.eval_epoch(state, loader_train, cfg.top_k)
        val_acc, val_acc_close, _ = trainer.eval_epoch(state, loader_val, cfg.top_k)

        history["train_acc"].append(train_acc)
        history["val_acc"].append(val_acc)
        history["val_acc_close"].append(val_acc_close)
        log(f"epoch {epoch} loss {loss:0.3f} "
            f"train-acc {train_acc} val-acc {val_acc} "
            f"val-close {val_acc_close} ({time.time()-t0:0.1f}s)")
        metrics_log.log({"stage": "coarse", "epoch": epoch, "loss": loss,
                         "train_acc": {str(k): v for k, v in train_acc.items()},
                         "val_acc": {str(k): v for k, v in val_acc.items()},
                         "elapsed_s": time.time() - t0})

        if epoch >= cfg.epochs // 2:
            acc = val_acc[max(cfg.top_k)]
            if acc > best_acc:
                path = os.path.join(
                    checkpoint_dir, f"coarse_acc{acc:0.2f}_e{cfg.embed_dim}.msgpack")
                save_checkpoint(path, state, extra={
                    "val_acc": acc, "known_words": vocab.known_words,
                    "embed_dim": cfg.embed_dim, "variation": cfg.variation,
                    "use_features": list(cfg.use_features)})
                if best_path and best_path != path and os.path.isfile(best_path):
                    os.remove(best_path)
                best_acc, best_path = acc, path

        if cfg.resume_path:
            from text2pos_tpu.train.state import save_resume_checkpoint

            save_resume_checkpoint(cfg.resume_path, state, epoch,
                                   best_acc, best_path)

    return state, {"history": history, "vocab": vocab, "best_path": best_path,
                   "trainer": trainer}


if __name__ == "__main__":
    from text2pos_tpu.config import parse_config
    from text2pos_tpu.utils.cli import load_split

    cfg = parse_config(TrainConfig)
    cells_train, poses_train = load_split(cfg, "train")
    cells_val, poses_val = load_split(cfg, "val")
    state, result = train(cfg, cells_train, poses_train, cells_val, poses_val)

    from text2pos_tpu.train.plots import plot_metrics

    hist = result["history"]
    metrics = {"train-loss": {"run": hist["train_loss"]}}
    for k in cfg.top_k:
        metrics[f"train-acc-{k}"] = {"run": [a[k] for a in hist["train_acc"]]}
        metrics[f"val-acc-{k}"] = {"run": [a[k] for a in hist["val_acc"]]}
        metrics[f"val-close-{k}"] = {"run": [a[k] for a in hist["val_acc_close"]]}
    plot_metrics(metrics, f"./plots/coarse_e{cfg.embed_dim}.png")
    print("best checkpoint:", result["best_path"])
