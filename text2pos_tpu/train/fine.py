"""Fine matching-stage training.

TPU-native rebuild of /root/reference/training/fine.py:
 - loss = matching NLL + 5 · MSE(offsets) (fine.py:56-63)
 - per-batch recall/precision and three pose-error variants
   (fine.py:77-112), computed on device
 - warm-up: lr 1e-5 for the first 3 epochs, then the target lr
   (fine.py:317-323)
 - best checkpoint by mean(recall, precision) after half the epochs
   (fine.py:358-378)
"""

from __future__ import annotations

import functools
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from text2pos_tpu.config import TrainConfig
from text2pos_tpu.data.dense import NUM_CLASS_INDICES, NUM_COLOR_INDICES
from text2pos_tpu.data.hints import Vocabulary
from text2pos_tpu.data.loaders import FineLoader
from text2pos_tpu.models.matcher import SuperGlueMatch
from text2pos_tpu.ops.transforms import prepare_object_points
from text2pos_tpu.train.losses import (
    calc_pose_error,
    calc_recall_precision,
    matching_loss,
)
from text2pos_tpu.train.state import TrainState, save_checkpoint

WARMUP_LR = 1e-5
WARMUP_EPOCHS = 3
OFFSET_LOSS_WEIGHT = 5.0  # reference fine.py:61-63


def build_model(cfg: TrainConfig, vocab_size: int) -> SuperGlueMatch:
    return SuperGlueMatch(
        vocab_size=vocab_size,
        embed_dim=cfg.embed_dim,
        num_layers=cfg.num_layers,
        sinkhorn_iters=cfg.sinkhorn_iters,
        num_classes=NUM_CLASS_INDICES,
        num_colors=NUM_COLOR_INDICES,
        use_features=cfg.use_features,
        class_embed=cfg.class_embed,
        color_embed=cfg.color_embed,
        pointnet_features=cfg.pointnet_features,
        remat=cfg.remat,
        dtype=(jnp.bfloat16 if cfg.dtype == "bfloat16" else None),
    )


class FineTrainer:
    def __init__(self, cfg: TrainConfig, vocab: Vocabulary):
        self.cfg = cfg
        self.vocab = vocab
        self.model = build_model(cfg, vocab.size)

    def _prep(self, batch, rng, augment):
        """On-device point pipeline over the [B, O, P, 3] padded objects."""
        return prepare_object_points(
            batch["points_xyz"], batch["points_rgb"], batch["point_count"],
            self.cfg.pointnet_numpoints, rng, augment=augment,
            no_pc_augment=self.cfg.no_pc_augment,
        )

    def init_state(self, batch: Dict[str, np.ndarray], rng: jax.Array,
                   steps_per_epoch: int, learning_rate: Optional[float] = None
                   ) -> TrainState:
        pts, cols = self._prep({k: jnp.asarray(v) for k, v in batch.items()
                                if isinstance(v, np.ndarray)}, rng, False)
        variables = jax.jit(self.model.init)(
            rng, jnp.asarray(batch["hint_tokens"]),
            jnp.asarray(batch["hint_lengths"]), pts, cols,
            jnp.asarray(batch["centers"]), jnp.asarray(batch["colors"]),
            jnp.asarray(batch["class_idx"]), jnp.asarray(batch["color_idx"]),
        )
        variables = dict(variables)
        variables.setdefault("batch_stats", {})
        if self.cfg.pointnet_path:
            from text2pos_tpu.train.pointnet2 import load_pretrained_into

            variables = load_pretrained_into(variables, self.cfg.pointnet_path)
        if self.cfg.continue_path:
            from text2pos_tpu.train.state import restore_variables

            variables = restore_variables(self.cfg.continue_path)

        lr = learning_rate or self.cfg.learning_rate
        # Warm-up at 1e-5 for the first epochs, then the target LR; both
        # phases decay exponentially per epoch (reference fine.py:317-323).
        boundary = WARMUP_EPOCHS * steps_per_epoch

        def lr_schedule(step):
            decayed_epoch = step // max(steps_per_epoch, 1)
            base = jnp.where(step < boundary, WARMUP_LR, lr)
            return base * (self.cfg.lr_gamma ** decayed_epoch)

        tx = optax.adam(lr_schedule)
        if self.cfg.pointnet_freeze:
            def label_fn(path, _):
                joined = "/".join(
                    str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
                return ("freeze" if "object_encoder/pointnet" in joined
                        else "train")

            labels = jax.tree_util.tree_map_with_path(
                label_fn, variables["params"])
            tx = optax.multi_transform(
                {"train": tx, "freeze": optax.set_to_zero()}, labels)
        return TrainState.create(variables["params"],
                                 variables.get("batch_stats", {}), tx)

    def _loss_fn(self, params, batch_stats, batch, pts, cols):
        """Shared fine-training objective (plain + fused trainers):
        matching NLL + 5·MSE(offsets) (reference fine.py:56-63), plus —
        with cfg.rank_weight > 0 — the listwise rank-aware term over
        in-batch negative cells (losses.listwise_rank_loss): serving
        re-ranks candidates by match confidence, so the confidence is
        trained to ORDER cells, not just to match within the true one."""
        cfg = self.cfg
        R = cfg.rank_negatives if cfg.rank_weight > 0 else 0
        variables = {"params": params, "batch_stats": batch_stats}
        if R > 0:
            out, updates = self.model.apply(
                variables, batch["hint_tokens"], batch["hint_lengths"],
                pts, cols, batch["centers"], batch["colors"],
                batch["class_idx"], batch["color_idx"], R, True,
                mutable=["batch_stats"],
                method=type(self.model).forward_rank,
            )
        else:
            out, updates = self.model.apply(
                variables, batch["hint_tokens"], batch["hint_lengths"],
                pts, cols, batch["centers"], batch["colors"],
                batch["class_idx"], batch["color_idx"], train=True,
                mutable=["batch_stats"],
            )
        loss_match = matching_loss(out["log_P"], batch["all_matches"],
                                   batch["all_matches_count"])
        loss_off = jnp.mean((out["offsets"] - batch["offsets"]) ** 2)
        loss = loss_match + OFFSET_LOSS_WEIGHT * loss_off
        if R > 0:
            from text2pos_tpu.train.losses import (listwise_rank_loss,
                                                   soft_rank_score)

            ctr = batch["centers"][..., 0:2]
            pos_s = soft_rank_score(out["P"], ctr, out["offsets"],
                                    cfg.rank_gamma)
            neg_ctr = jnp.stack([jnp.roll(ctr, r, axis=0)
                                 for r in range(1, R + 1)])    # [R, B, M, 2]
            neg_s = soft_rank_score(out["neg_P"], neg_ctr,
                                    out["offsets"][None], cfg.rank_gamma)
            # A rolled negative can land on the query's OWN cell (several
            # poses share a cell); exclude those from the softmax.
            same_cell = jnp.all(neg_ctr == ctr[None], axis=(-2, -1))
            neg_s = jnp.where(same_cell, -jnp.inf, neg_s)
            loss = loss + cfg.rank_weight * listwise_rank_loss(
                pos_s, neg_s, cfg.rank_tau)
        return loss, (updates["batch_stats"], out, loss_match, loss_off)

    @functools.partial(jax.jit, static_argnums=(0,))
    def train_step(self, state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array):
        pts, cols = self._prep(batch, rng, augment=True)

        def loss_fn(params):
            return self._loss_fn(params, state.batch_stats, batch, pts, cols)

        (loss, (new_bs, out, lm, lo)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads, new_bs)

        metrics = self._batch_metrics(out, batch)
        metrics.update(loss=loss, loss_matching=lm, loss_offsets=lo)
        return state, metrics

    @functools.partial(jax.jit, static_argnums=(0,))
    def eval_step(self, state: TrainState, batch: Dict[str, jnp.ndarray],
                  rng: jax.Array):
        pts, cols = self._prep(batch, rng, augment=False)
        out = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["hint_tokens"], batch["hint_lengths"], pts, cols,
            batch["centers"], batch["colors"], batch["class_idx"],
            batch["color_idx"], train=False,
        )
        return self._batch_metrics(out, batch), out

    def _batch_metrics(self, out, batch):
        # "sample_mask" (when present) excludes the repeated padding tail of
        # a partial eval batch from the metric means.
        mask = batch.get("sample_mask")
        recall, precision = calc_recall_precision(
            batch["gt_obj_for_hint"], out["matches0"], out["matches1"],
            sample_mask=mask)
        centers_xy = batch["centers"][..., 0:2]
        poses_xy = batch["pose_in_cell"][..., 0:2]
        return dict(
            recall=recall,
            precision=precision,
            pose_mid=calc_pose_error(centers_xy, out["matches0"], poses_xy,
                                     use_mid_pred=True, sample_mask=mask),
            pose_mean=calc_pose_error(centers_xy, out["matches0"], poses_xy,
                                      offsets=None, sample_mask=mask),
            pose_offsets=calc_pose_error(centers_xy, out["matches0"], poses_xy,
                                         offsets=out["offsets"],
                                         sample_mask=mask),
        )

    def run_epoch(self, state: TrainState, loader: FineLoader, epoch: int,
                  rng: jax.Array, train: bool):
        stats = {}
        # Eval keeps the padded tail batch (small val sets would otherwise
        # produce zero batches); training drops it for static batch shapes.
        for i, batch in enumerate(loader.epoch(
                seed=self.cfg.seed * 10_000 + epoch, shuffle=train,
                drop_last=train)):
            if train and self.cfg.max_batches is not None and i >= self.cfg.max_batches:
                break
            jb = {k: jnp.asarray(v) for k, v in batch.items()
                  if k not in ("num_real", "pose_idx")}
            step_rng = jax.random.fold_in(rng, epoch * 100_000 + i)
            if train:
                state, metrics = self.train_step(state, jb, step_rng)
            else:
                B = batch["gt_obj_for_hint"].shape[0]
                jb["sample_mask"] = jnp.arange(B) < int(batch["num_real"])
                metrics, _ = self.eval_step(state, jb, step_rng)
            for k, v in metrics.items():
                stats.setdefault(k, []).append(float(v))
        return state, {k: float(np.mean(v)) for k, v in stats.items()}


def train(cfg: TrainConfig, cells_train, poses_train, cells_val, poses_val,
          checkpoint_dir: str = "./checkpoints", log=print):
    """Full fine-stage training driver (reference fine.py:211-401)."""
    from text2pos_tpu.data.hints import build_vocabulary, create_hint_description

    vocab = Vocabulary(build_vocabulary(
        [create_hint_description(p) for p in poses_train]))

    def make_loader(cells, poses):
        return FineLoader(
            cells, poses, vocab, cfg.batch_size, cfg.pad_size,
            cfg.num_mentioned, cfg.pointnet_numpoints, cfg.max_hint_len,
            regressor_cell=cfg.regressor_cell,
            regressor_learn=cfg.regressor_learn, seed=cfg.seed,
        )

    loader_train = make_loader(cells_train, poses_train)
    loader_val = make_loader(cells_val, poses_val)

    if cfg.fused:
        from text2pos_tpu.train.fused_fine import FusedFineTrainer

        assert cfg.data_parallel <= 1, "--fused and --data_parallel exclude"
        trainer = FusedFineTrainer(cfg, vocab, cells_train, poses_train,
                                   seed=cfg.seed)
    else:
        trainer = FineTrainer(cfg, vocab)
    rng = jax.random.PRNGKey(cfg.seed)
    first_batch = next(loader_train.epoch(seed=cfg.seed))
    steps_per_epoch = loader_train.num_batches(drop_last=True)
    # --lr_idx selects from the reference's sweep grid (fine.py:276-283).
    lr = (float(np.logspace(-3.0, -4.0, 3)[cfg.lr_idx])
          if cfg.lr_idx is not None else cfg.learning_rate)
    state = trainer.init_state(first_batch, rng, steps_per_epoch,
                               learning_rate=lr)

    dp_step = None
    if cfg.data_parallel > 1:
        # Batch-sharded DP over a 1-D mesh (SURVEY.md §2.3); per-device
        # batch = cfg.batch_size, grads/BN stats pmean'd over ICI.
        from text2pos_tpu.parallel.dp import dp_fine_train_step, make_mesh

        mesh = make_mesh(cfg.data_parallel)
        dp_step = dp_fine_train_step(trainer, mesh)

    from text2pos_tpu.utils.profiling import MetricsLogger, enable_nan_tripwire

    if os.environ.get("T2P_DEBUG_NANS"):
        # TPU-native stand-in for torch.autograd.set_detect_anomaly(True)
        # (reference training/coarse.py:244, fine.py:268).
        enable_nan_tripwire()
    metrics_log = MetricsLogger(os.environ.get("T2P_METRICS_JSONL"))
    history = {"train": [], "val": []}
    best_acc, best_path = -1.0, None

    # Outage-resilient resume (same mechanism as the coarse driver):
    # rolling full-state checkpoint incl. optimizer moments + epoch.
    start_epoch = -1
    if cfg.resume_path and os.path.isfile(cfg.resume_path):
        from text2pos_tpu.train.state import load_resume_checkpoint

        state, start_epoch, best_acc, best_path = load_resume_checkpoint(
            cfg.resume_path, state)
        log(f"resumed from {cfg.resume_path}: epoch {start_epoch} done, "
            f"best val-acc {best_acc:0.3f}")

    for epoch in range(start_epoch + 1, cfg.epochs):
        t0 = time.time()
        if cfg.fused:
            state, fused_loss = trainer.fused_train_epoch(state, epoch, rng)
            train_stats = {"loss": fused_loss}
        elif dp_step is not None:
            from text2pos_tpu.parallel.dp import dp_train_epoch

            state, dp_loss = dp_train_epoch(dp_step, trainer, state,
                                            loader_train, epoch, rng,
                                            cfg.data_parallel)
            train_stats = {"loss": dp_loss}
        else:
            state, train_stats = trainer.run_epoch(state, loader_train, epoch,
                                                   rng, train=True)
        _, val_stats = trainer.run_epoch(state, loader_val, epoch, rng,
                                         train=False)
        history["train"].append(train_stats)
        history["val"].append(val_stats)
        metrics_log.log({"stage": "fine", "epoch": epoch,
                         "train": train_stats, "val": val_stats,
                         "elapsed_s": time.time() - t0})
        t_recall = train_stats.get("recall", float("nan"))
        t_prec = train_stats.get("precision", float("nan"))
        log(f"epoch {epoch} loss {train_stats.get('loss', float('nan')):0.3f} "
            f"t-recall {t_recall:0.2f} t-prec {t_prec:0.2f} "
            f"v-recall {val_stats['recall']:0.2f} v-prec {val_stats['precision']:0.2f} "
            f"v-offset {val_stats['pose_offsets']:0.3f} ({time.time()-t0:0.1f}s)")

        if epoch >= cfg.epochs // 2:
            acc = float(np.mean((val_stats["recall"], val_stats["precision"])))
            if acc > best_acc:
                path = os.path.join(
                    checkpoint_dir,
                    f"fine_acc{acc:0.2f}_obj-{cfg.num_mentioned}-{cfg.pad_size}.msgpack")
                save_checkpoint(path, state, extra={
                    "val_acc": acc, "known_words": vocab.known_words,
                    "embed_dim": cfg.embed_dim, "num_layers": cfg.num_layers,
                    "sinkhorn_iters": cfg.sinkhorn_iters,
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
    keys = hist["train"][0].keys() if hist["train"] else []
    metrics = {}
    for k in keys:
        metrics[f"train-{k}"] = {"run": [h[k] for h in hist["train"]]}
    for k in (hist["val"][0].keys() if hist["val"] else []):
        metrics[f"val-{k}"] = {"run": [h[k] for h in hist["val"]]}
    plot_metrics(metrics, f"./plots/fine_e{cfg.embed_dim}.png")
    print("best checkpoint:", result["best_path"])


def eval_conf(trainer: FineTrainer, state: TrainState, loader: FineLoader,
              num_trials: int = 100, num_cells: int = 5, seed: int = 0,
              log=print) -> float:
    """Retrieval-by-confidence probe (reference fine.py:174-208): for each
    trial, match a pose's hints against its own cell and ``num_cells - 1``
    random other cells; score how often the true cell has the most matched
    hints. All trials run as one batched jitted evaluation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from text2pos_tpu.data.loaders import FineSample

    rng = np.random.default_rng(seed)
    n = len(loader)
    samples = []
    gt_rows = []
    for _ in range(num_trials):
        i = int(rng.integers(n))
        own = loader.make_sample(i, rng)
        row = [own]
        for _ in range(num_cells - 1):
            j = int(rng.integers(n))
            other = loader.make_sample(j, rng)
            # Pose i's hints vs pose j's cell objects.
            row.append(FineSample(
                objects=other.objects, hint_tokens=own.hint_tokens,
                hint_lengths=own.hint_lengths,
                gt_obj_for_hint=own.gt_obj_for_hint,
                all_matches=own.all_matches,
                all_matches_count=own.all_matches_count,
                offsets=own.offsets,
                offsets_best_center=own.offsets_best_center,
                pose_in_cell=own.pose_in_cell, pose_w=own.pose_w))
        samples.extend(row)
        gt_rows.append(0)

    confs = []
    B = trainer.cfg.batch_size
    key = jax.random.PRNGKey(seed)
    total = len(samples)
    for i in range(0, total, B):
        chunk = samples[i : i + B]
        real = len(chunk)
        while len(chunk) < B:
            chunk.append(chunk[-1])
        batch = loader._collate(chunk, real, np.zeros(B, np.int32))
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in ("num_real", "pose_idx")}
        _, out = trainer.eval_step(state, jb, jax.random.fold_in(key, i))
        confs.append(np.asarray(jnp.sum(out["matches0"] >= 0, axis=1))[:real])
    confs = np.concatenate(confs).reshape(num_trials, num_cells)

    acc = float(np.mean(np.argmax(confs, axis=1) == 0))
    acc_rev = float(np.mean(
        np.argmax(confs[:, ::-1], axis=1) == num_cells - 1))
    log(f"Conf score: {0.5 * (acc + acc_rev):0.3f} ({acc:0.3f})")
    return 0.5 * (acc + acc_rev)
