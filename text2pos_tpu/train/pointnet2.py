"""PointNet++ pretraining on per-object classification.

Rebuild of /root/reference/training/pointcloud/pointnet2.py:24-158 and its
dataset (/root/reference/dataloading/kitti360pose/objects.py:27-129): every
object of every cell becomes a classification sample (class + color
labels); training uses cross-entropy on the class head only (the color
head exists but is unused, reference pointnet2.py:24-49). The resulting
parameters seed the ObjectEncoder of both stages
(reference object_encoder.py:43-46).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Iterator, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from text2pos_tpu.config import TrainConfig
from text2pos_tpu.data.dense import (
    NUM_CLASS_INDICES,
    NUM_COLOR_INDICES,
    class_index,
    color_index,
    sample_points,
)
from text2pos_tpu.data.structs import Cell
from text2pos_tpu.models.pointnet2 import PointNet2
from text2pos_tpu.ops.transforms import prepare_object_points
from text2pos_tpu.train.state import TrainState, make_optimizer, save_checkpoint


class ObjectsDataset:
    """Every cell-object as one (points, class, color) sample
    (reference objects.py:27-129)."""

    def __init__(self, cells: Sequence[Cell], points_per_object: int,
                 seed: int = 0):
        rng = np.random.default_rng(seed)
        xyz, rgb, counts, classes, colors = [], [], [], [], []
        for cell in cells:
            for obj in cell.objects:
                x, r, n = sample_points(obj, points_per_object, rng)
                xyz.append(x)
                rgb.append(r)
                counts.append(n)
                classes.append(class_index(obj.label))
                colors.append(color_index(obj.get_color_text()))
        self.xyz = np.stack(xyz)
        self.rgb = np.stack(rgb)
        self.counts = np.array(counts, np.int32)
        self.classes = np.array(classes, np.int32)
        self.colors = np.array(colors, np.int32)

    def __len__(self):
        return len(self.xyz)

    def epoch(self, batch_size: int, seed: int, shuffle: bool = True
              ) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            idx = order[i : i + batch_size]
            yield {
                "xyz": self.xyz[idx], "rgb": self.rgb[idx],
                "counts": self.counts[idx], "classes": self.classes[idx],
                "colors": self.colors[idx],
            }


class PointNet2Trainer:
    def __init__(self, cfg: TrainConfig):
        self.cfg = cfg
        self.model = PointNet2(NUM_CLASS_INDICES, NUM_COLOR_INDICES)

    def init_state(self, batch, rng, steps_per_epoch: int) -> TrainState:
        pts, cols = prepare_object_points(
            jnp.asarray(batch["xyz"]), jnp.asarray(batch["rgb"]),
            jnp.asarray(batch["counts"]), self.cfg.pointnet_numpoints, rng,
            augment=False, no_pc_augment=self.cfg.no_pc_augment)
        variables = jax.jit(self.model.init)(rng, pts, cols)
        tx = make_optimizer(self.cfg.learning_rate, self.cfg.lr_gamma,
                            steps_per_epoch)
        return TrainState.create(variables["params"],
                                 variables.get("batch_stats", {}), tx)

    @functools.partial(jax.jit, static_argnums=(0,))
    def train_step(self, state: TrainState, batch, rng):
        pts, cols = prepare_object_points(
            batch["xyz"], batch["rgb"], batch["counts"],
            self.cfg.pointnet_numpoints, rng, augment=True,
            no_pc_augment=self.cfg.no_pc_augment)

        def loss_fn(params):
            out, updates = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                pts, cols, train=True, mutable=["batch_stats"])
            # CE on the class head only (reference pointnet2.py:24-49).
            loss = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                out["class_pred"], batch["classes"]))
            acc = jnp.mean(jnp.argmax(out["class_pred"], -1) == batch["classes"])
            return loss, (updates["batch_stats"], acc)

        (loss, (new_bs, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_bs), loss, acc

    @functools.partial(jax.jit, static_argnums=(0,))
    def eval_step(self, state: TrainState, batch, rng):
        pts, cols = prepare_object_points(
            batch["xyz"], batch["rgb"], batch["counts"],
            self.cfg.pointnet_numpoints, rng, augment=False,
            no_pc_augment=self.cfg.no_pc_augment)
        out = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            pts, cols, train=False)
        return jnp.mean(jnp.argmax(out["class_pred"], -1) == batch["classes"])


def train(cfg: TrainConfig, cells_train: Sequence[Cell],
          cells_val: Sequence[Cell], checkpoint_dir: str = "./checkpoints",
          log=print) -> Tuple[TrainState, Dict]:
    ds_train = ObjectsDataset(cells_train, cfg.pointnet_numpoints, cfg.seed)
    ds_val = ObjectsDataset(cells_val, cfg.pointnet_numpoints, cfg.seed)
    log(f"objects: train {len(ds_train)}, val {len(ds_val)}")

    trainer = PointNet2Trainer(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    first = next(ds_train.epoch(cfg.batch_size, 0))
    steps_per_epoch = max(1, len(ds_train) // cfg.batch_size)
    state = trainer.init_state(first, rng, steps_per_epoch)

    best_acc, best_path = -1.0, None
    history = {"loss": [], "train_acc": [], "val_acc": []}
    for epoch in range(cfg.epochs):
        losses, accs = [], []
        for i, batch in enumerate(ds_train.epoch(cfg.batch_size, epoch)):
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            state, loss, acc = trainer.train_step(
                state, jb, jax.random.fold_in(rng, epoch * 10_000 + i))
            losses.append(float(loss))
            accs.append(float(acc))
        val_accs = [
            float(trainer.eval_step(state, {k: jnp.asarray(v) for k, v in b.items()},
                                    rng))
            for b in ds_val.epoch(cfg.batch_size, 0, shuffle=False)
        ]
        val_acc = float(np.mean(val_accs)) if val_accs else float("nan")
        history["loss"].append(float(np.mean(losses)))
        history["train_acc"].append(float(np.mean(accs)))
        history["val_acc"].append(val_acc)
        log(f"epoch {epoch} loss {np.mean(losses):0.3f} "
            f"train-acc {np.mean(accs):0.2f} val-acc {val_acc:0.2f}")

        if val_acc > best_acc:
            path = os.path.join(checkpoint_dir,
                                f"pointnet_acc{val_acc:0.2f}.msgpack")
            save_checkpoint(path, state, extra={"val_acc": val_acc})
            if best_path and best_path != path and os.path.isfile(best_path):
                os.remove(best_path)
            best_acc, best_path = val_acc, path

    return state, {"history": history, "best_path": best_path}


def load_pretrained_into(variables: Dict, pointnet_path: str,
                         scope: str = "object_encoder") -> Dict:
    """Graft pretrained PointNet2 params/stats into a larger model's
    variables under ``<scope>/pointnet`` (reference object_encoder.py:43-46)."""
    from text2pos_tpu.train.state import load_checkpoint

    payload = load_checkpoint(pointnet_path)
    out = jax.tree.map(lambda x: x, variables)  # shallow copy via rebuild
    out["params"][scope]["pointnet"] = payload["params"]
    if payload.get("batch_stats"):
        out["batch_stats"][scope]["pointnet"] = payload["batch_stats"]
    return out


if __name__ == "__main__":
    from text2pos_tpu.config import parse_config
    from text2pos_tpu.utils.cli import load_split

    cfg = parse_config(TrainConfig)
    cells_train, _ = load_split(cfg, "train")
    cells_val, _ = load_split(cfg, "val")
    state, result = train(cfg, cells_train, cells_val)
    print("best checkpoint:", result["best_path"])
