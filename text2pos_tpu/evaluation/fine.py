"""Fine matching module evaluated in isolation on ground-truth cells.

Rebuild of /root/reference/evaluation/fine.py:25-160 (minus its stray
debug ``quit()`` at fine.py:56): recall/precision plus six pose-error
variants — {mid, mean, offsets} with predicted matches and
{matching_oracle, offset_oracle, both_oracle} — each also reported as
per-threshold accuracies in meters (error · cell_size ≤ t).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from text2pos_tpu.data.loaders import FineLoader
from text2pos_tpu.train.fine import FineTrainer
from text2pos_tpu.train.losses import calc_recall_precision
from text2pos_tpu.train.state import TrainState


def _gt_matches0(gt_obj_for_hint: np.ndarray, num_objects: int) -> np.ndarray:
    """[B, H] gt object per hint → [B, O] gt hint per object (−1 default),
    mirroring reference fine.py:85-88."""
    B, H = gt_obj_for_hint.shape
    gt_matches = np.full((B, num_objects), -1, np.int64)
    for b in range(B):
        for h in range(H):
            o = gt_obj_for_hint[b, h]
            if o >= 0:
                gt_matches[b, o] = h
    return gt_matches


def run_fine(trainer: FineTrainer, state: TrainState, loader: FineLoader,
             threshs: Tuple[float, ...] = (5, 10, 15), cell_size: float = 30.0,
             log=print) -> Dict:
    rng = jax.random.PRNGKey(0)
    stats = {k: [] for k in ("recall", "precision", "mid", "mean", "offsets",
                             "matching_oracle", "offset_oracle", "both_oracle")}
    stats_thresh = {k: {t: [] for t in threshs}
                    for k in ("mid", "mean", "offsets", "matching_oracle",
                              "offset_oracle", "both_oracle")}

    for i, batch in enumerate(loader.epoch(seed=0, shuffle=False,
                                           drop_last=False)):
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in ("num_real", "pose_idx")}
        metrics, out = trainer.eval_step(state, jb, jax.random.fold_in(rng, i))

        real = int(batch["num_real"])
        matches0 = np.asarray(out["matches0"])[:real]
        matches1 = np.asarray(out["matches1"])[:real]
        offsets = np.asarray(out["offsets"])[:real]
        gt_hint = batch["gt_obj_for_hint"][:real]
        centers = batch["centers"][:real, :, 0:2]
        poses = batch["pose_in_cell"][:real, 0:2]
        oracle_off = batch["offsets_best_center"][:real]
        gt_m0 = _gt_matches0(gt_hint, matches0.shape[1])

        r, p = calc_recall_precision(jnp.asarray(gt_hint),
                                     jnp.asarray(matches0),
                                     jnp.asarray(matches1))
        stats["recall"].append(float(r))
        stats["precision"].append(float(p))

        variants = {
            "mid": (matches0, offsets, True),
            "mean": (matches0, np.zeros_like(offsets), False),
            "offsets": (matches0, offsets, False),
            "matching_oracle": (gt_m0, offsets, False),
            "offset_oracle": (matches0, oracle_off, False),
            "both_oracle": (gt_m0, oracle_off, False),
        }
        from text2pos_tpu.models.matcher import get_pos_in_cell

        for name, (m0, off, mid) in variants.items():
            if mid:
                preds = np.full((real, 2), 0.5, np.float32)
            else:
                preds = np.asarray(get_pos_in_cell(
                    jnp.asarray(centers), jnp.asarray(m0), jnp.asarray(off)))
            errors = np.linalg.norm(poses - preds, axis=1)
            stats[name].append(float(np.mean(errors)))
            for t in threshs:
                stats_thresh[name][t].extend(
                    (errors * cell_size <= t).tolist())

    out_stats = {k: float(np.mean(v)) for k, v in stats.items()}
    out_thresh = {k: {t: float(np.mean(v)) for t, v in d.items()}
                  for k, d in stats_thresh.items()}

    log("Fine-in-isolation:")
    for k, v in out_stats.items():
        log(f"  {k}: {v:0.3f}")
    for k, d in out_thresh.items():
        log("  " + k + ": " + " ".join(f"{t}m={v:0.2f}" for t, v in d.items()))
    return {"stats": out_stats, "thresh": out_thresh}


def main():
    """CLI entry: python -m text2pos_tpu.evaluation.fine
    (reference evaluation/fine.py:164+)."""
    from text2pos_tpu.config import EvalConfig, TrainConfig, parse_config
    from text2pos_tpu.data.hints import Vocabulary
    from text2pos_tpu.train.state import TrainState, load_checkpoint, make_optimizer
    from text2pos_tpu.utils.cli import load_split

    cfg = parse_config(EvalConfig)
    split = "test" if cfg.use_test_set else "val"
    cells, poses = load_split(cfg, split)

    payload = load_checkpoint(cfg.path_fine)
    vocab = Vocabulary(payload["extra"]["known_words"])
    tcfg = TrainConfig(
        batch_size=cfg.batch_size,
        embed_dim=payload["extra"].get("embed_dim", 128),
        num_layers=payload["extra"].get("num_layers", 6),
        sinkhorn_iters=payload["extra"].get("sinkhorn_iters", 50),
        pointnet_numpoints=cfg.pointnet_numpoints,
        num_mentioned=cfg.num_mentioned, pad_size=cfg.pad_size,
        no_pc_augment=cfg.no_pc_augment,
        regressor_cell=cfg.regressor_cell, regressor_learn=cfg.regressor_learn)
    trainer = FineTrainer(tcfg, vocab)
    state = TrainState.create(payload["params"], payload["batch_stats"],
                              make_optimizer(1e-3))
    loader = FineLoader(cells, poses, vocab, cfg.batch_size, cfg.pad_size,
                        cfg.num_mentioned, cfg.pointnet_numpoints,
                        tcfg.max_hint_len,
                        regressor_cell=cfg.regressor_cell,
                        regressor_learn=cfg.regressor_learn)
    cell_size = cells[0].cell_size if cells else 30.0
    run_fine(trainer, state, loader, threshs=cfg.threshs, cell_size=cell_size)


if __name__ == "__main__":
    main()
