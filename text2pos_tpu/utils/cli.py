"""Shared CLI data loading for the training/evaluation entry points.

``--dataset K360`` loads prepared pickles from ``--base_path`` (reference
or native format, via data.legacy) using the standard scene splits;
``--dataset SYNTHETIC`` generates an on-the-fly synthetic dataset so every
entry point runs in environments without KITTI360 data.
"""

from __future__ import annotations


from text2pos_tpu.constants import (
    SCENE_NAMES_TEST,
    SCENE_NAMES_TRAIN,
    SCENE_NAMES_VAL,
)


def load_split(cfg, split: str):
    """Return (cells, poses) for 'train' | 'val' | 'test'."""
    dataset = cfg.dataset.upper()
    if dataset == "SYNTHETIC-FINE":
        # Per-sample synthetic fine cells mirroring the reference's
        # Kitti360FineSyntheticDataset (synthetic.py:50-202), honoring
        # --num_distractors (reference training/args.py:13,82).
        from text2pos_tpu.data.synthetic import make_synthetic_fine_dataset

        seed = {"train": 0, "val": 1, "test": 2}[split]
        describe_by = getattr(cfg, "describe_by", "closest")
        return make_synthetic_fine_dataset(
            seed=seed, length=256 if split == "train" else 64,
            num_mentioned=cfg.num_mentioned,
            pad_size=getattr(cfg, "pad_size", 16),
            num_distractors=getattr(cfg, "num_distractors", "all"),
            describe_by="closest" if describe_by == "all" else describe_by)
    if dataset == "SYNTHETIC":
        from text2pos_tpu.data.synthetic import make_synthetic_dataset

        seed = {"train": 0, "val": 1, "test": 2}[split]
        return make_synthetic_dataset(
            seed=seed, scene_name=f"999{seed}",
            extent=240.0 if split == "train" else 120.0,
            num_mentioned=cfg.num_mentioned, poses_per_cell=3)

    from text2pos_tpu.data.legacy import load_scenes

    scenes = {"train": SCENE_NAMES_TRAIN, "val": SCENE_NAMES_VAL,
              "test": SCENE_NAMES_TEST}[split]
    return load_scenes(cfg.base_path, scenes)
