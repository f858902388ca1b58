"""Loader for the reference's pickled KITTI360Pose datasets.

The reference distributes prepared data as pickles of its own classes
(`datapreparation.kitti360pose.imports.{Object3d, Cell, Pose, ...}`), with
an extra module alias `datapreparation.kitti360` for older pickles
(/root/reference/dataloading/__init__.py:8-10). This module unpickles those
files *without the reference package installed* by registering stand-in
classes under the expected module paths, then converts them to
text2pos_tpu structs.
"""

from __future__ import annotations

import os.path as osp
import pickle
import sys
import types
from typing import List, Tuple

import numpy as np

from text2pos_tpu.data.structs import (
    Cell,
    DescriptionBestCell,
    Object3d,
    Pose,
)


class _ShimObject3d:
    """Attribute bag standing in for the reference Object3d during unpickle."""

    def __setstate__(self, state):
        self.__dict__.update(state)


class _ShimGeneric:
    def __setstate__(self, state):
        self.__dict__.update(state)


_SHIM_MODULES = (
    "datapreparation",
    "datapreparation.kitti360pose",
    "datapreparation.kitti360pose.imports",
    "datapreparation.kitti360",        # legacy alias (dataloading/__init__.py:8-10)
    "datapreparation.kitti360.imports",
)


def _install_shims() -> None:
    for name in _SHIM_MODULES:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    for name in ("datapreparation.kitti360pose.imports",
                 "datapreparation.kitti360.imports"):
        mod = sys.modules[name]
        for cls_name, base in (
            ("Object3d", _ShimObject3d),
            ("Cell", _ShimGeneric),
            ("Pose", _ShimGeneric),
            ("DescriptionPoseCell", _ShimGeneric),
            ("DescriptionBestCell", _ShimGeneric),
        ):
            if not hasattr(mod, cls_name):
                setattr(mod, cls_name,
                        type(cls_name, (base,), {"__module__": name}))


def _convert_object(o) -> Object3d:
    return Object3d(int(o.id), int(o.instance_id), np.asarray(o.xyz),
                    np.asarray(o.rgb), str(o.label))


def _convert_cell(c) -> Cell:
    idx = int(c.id.split("_")[-1])
    scene_short = c.id.split("_")[0]
    cell = Cell(idx, scene_short, [_convert_object(o) for o in c.objects],
                float(c.cell_size), np.asarray(c.bbox_w))
    assert cell.id == c.id, (cell.id, c.id)
    return cell


def _convert_description(d) -> DescriptionBestCell:
    return DescriptionBestCell(
        object_instance_id=int(d.object_instance_id),
        object_label=str(d.object_label),
        object_color_rgb=np.asarray(d.object_color_rgb),
        object_color_text=str(d.object_color_text),
        direction=str(d.direction),
        offset_center=np.asarray(d.offset_center),
        offset_closest=np.asarray(d.offset_closest),
        closest_point=np.asarray(d.closest_point),
        is_matched=bool(d.is_matched),
        object_id=int(getattr(d, "object_id", -1)),
        best_offset_center=(np.asarray(d.best_offset_center)
                            if getattr(d, "best_offset_center", None) is not None
                            else None),
        best_offset_closest=(np.asarray(d.best_offset_closest)
                             if getattr(d, "best_offset_closest", None) is not None
                             else None),
    )


def _convert_pose(p) -> Pose:
    return Pose(
        np.asarray(p.pose), np.asarray(p.pose_w), str(p.cell_id),
        str(getattr(p, "scene_name", p.cell_id.split("_")[0])),
        [_convert_description(d) for d in p.descriptions],
        described_by=getattr(p, "described_by", None),
    )


def load_reference_scene(base_path: str, scene_name: str
                         ) -> Tuple[List[Cell], List[Pose]]:
    """Load {base}/cells/{scene}.pkl and {base}/poses/{scene}.pkl in either
    the reference's or this package's pickle format."""
    _install_shims()
    with open(osp.join(base_path, "cells", f"{scene_name}.pkl"), "rb") as f:
        raw_cells = pickle.load(f)
    with open(osp.join(base_path, "poses", f"{scene_name}.pkl"), "rb") as f:
        raw_poses = pickle.load(f)

    if raw_cells and isinstance(raw_cells[0], Cell):
        return raw_cells, raw_poses  # already native format
    cells = [_convert_cell(c) for c in raw_cells]
    poses = [_convert_pose(p) for p in raw_poses]
    return cells, poses


def load_scenes(base_path: str, scene_names: List[str]
                ) -> Tuple[List[Cell], List[Pose]]:
    """Multi-scene concatenation (reference cells.py:113-152)."""
    all_cells: List[Cell] = []
    all_poses: List[Pose] = []
    for scene in scene_names:
        cells, poses = load_reference_scene(base_path, scene)
        all_cells.extend(cells)
        all_poses.extend(poses)
    ids = [c.id for c in all_cells]
    assert len(np.unique(ids)) == len(ids), "cell ids repeat across scenes"
    return all_cells, all_poses
