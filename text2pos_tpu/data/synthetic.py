"""Synthetic KITTI360Pose-like data generation.

Generates random scenes of blob objects and drives them through the *real*
cell / description / grounding pipeline, producing `Cell` and `Pose`
structures indistinguishable (format-wise) from prepared KITTI360Pose data.
Used by the test-suite, benchmarks and demo training runs — this environment
has no raw KITTI360 data.

The reference's synthetic path (create_synthetic_cell and the deprecated
Kitti360FineSyntheticDataset, /root/reference/dataloading/kitti360pose/
synthetic.py:50-202) only mocked the fine stage; this generator covers the
full coarse+fine data model.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from text2pos_tpu.constants import COLORS, STUFF_CLASSES
from text2pos_tpu.data.descriptions import (
    create_cell,
    describe_pose_in_pose_cell,
    ground_pose_to_best_cell,
)
from text2pos_tpu.data.structs import Cell, Object3d, Pose

# Instance classes only: keeps generation fast (no DBSCAN) by default.
_INSTANCE_LABELS = [
    "building", "pole", "traffic light", "traffic sign", "garage",
    "stop", "smallpole", "lamp", "trash bin", "vending machine", "box",
]

# Class-conditioned geometry/appearance so classes are *learnable* and the
# text ↔ geometry correlation transfers across synthetic scenes:
# (xy-spread, z-spread, point count, preferred color-center indices).
_CLASS_PROFILES = {
    "building":        (6.0, 4.0, 320, (1, 2, 4)),
    "garage":          (4.0, 2.0, 220, (2, 4)),
    "pole":            (0.15, 3.5, 80, (5, 6)),
    "smallpole":       (0.1, 1.5, 60, (5, 6)),
    "traffic light":   (0.3, 2.5, 70, (5, 0)),
    "traffic sign":    (0.4, 2.0, 70, (3, 7)),
    "stop":            (0.3, 1.5, 60, (3,)),
    "lamp":            (0.2, 3.0, 60, (7, 3)),
    "trash bin":       (0.5, 0.8, 80, (0, 6)),
    "vending machine": (0.6, 1.2, 80, (1, 4)),
    "box":             (0.8, 0.8, 80, (2, 1)),
}


def make_blob_object(rng: np.random.Generator, obj_id: int, instance_id: int,
                     center: np.ndarray, label: str,
                     num_points: int = 0, spread: float = 0.0) -> Object3d:
    """A synthetic object with class-characteristic shape and color."""
    xy_spread, z_spread, n_pts, color_choices = _CLASS_PROFILES.get(
        label, (2.0, 2.0, 120, tuple(range(len(COLORS)))))
    if num_points:
        n_pts = num_points
    scale = np.array([xy_spread, xy_spread, z_spread])
    xyz = center + rng.normal(size=(n_pts, 3)) * scale
    base_rgb = COLORS[color_choices[rng.integers(0, len(color_choices))]]
    rgb = np.clip(base_rgb + rng.normal(scale=0.03, size=(n_pts, 3)), 0.0, 1.0)
    return Object3d(obj_id, instance_id, xyz, rgb, label)


def make_synthetic_scene(rng: np.random.Generator, extent: float = 120.0,
                         objects_per_cell_area: int = 12, cell_size: float = 30.0,
                         include_stuff: bool = False) -> List[Object3d]:
    """Scatter blob objects over an extent×extent world at z∈[0, cell_size]."""
    objects: List[Object3d] = []
    instance_id = 0
    num_areas = max(1, int(extent // cell_size))
    for gx in range(num_areas):
        for gy in range(num_areas):
            lo = np.array([gx * cell_size, gy * cell_size, 0.0])
            for _ in range(objects_per_cell_area):
                center = lo + rng.random(3) * np.array([cell_size, cell_size, cell_size / 3])
                label = _INSTANCE_LABELS[rng.integers(0, len(_INSTANCE_LABELS))]
                objects.append(
                    make_blob_object(rng, obj_id=instance_id, instance_id=instance_id,
                                     center=center, label=label)
                )
                instance_id += 1
            if include_stuff:
                label = STUFF_CLASSES[rng.integers(0, len(STUFF_CLASSES))]
                pts = rng.random((1200, 3)) * np.array([cell_size, cell_size, 0.5]) + lo
                rgb = np.clip(
                    COLORS[rng.integers(0, len(COLORS))]
                    + rng.normal(scale=0.02, size=(1200, 3)),
                    0, 1,
                )
                objects.append(Object3d(instance_id, instance_id, pts, rgb, label))
                instance_id += 1
    return objects


def make_synthetic_dataset(
    seed: int = 0,
    scene_name: str = "9999",
    extent: float = 120.0,
    cell_size: float = 30.0,
    num_mentioned: int = 6,
    poses_per_cell: int = 2,
    objects_per_cell_area: int = 12,
    include_stuff: bool = False,
    describe_by: str = "closest",
) -> Tuple[List[Cell], List[Pose]]:
    """Full synthetic dataset: grid cells plus grounded, described poses.

    Mirrors the structure of prepare.py's create_cells/create_poses
    (/root/reference/datapreparation/kitti360pose/prepare.py:216-427) on a
    synthetic scene: non-overlapping grid cells, poses randomly placed in
    cells, descriptions made in an ego-centered pose cell and grounded to
    the nearest database cell.
    """
    rng = np.random.default_rng(seed)
    scene_objects = make_synthetic_scene(
        rng, extent=extent, objects_per_cell_area=objects_per_cell_area,
        cell_size=cell_size, include_stuff=include_stuff,
    )

    # Database cells on a grid.
    cells: List[Cell] = []
    num_areas = max(1, int(extent // cell_size))
    idx = 0
    for gx in range(num_areas):
        for gy in range(num_areas):
            lo = np.array([gx * cell_size, gy * cell_size, 0.0])
            bbox = np.hstack((lo, lo + cell_size))
            cell = create_cell(idx, scene_name, bbox, scene_objects,
                               num_mentioned=num_mentioned)
            if cell is not None:
                cells.append(cell)
                idx += 1

    cell_centers = np.array([c.get_center() for c in cells])

    poses: List[Pose] = []
    for cell in cells:
        for _ in range(poses_per_cell):
            # Keep the pose inside the central region so the pose-cell has
            # enough candidates and grounding asserts hold.
            frac = 0.25 + 0.5 * rng.random(3)
            location = cell.bbox_w[0:3] + frac * (cell.bbox_w[3:6] - cell.bbox_w[0:3])

            dists = np.linalg.norm(location - cell_centers, axis=1)
            best_cell = cells[int(np.argmin(dists))]

            pose_cell_bbox = np.hstack((location - cell_size / 2, location + cell_size / 2))
            pose_cell = create_cell(-1, "pose", pose_cell_bbox, scene_objects,
                                    num_mentioned=num_mentioned)
            if pose_cell is None:
                continue
            descriptions = describe_pose_in_pose_cell(
                location, pose_cell, describe_by, num_mentioned
            )
            if descriptions is None:
                continue
            best_descriptions, pose_in_cell, _ = ground_pose_to_best_cell(
                location, descriptions, best_cell
            )
            poses.append(
                Pose(pose_in_cell, location, best_cell.id, best_cell.scene_name,
                     best_descriptions, described_by=describe_by)
            )

    assert len(cells) > 0 and len(poses) > 0
    return cells, poses
