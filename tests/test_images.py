"""Visloc image datasets + headless renderer (reference images.py /
rendering.py equivalents)."""

import os
import os.path as osp
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from text2pos_tpu.data.images import (Kitti360ImageCompareDataset,
                                      Kitti360ImageDataset, render_poses,
                                      render_view)
from text2pos_tpu.data.synthetic import make_blob_object


@pytest.fixture()
def scene_objects(rng):
    objs = []
    for i in range(12):
        # Tight-spread poles well in front of the origin so the scene stays
        # strictly on the +x side (building blobs have ~6 m point spread).
        center = np.array([rng.uniform(10, 25), rng.uniform(-8, 8),
                           rng.uniform(0, 3)])
        objs.append(make_blob_object(rng, i, i, center, "pole"))
    return objs


class TestRenderer:
    def test_points_in_front_are_drawn(self, scene_objects):
        from text2pos_tpu.data.images import concat_objects

        xyz, rgb = concat_objects(scene_objects)
        img = render_view(xyz, rgb, eye=np.array([0.0, 0.0, 1.7]),
                          look_dir=np.array([1.0, 0.0, 0.0]))
        assert img.shape == (256, 256, 3) and img.dtype == np.uint8
        assert img.any(), "forward view of a populated scene must be non-empty"

        # Looking the other way: scene behind camera → empty image.
        img_back = render_view(xyz, rgb, eye=np.array([0.0, 0.0, 1.7]),
                               look_dir=np.array([-1.0, 0.0, 0.0]))
        assert not img_back.any()

    def test_render_poses_writes_files(self, scene_objects, tmp_path):
        poses = np.array([[0.0, 0.0, 0.0], [2.0, 1.0, 0.0]])
        paths = render_poses(scene_objects, poses, str(tmp_path / "out"))
        assert len(paths) == 2 and all(osp.isfile(p) for p in paths)


def _write_image_dir(d, n):
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        cv2.imwrite(osp.join(d, f"{i:05d}.png"),
                    np.full((8, 8, 3), i * 10, np.uint8))


class TestImageDatasets:
    def test_compare_dataset_layout(self, tmp_path):
        root = tmp_path / "visloc" / "sceneA" / "db"
        _write_image_dir(str(root), 3)
        with open(root / "poses.pkl", "wb") as f:
            pickle.dump(np.arange(9.0).reshape(3, 3), f)
        ds = Kitti360ImageCompareDataset(str(tmp_path), "sceneA", "db")
        assert len(ds) == 3
        item = ds[1]
        assert item["images"].shape == (8, 8, 3)
        assert item["images"][0, 0, 0] == 10

    def test_image_dataset_with_rendered_pair(self, tmp_path):
        scene = tmp_path / "sceneB"
        _write_image_dir(str(scene / "real" / "query"), 2)
        _write_image_dir(str(scene / "rendered" / "query"), 2)
        with open(scene / "poses_query.pkl", "wb") as f:
            pickle.dump(np.zeros((2, 3)), f)
        ds = Kitti360ImageDataset(str(tmp_path), "sceneB", "query")
        item = ds[0]
        assert "images_rendered" in item
        assert item["images"].shape == item["images_rendered"].shape

    def test_image_dataset_without_rendered(self, tmp_path):
        scene = tmp_path / "sceneC"
        _write_image_dir(str(scene / "real" / "db"), 2)
        with open(scene / "poses_db.pkl", "wb") as f:
            pickle.dump(np.zeros((2, 3)), f)
        ds = Kitti360ImageDataset(str(tmp_path), "sceneC", "db")
        assert "images_rendered" not in ds[0]
