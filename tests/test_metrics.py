"""World-coordinate accuracy metrics, incl. the cross-scene guard."""

import numpy as np

from text2pos_tpu.evaluation.metrics import calc_accuracies, print_accuracies


class TestCalcAccuracies:
    def test_exact_hit(self):
        pose_w = np.array([[15.0, 15.0]])
        lo = np.array([[[0.0, 0.0], [100.0, 100.0]]])   # two retrieved cells
        sizes = np.full((1, 2), 30.0)
        pos = np.array([[[0.5, 0.5], [0.5, 0.5]]])      # cell centers
        same = np.array([[True, True]])
        accs = calc_accuracies(pose_w, lo, sizes, pos, same,
                               top_k=(1, 2), threshs=(5, 15))
        assert accs[1][5] == 1.0   # first cell's center == pose
        assert accs[2][15] == 1.0

    def test_cross_scene_guard(self):
        """A geometrically-close retrieval from another scene must not count
        (reference evaluation/utils.py:49-51)."""
        pose_w = np.array([[15.0, 15.0]])
        lo = np.array([[[0.0, 0.0]]])
        sizes = np.full((1, 1), 30.0)
        pos = np.array([[[0.5, 0.5]]])
        hit = calc_accuracies(pose_w, lo, sizes, pos, np.array([[True]]),
                              (1,), (5,))
        miss = calc_accuracies(pose_w, lo, sizes, pos, np.array([[False]]),
                               (1,), (5,))
        assert hit[1][5] == 1.0 and miss[1][5] == 0.0

    def test_top_k_ordering(self):
        """Only the first k retrievals count toward top-k."""
        pose_w = np.array([[15.0, 15.0]])
        lo = np.array([[[500.0, 500.0], [0.0, 0.0]]])   # hit is in slot 2
        sizes = np.full((1, 2), 30.0)
        pos = np.full((1, 2, 2), 0.5)
        same = np.array([[True, True]])
        accs = calc_accuracies(pose_w, lo, sizes, pos, same, (1, 2), (5,))
        assert accs[1][5] == 0.0 and accs[2][5] == 1.0

    def test_print_accuracies_format(self):
        accs = {1: {5: 0.25, 15: 0.5}, 10: {5: 0.75, 15: 1.0}}
        out = print_accuracies(accs, "Test", log=lambda *a: None)
        assert "0.25/0.50" in out and "0.75/1.00" in out


class TestDrawing:
    def test_renderings(self, synthetic_data):
        from text2pos_tpu.utils.drawing import (
            plot_cell, plot_matches_in_best_cell, plot_pose_in_best_cell)

        cells, poses = synthetic_data
        pose = poses[0]
        cell = next(c for c in cells if c.id == pose.cell_id)

        img = plot_cell(cell, size=128)
        assert img.shape == (128, 128, 3) and img.dtype == np.uint8
        assert img.min() < 255  # something was drawn

        img2 = plot_pose_in_best_cell(cell, pose, size=128)
        assert img2.shape == (128, 128, 3)

        matches0 = np.full(len(cell.objects), -1)
        matches0[0] = 0
        img3 = plot_matches_in_best_cell(cell, pose, matches0, size=128)
        assert img3.shape == (128, 128, 3)


class TestSceneRenderers:
    def test_scene_overview_and_retrievals(self, synthetic_data):
        from text2pos_tpu.utils.drawing import plot_cells_and_poses, plot_retrievals

        cells, poses = synthetic_data
        img = plot_cells_and_poses(cells, poses, size=256)
        assert img.shape == (256, 256, 3)

        # Fabricate retrievals: half correct, half wrong.
        retrievals = []
        for i, p in enumerate(poses):
            if i % 2 == 0:
                retrievals.append([p.cell_id])
            else:
                other = next(c.id for c in cells if c.id != p.cell_id)
                retrievals.append([other])
        out = plot_retrievals(retrievals, cells, poses, count=2, size=128)
        assert len(out) > 0
        flags = {f for f, _ in out}
        assert flags == {True, False}
        for _, im in out:
            assert im.shape == (128, 256, 3)
