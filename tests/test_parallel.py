"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest


class TestMesh:
    def test_eight_virtual_devices(self):
        assert len(jax.devices()) >= 8, jax.devices()

    def test_make_mesh(self):
        from text2pos_tpu.parallel.dp import make_mesh

        mesh = make_mesh(8)
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("dp",)


class TestDryRun:
    def test_full_dp_training_steps(self):
        """The driver contract: one full DP train step per stage compiles
        and executes over an 8-device mesh."""
        import __graft_entry__ as g

        g.dryrun_multichip(8)


class TestVisloc:
    def test_perfect_features_localize(self, rng):
        from text2pos_tpu.evaluation.visloc import evaluate_features

        D = 40
        db_feats = rng.normal(size=(D, 32))
        db_poses = rng.random((D, 2)) * 200
        # queries = noisy copies of db entries → top-1 must localize exactly
        q_idx = rng.integers(0, D, 10)
        q_feats = db_feats[q_idx] + rng.normal(scale=1e-3, size=(10, 32))
        q_poses = db_poses[q_idx]
        accs = evaluate_features(db_feats, db_poses, q_feats, q_poses,
                                 top_k=(1, 5), threshs=(5, 15))
        assert accs[1][5] == 1.0

    def test_random_features_mostly_fail(self, rng):
        from text2pos_tpu.evaluation.visloc import evaluate_features

        db_feats = rng.normal(size=(100, 16))
        db_poses = rng.random((100, 2)) * 2000
        q_feats = rng.normal(size=(30, 16))
        q_poses = rng.random((30, 2)) * 2000
        accs = evaluate_features(db_feats, db_poses, q_feats, q_poses,
                                 top_k=(1,), threshs=(5,))
        assert accs[1][5] < 0.5
