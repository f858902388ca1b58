"""Parity tests for the first-party C++ data-prep library."""

import numpy as np
import pytest

from text2pos_tpu.data import native


pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library not built")


class TestNativeVoxel:
    def test_matches_numpy(self, rng):
        from text2pos_tpu.data.voxel import voxel_downsample_indices

        for scale, v in [(10, 0.5), (300, 0.25), (5, 0.125)]:
            pts = rng.random((8000, 3)) * scale - scale / 2
            a = voxel_downsample_indices(pts, v)
            b = voxel_downsample_indices(pts, v, force_numpy=True)
            np.testing.assert_array_equal(a, b)


class TestNativeDBSCAN:
    def test_partition_matches_sklearn(self, rng):
        from text2pos_tpu.data.cluster import dbscan_labels

        pts = np.vstack([
            rng.normal(scale=0.2, size=(250, 3)),
            rng.normal(scale=0.2, size=(250, 3)) + 6.0,
            rng.uniform(-30, 30, (15, 3)),
        ])
        nat = dbscan_labels(pts, 0.75, 5, backend="native")
        ref = dbscan_labels(pts, 0.75, 5, backend="sklearn")
        core = (nat >= 0) & (ref >= 0)
        same_n = nat[:, None] == nat[None, :]
        same_r = ref[:, None] == ref[None, :]
        np.testing.assert_array_equal(same_n[core][:, core],
                                      same_r[core][:, core])


class TestNativeFPS:
    def test_matches_jax_op(self, rng):
        import jax.numpy as jnp

        from text2pos_tpu.data.native import fps_indices
        from text2pos_tpu.ops.fps import farthest_point_sampling

        pts = rng.random((96, 3))
        nat = fps_indices(pts, 24)
        dev = np.asarray(farthest_point_sampling(
            jnp.asarray(pts[None], jnp.float32), 24))[0]
        np.testing.assert_array_equal(nat, dev)
