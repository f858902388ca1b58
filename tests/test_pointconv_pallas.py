"""Fused Pallas set-abstraction kernel ≡ the standard eval forward."""

import jax
import jax.numpy as jnp
import numpy as np

from text2pos_tpu.models.pointnet2 import PointNet2
from text2pos_tpu.models.pointnet2_fast import pointnet2_eval_fast


class TestPointConvPallas:
    def test_fast_eval_matches_model(self, rng):
        B, P = 3, 64
        xyz = jnp.asarray(rng.random((B, P, 3)), jnp.float32)
        rgb = jnp.asarray(rng.random((B, P, 3)), jnp.float32)
        model = PointNet2(23, 9)
        v = model.init(jax.random.PRNGKey(0), xyz, rgb)
        # non-trivial running stats so the BN folds are actually exercised
        v = dict(v)
        v["batch_stats"] = jax.tree.map(
            lambda a: a + 0.123, v["batch_stats"])

        want = model.apply(v, xyz, rgb, train=False)
        got = pointnet2_eval_fast(v, xyz, rgb, interpret=True)
        for key in ("features0", "features1", "features2", "class_pred",
                    "color_pred"):
            np.testing.assert_allclose(np.asarray(got[key]),
                                       np.asarray(want[key]), atol=2e-4)
