"""Converter test: fabricated reference-layout PointNet state_dict →
our flax variable tree with matching shapes, and functionally loadable."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from text2pos_tpu.models.pointnet2 import PointNet2  # noqa: E402
from text2pos_tpu.utils.convert_torch import convert_pointnet2_state_dict  # noqa: E402

NUM_CLASSES, NUM_COLORS = 23, 9


def fabricate_reference_state_dict(rng):
    """Build a state_dict with the reference PointNet2 module layout
    (pointnet2.py:57-65): sa MLP dims [6→32→64], [67→128→128],
    [131→256→256], ga [259→512→1024], lin 1024→512→256 + heads."""
    sd = {}

    def add_linear(prefix, din, dout):
        sd[f"{prefix}.weight"] = torch.from_numpy(
            rng.normal(size=(dout, din)).astype(np.float32))
        sd[f"{prefix}.bias"] = torch.from_numpy(
            rng.normal(size=(dout,)).astype(np.float32))

    def add_bn(prefix, d):
        sd[f"{prefix}.weight"] = torch.ones(d)
        sd[f"{prefix}.bias"] = torch.zeros(d)
        sd[f"{prefix}.running_mean"] = torch.from_numpy(
            rng.normal(size=(d,)).astype(np.float32))
        sd[f"{prefix}.running_var"] = torch.ones(d)
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0)

    def add_mlp(prefix, dims):
        for i in range(len(dims) - 1):
            add_linear(f"{prefix}.{i}.0", dims[i], dims[i + 1])
            add_bn(f"{prefix}.{i}.1", dims[i + 1])

    add_mlp("sa1.point_conv.local_nn", [6, 32, 64])
    add_mlp("sa2.point_conv.local_nn", [67, 128, 128])
    add_mlp("sa3.point_conv.local_nn", [131, 256, 256])
    add_mlp("ga.mlp", [259, 512, 1024])
    add_linear("lin1", 1024, 512)
    add_linear("lin2", 512, 256)
    add_linear("class_classifier", 256, NUM_CLASSES)
    add_linear("color_classifier", 256, NUM_COLORS)
    return sd


class TestPointNetConverter:
    def test_shapes_and_apply(self, rng):
        sd = fabricate_reference_state_dict(rng)
        variables = convert_pointnet2_state_dict(sd)

        model = PointNet2(NUM_CLASSES, NUM_COLORS)
        xyz = jnp.asarray(rng.random((3, 64, 3)), jnp.float32)
        rgb = jnp.asarray(rng.random((3, 64, 3)), jnp.float32)
        native = model.init(jax.random.PRNGKey(0), xyz, rgb)

        # Converted tree must be shape-congruent with a native init.
        congruent = jax.tree.map(
            lambda a, b: np.shape(a) == np.shape(b),
            native["params"], variables["params"])
        assert all(jax.tree.leaves(congruent))

        # And the converted variables must run in eval mode.
        out = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            xyz, rgb, train=False)
        assert out["features2"].shape == (3, 256)
        assert np.all(np.isfinite(np.asarray(out["class_pred"])))
