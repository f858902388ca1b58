"""Shape, masking-invariance and behaviour tests for the model layer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2pos_tpu.models.cell_retrieval import CellRetrievalNetwork
from text2pos_tpu.models.language import LanguageEncoder
from text2pos_tpu.models.matcher import (
    SuperGlueMatch,
    get_pos_in_cell,
    get_pos_in_cell_intersect,
)
from text2pos_tpu.models.offsets import OffsetRegressor
from text2pos_tpu.models.pointnet2 import PointNet2
from text2pos_tpu.models.superglue import SuperGlue

EMBED = 16
VOCAB = 40


def _flat_objects(rng, F, P=32):
    return dict(
        points_xyz=jnp.asarray(rng.random((F, P, 3)), jnp.float32),
        points_rgb=jnp.asarray(rng.random((F, P, 3)), jnp.float32),
        centers=jnp.asarray(rng.random((F, 3)), jnp.float32),
        colors=jnp.asarray(rng.random((F, 3)), jnp.float32),
        class_idx=jnp.asarray(rng.integers(1, 10, F), jnp.int32),
        color_idx=jnp.asarray(rng.integers(0, 8, F), jnp.int32),
    )


class TestLanguageEncoder:
    def test_shapes_and_padding(self, rng):
        model = LanguageEncoder(VOCAB, EMBED)
        tokens = jnp.asarray(rng.integers(1, VOCAB, (3, 10)), jnp.int32)
        lengths = jnp.asarray([10, 4, 1], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), tokens, lengths)
        out = model.apply(params, tokens, lengths)
        assert out.shape == (3, EMBED)
        # garbage in the padding region must not change the encoding
        tokens2 = tokens.at[1, 4:].set(7)
        out2 = model.apply(params, tokens2, lengths)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


class TestPointNet2:
    def test_shapes(self, rng):
        model = PointNet2(num_classes=22, num_colors=9)
        xyz = jnp.asarray(rng.random((4, 64, 3)), jnp.float32)
        rgb = jnp.asarray(rng.random((4, 64, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), xyz, rgb)
        out, _ = model.apply(variables, xyz, rgb, train=True,
                             mutable=["batch_stats"])
        assert out["features0"].shape == (4, 1024)
        assert out["features2"].shape == (4, 256)
        assert out["class_pred"].shape == (4, 22)
        assert out["color_pred"].shape == (4, 9)

    def test_invalid_objects_dont_pollute_bn(self, rng):
        """BatchNorm stats must come from valid objects only."""
        model = PointNet2(num_classes=5, num_colors=3)
        xyz = jnp.asarray(rng.random((4, 32, 3)), jnp.float32)
        rgb = jnp.asarray(rng.random((4, 32, 3)), jnp.float32)
        valid = jnp.asarray([True, True, True, False])
        variables = model.init(jax.random.PRNGKey(0), xyz, rgb)
        out1, _ = model.apply(variables, xyz, rgb, valid=valid, train=True,
                              mutable=["batch_stats"])
        xyz2 = xyz.at[3].set(99.0)  # garbage in the invalid slot
        out2, _ = model.apply(variables, xyz2, rgb, valid=valid, train=True,
                              mutable=["batch_stats"])
        np.testing.assert_allclose(
            np.asarray(out1["features2"][:3]), np.asarray(out2["features2"][:3]),
            atol=1e-5,
        )


class TestCellRetrieval:
    def _model(self):
        return CellRetrievalNetwork(
            vocab_size=VOCAB, embed_dim=EMBED, num_classes=23, num_colors=9
        )

    def _init(self, model, rng, B=2, O=6, F=12):
        flat = _flat_objects(rng, F)
        tokens = jnp.asarray(rng.integers(1, VOCAB, (B, 8)), jnp.int32)
        lengths = jnp.full((B,), 8, jnp.int32)
        flat_valid = jnp.ones(F, bool)
        cell_idx = jnp.asarray(np.repeat(np.arange(B), F // B), jnp.int32)
        slot_idx = jnp.asarray(np.tile(np.arange(F // B), B), jnp.int32)
        variables = model.init(
            jax.random.PRNGKey(0), tokens, lengths, flat["points_xyz"],
            flat["points_rgb"], flat["centers"], flat["colors"],
            flat["class_idx"], flat["color_idx"], flat_valid, cell_idx,
            slot_idx, B, O,
        )
        args = (tokens, lengths, flat, flat_valid, cell_idx, slot_idx)
        return variables, args

    def test_shapes_and_norm(self, rng):
        model = self._model()
        variables, (tokens, lengths, flat, fv, ci, si) = self._init(model, rng)
        text, cells = model.apply(
            variables, tokens, lengths, flat["points_xyz"], flat["points_rgb"],
            flat["centers"], flat["colors"], flat["class_idx"],
            flat["color_idx"], fv, ci, si, 2, 6, train=False,
        )
        assert text.shape == (2, EMBED) and cells.shape == (2, EMBED)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(text), axis=1), 1.0, atol=1e-5)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(cells), axis=1), 1.0, atol=1e-5)

    def test_padding_slots_invariant(self, rng):
        """Cell embeddings must not depend on the dense padding capacity."""
        model = self._model()
        variables, (tokens, lengths, flat, fv, ci, si) = self._init(model, rng)

        def encode(max_objects):
            return model.apply(
                variables, tokens, lengths, flat["points_xyz"],
                flat["points_rgb"], flat["centers"], flat["colors"],
                flat["class_idx"], flat["color_idx"], fv, ci, si, 2,
                max_objects, train=False,
            )[1]

        a = np.asarray(encode(6))
        b = np.asarray(encode(11))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_flat_padding_invariant(self, rng):
        """Invalid tail entries of the flat buffer must not matter."""
        model = self._model()
        variables, (tokens, lengths, flat, fv, ci, si) = self._init(model, rng)
        F = fv.shape[0]
        fv2 = fv.at[F - 2 :].set(False)

        def encode(points_xyz):
            return model.apply(
                variables, tokens, lengths, points_xyz, flat["points_rgb"],
                flat["centers"], flat["colors"], flat["class_idx"],
                flat["color_idx"], fv2, ci, si, 2, 6, train=False,
            )[1]

        a = np.asarray(encode(flat["points_xyz"]))
        b = np.asarray(encode(flat["points_xyz"].at[F - 1].set(77.0)))
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestSuperGlue:
    def test_forward(self, rng):
        model = SuperGlue(descriptor_dim=EMBED, num_layers=2,
                          sinkhorn_iterations=10)
        d0 = jnp.asarray(rng.normal(size=(2, 5, EMBED)), jnp.float32)
        d1 = jnp.asarray(rng.normal(size=(2, 3, EMBED)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), d0, d1)
        out, _ = model.apply(variables, d0, d1, train=True,
                             mutable=["batch_stats"])
        assert out["P"].shape == (2, 6, 4)
        assert out["matches0"].shape == (2, 5)
        assert out["matches1"].shape == (2, 3)
        P = np.asarray(out["P"])
        assert np.all(P >= 0)

    def test_identical_descriptors_match(self, rng):
        """With equal descriptor sets the diagonal should dominate."""
        model = SuperGlue(descriptor_dim=EMBED, num_layers=0,
                          sinkhorn_iterations=50, match_threshold=0.0)
        d = jnp.asarray(
            np.eye(4, EMBED)[None].repeat(1, axis=0) * 5, jnp.float32
        )
        variables = model.init(jax.random.PRNGKey(0), d, d)
        out = model.apply(variables, d, d, train=False)
        m0 = np.asarray(out["matches0"])[0]
        np.testing.assert_array_equal(m0, np.arange(4))


class TestSuperGlueMatch:
    def test_forward_shapes(self, rng):
        B, H, T, O, P = 2, 4, 8, 6, 32
        model = SuperGlueMatch(vocab_size=VOCAB, embed_dim=EMBED, num_layers=2,
                               sinkhorn_iters=10)
        args = dict(
            hint_tokens=jnp.asarray(rng.integers(1, VOCAB, (B, H, T)), jnp.int32),
            hint_lengths=jnp.full((B, H), T, jnp.int32),
            points_xyz=jnp.asarray(rng.random((B, O, P, 3)), jnp.float32),
            points_rgb=jnp.asarray(rng.random((B, O, P, 3)), jnp.float32),
            centers=jnp.asarray(rng.random((B, O, 3)), jnp.float32),
            colors=jnp.asarray(rng.random((B, O, 3)), jnp.float32),
            class_idx=jnp.asarray(rng.integers(1, 22, (B, O)), jnp.int32),
            color_idx=jnp.asarray(rng.integers(0, 8, (B, O)), jnp.int32),
        )
        variables = model.init(jax.random.PRNGKey(0), **args)
        out, _ = model.apply(variables, **args, train=True,
                             mutable=["batch_stats"])
        assert out["P"].shape == (B, O + 1, H + 1)
        assert out["offsets"].shape == (B, H, 2)
        assert out["matches0"].shape == (B, O)


class TestPosInCell:
    def test_mean_of_matches(self):
        centers = jnp.asarray([[[0.0, 0.0], [1.0, 1.0], [0.2, 0.8]]])
        matches0 = jnp.asarray([[0, 1, -1]])
        offsets = jnp.asarray([[[0.1, 0.0], [0.0, -0.1], [9.9, 9.9]]])
        pos = np.asarray(get_pos_in_cell(centers, matches0, offsets))[0]
        want = np.mean([[0.1, 0.0], [1.0, 0.9]], axis=0)
        np.testing.assert_allclose(pos, want, atol=1e-6)

    def test_fallback(self):
        centers = jnp.zeros((1, 3, 2))
        matches0 = jnp.full((1, 3), -1)
        offsets = jnp.zeros((1, 2, 2))
        pos = np.asarray(get_pos_in_cell(centers, matches0, offsets))[0]
        np.testing.assert_allclose(pos, [0.5, 0.5])

    def test_intersect_two_rays(self):
        # Rays from (0,0) pointing +x and from (1,-1) pointing +y meet at (1,0)...
        # direction per *hint*; object i matched to hint i.
        centers = jnp.asarray([[[0.0, 0.0], [1.0, -1.0]]])
        matches0 = jnp.asarray([[0, 1]])
        directions = jnp.asarray([[[1.0, 0.0], [0.0, 1.0]]])
        pos = np.asarray(get_pos_in_cell_intersect(centers, matches0, directions))[0]
        np.testing.assert_allclose(pos, [1.0, 0.0], atol=1e-3)


class TestOffsetRegressor:
    def test_unit_norm(self, rng):
        model = OffsetRegressor(vocab_size=VOCAB, regressor_dim=EMBED)
        tokens = jnp.asarray(rng.integers(1, VOCAB, (2, 3, 6)), jnp.int32)
        lengths = jnp.full((2, 3), 6, jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), tokens, lengths)
        out = model.apply(variables, tokens, lengths, train=False)
        assert out.shape == (2, 3, 2)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5)


class TestMixedPrecision:
    def test_bf16_matcher_close_to_f32(self, rng):
        """bfloat16 compute dtype: outputs finite and close to float32."""
        B, H, T, O, P = 2, 4, 8, 6, 32
        args = dict(
            hint_tokens=jnp.asarray(rng.integers(1, VOCAB, (B, H, T)), jnp.int32),
            hint_lengths=jnp.full((B, H), T, jnp.int32),
            points_xyz=jnp.asarray(rng.random((B, O, P, 3)), jnp.float32),
            points_rgb=jnp.asarray(rng.random((B, O, P, 3)), jnp.float32),
            centers=jnp.asarray(rng.random((B, O, 3)), jnp.float32),
            colors=jnp.asarray(rng.random((B, O, 3)), jnp.float32),
            class_idx=jnp.asarray(rng.integers(1, 22, (B, O)), jnp.int32),
            color_idx=jnp.asarray(rng.integers(0, 8, (B, O)), jnp.int32),
        )
        f32 = SuperGlueMatch(vocab_size=VOCAB, embed_dim=EMBED, num_layers=1,
                             sinkhorn_iters=10)
        bf16 = SuperGlueMatch(vocab_size=VOCAB, embed_dim=EMBED, num_layers=1,
                              sinkhorn_iters=10, dtype=jnp.bfloat16)
        variables = f32.init(jax.random.PRNGKey(0), **args)
        out32 = f32.apply(variables, **args, train=False)
        out16 = bf16.apply(variables, **args, train=False)
        p32 = np.asarray(out32["P"], np.float32)
        p16 = np.asarray(out16["P"], np.float32)
        assert np.all(np.isfinite(p16))
        assert np.abs(p32 - p16).max() < 0.2  # transport probs stay close
        assert out16["offsets"].dtype == jnp.float32 or np.all(
            np.isfinite(np.asarray(out16["offsets"], np.float32)))
