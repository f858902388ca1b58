"""Fused Pallas GNN kernel vs the calibrated eval-mode flax model.

The kernel must reproduce the XLA eval path's score matrix exactly (f32)
for real hint rows, with zero-padded hints masked out, across self/cross
block alternation, per-set BN affines, and the final projection.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2pos_tpu.models.superglue import SuperGlue
from text2pos_tpu.ops.superglue_gnn_pallas import (fold_gnn_params,
                                                  gnn_scores_pallas)

E = 128
T0, T1 = 16, 6
NUM_LAYERS = 3   # self/cross pairs — enough to cover the alternation


@pytest.fixture(scope="module")
def model_and_params():
    """A bn_stat_groups=2 eval-mode SuperGlue with random params and
    random (but structurally valid) calibrated statistics."""
    rng = jax.random.PRNGKey(0)
    model = SuperGlue(descriptor_dim=E, num_layers=NUM_LAYERS,
                      sinkhorn_iterations=5, eval_batch_stats=False,
                      bn_stat_groups=2)
    d0 = jax.random.normal(jax.random.PRNGKey(1), (4, T0, E))
    d1 = jax.random.normal(jax.random.PRNGKey(2), (4, T1, E))
    variables = model.init(rng, d0, d1, train=False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    # Non-trivial per-set statistics (init gives mean 0 / var 1 — that
    # would hide group-selection bugs).
    k = jax.random.PRNGKey(3)
    def randomize(tree):
        leaves, treedef = jax.tree.flatten(tree)
        out = []
        for i, leaf in enumerate(leaves):
            kk = jax.random.fold_in(k, i)
            if leaf.shape[-1:] == (2 * E,) and leaf.ndim == 2:
                out.append(np.asarray(
                    0.3 * jax.random.normal(kk, leaf.shape) + 1.0))
            else:
                out.append(leaf)
        return jax.tree.unflatten(treedef, out)

    stats = randomize(stats)
    # variances must be positive
    stats = jax.tree_util.tree_map_with_path(
        lambda p, v: np.abs(v) + 0.1 if p[-1].key == "var" else v, stats)
    return model, params, stats


class TestFusedGNNScores:
    def _reference_scores(self, model, params, stats, d0, d1):
        """The XLA eval path's pre-Sinkhorn score matrix: recover it from
        log_optimal_transport's input by calling the module internals via
        a scores-only wrapper (same ops, same order)."""
        out = model.apply({"params": params, "batch_stats": stats},
                          d0, d1, train=False)
        # log_P = Z includes the Sinkhorn transport; instead rebuild the
        # raw scores with the module's own submodule weights.
        import flax.linen as nn

        from text2pos_tpu.models.superglue import AttentionalGNN

        names = tuple(["self", "cross"] * NUM_LAYERS)
        gnn = AttentionalGNN(E, names, eval_batch_stats=False,
                             bn_stat_groups=2)
        g0, g1 = gnn.apply(
            {"params": params["gnn"],
             "batch_stats": stats["gnn"]}, d0, d1, train=False)
        wf = params["final_proj"]["kernel"]
        bf = params["final_proj"]["bias"]
        m0, m1 = g0 @ wf + bf, g1 @ wf + bf
        scores = jnp.einsum("bmd,bnd->bmn", m0, m1,
                            preferred_element_type=jnp.float32)
        return out, np.asarray(scores) / np.sqrt(E)

    @pytest.mark.parametrize("compact", [False, True])
    def test_f32_interpret_matches_xla(self, model_and_params, compact):
        model, params, stats = model_and_params
        rng = jax.random.PRNGKey(7)
        N = 5   # deliberately not a multiple of block_n → padding path
        d0 = jax.random.normal(rng, (N, T0, E), jnp.float32)
        d1 = jax.random.normal(jax.random.fold_in(rng, 1), (N, T1, E),
                               jnp.float32)

        _, want = self._reference_scores(model, params, stats, d0, d1)
        folded = fold_gnn_params({"superglue": params},
                                 {"superglue": stats}, NUM_LAYERS)
        got = gnn_scores_pallas(d0, d1, folded, NUM_LAYERS,
                                pairs_per_program=4, dtype=jnp.float32,
                                compact_softmax=compact, interpret=True)
        np.testing.assert_allclose(np.asarray(got), want,
                                   atol=2e-4, rtol=2e-4)

    def test_compact_softmax_equals_full_form(self, model_and_params):
        """The [R, T]-domain softmax (pick/spread via 0/1 matmuls) must
        reproduce the full [R, R] form exactly in f32 — masked entries
        are exact zeros picked injectively, not approximations."""
        model, params, stats = model_and_params
        rng = jax.random.PRNGKey(23)
        d0 = jax.random.normal(rng, (6, T0, E), jnp.float32)
        d1 = jax.random.normal(jax.random.fold_in(rng, 1), (6, T1, E),
                               jnp.float32)
        folded = fold_gnn_params({"superglue": params},
                                 {"superglue": stats}, NUM_LAYERS)
        full = gnn_scores_pallas(d0, d1, folded, NUM_LAYERS,
                                 pairs_per_program=4, dtype=jnp.float32,
                                 compact_softmax=False, interpret=True)
        comp = gnn_scores_pallas(d0, d1, folded, NUM_LAYERS,
                                 pairs_per_program=4, dtype=jnp.float32,
                                 compact_softmax=True, interpret=True)
        np.testing.assert_allclose(np.asarray(comp), np.asarray(full),
                                   atol=1e-5, rtol=1e-5)

    def test_log_p_end_to_end(self, model_and_params):
        """Kernel scores + dustbin + Sinkhorn must reproduce the model's
        log_P (the quantity the pipeline consumes)."""
        from text2pos_tpu.ops.sinkhorn import log_optimal_transport

        model, params, stats = model_and_params
        rng = jax.random.PRNGKey(11)
        N = 4
        d0 = jax.random.normal(rng, (N, T0, E), jnp.float32)
        d1 = jax.random.normal(jax.random.fold_in(rng, 1), (N, T1, E),
                               jnp.float32)
        out = model.apply({"params": params, "batch_stats": stats},
                          d0, d1, train=False)

        folded = fold_gnn_params({"superglue": params},
                                 {"superglue": stats}, NUM_LAYERS)
        scores = gnn_scores_pallas(d0, d1, folded, NUM_LAYERS,
                                   pairs_per_program=4, dtype=jnp.float32,
                                   interpret=True)
        Z = log_optimal_transport(scores, jnp.asarray(params["bin_score"]),
                                  5, impl="xla")
        np.testing.assert_allclose(np.asarray(Z), np.asarray(out["log_P"]),
                                   atol=5e-4, rtol=5e-4)

    def test_bf16_close_to_f32(self, model_and_params):
        model, params, stats = model_and_params
        rng = jax.random.PRNGKey(13)
        d0 = jax.random.normal(rng, (8, T0, E), jnp.float32)
        d1 = jax.random.normal(jax.random.fold_in(rng, 1), (8, T1, E),
                               jnp.float32)
        folded = fold_gnn_params({"superglue": params},
                                 {"superglue": stats}, NUM_LAYERS)
        f32 = gnn_scores_pallas(d0, d1, folded, NUM_LAYERS, pairs_per_program=8,
                                dtype=jnp.float32, interpret=True)
        bf16 = gnn_scores_pallas(d0, d1, folded, NUM_LAYERS, pairs_per_program=8,
                                 dtype=jnp.bfloat16, interpret=True)
        # bf16 bodies, f32 accumulation: relative agreement at the score
        # scale (scores are O(10) after 6 residual blocks).
        err = np.max(np.abs(np.asarray(f32) - np.asarray(bf16)))
        scale = np.max(np.abs(np.asarray(f32)))
        assert err / scale < 0.05, (err, scale)
