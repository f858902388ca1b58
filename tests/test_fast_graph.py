"""Serving fast graph (fused q/k/v + concat-free block MLPs): same
parameter tree, same math as the standard modules up to f32
reassociation rounding."""

import jax
import jax.numpy as jnp
import numpy as np

from text2pos_tpu.models.superglue import SuperGlue


def _build(fast):
    return SuperGlue(descriptor_dim=32, num_layers=2,
                     sinkhorn_iterations=10, eval_batch_stats=True,
                     fast_graph=fast)


class TestFastGraph:
    def test_same_param_tree_and_close_outputs(self):
        rng = jax.random.PRNGKey(0)
        d0 = jax.random.normal(jax.random.fold_in(rng, 1), (6, 8, 32))
        d1 = jax.random.normal(jax.random.fold_in(rng, 2), (6, 5, 32))

        std, fast = _build(False), _build(True)
        v_std = std.init(rng, d0, d1, train=False)
        v_fast = fast.init(rng, d0, d1, train=False)
        std_leaves = {jax.tree_util.keystr(p): l.shape for p, l in
                      jax.tree_util.tree_flatten_with_path(dict(v_std))[0]}
        fast_leaves = {jax.tree_util.keystr(p): l.shape for p, l in
                       jax.tree_util.tree_flatten_with_path(dict(v_fast))[0]}
        assert std_leaves == fast_leaves

        out_std = std.apply(v_std, d0, d1, train=False)
        out_fast = fast.apply(v_std, d0, d1, train=False)
        np.testing.assert_allclose(np.asarray(out_fast["log_P"]),
                                   np.asarray(out_std["log_P"]),
                                   atol=2e-5, rtol=2e-5)
        # Hard matches may only differ on exact threshold ties.
        same = np.mean(np.asarray(out_fast["matches0"])
                       == np.asarray(out_std["matches0"]))
        assert same >= 0.99

    def test_bf16_path_close(self):
        rng = jax.random.PRNGKey(3)
        d0 = jax.random.normal(jax.random.fold_in(rng, 1), (4, 8, 32))
        d1 = jax.random.normal(jax.random.fold_in(rng, 2), (4, 5, 32))
        std = SuperGlue(descriptor_dim=32, num_layers=2,
                        sinkhorn_iterations=10, eval_batch_stats=True,
                        dtype=jnp.bfloat16)
        fast = std.clone(fast_graph=True)
        v = std.init(rng, d0, d1, train=False)
        a = std.apply(v, d0, d1, train=False)["log_P"]
        b = fast.apply(v, d0, d1, train=False)["log_P"]
        np.testing.assert_allclose(np.asarray(b, np.float32),
                                   np.asarray(a, np.float32),
                                   atol=0.15, rtol=0.15)
