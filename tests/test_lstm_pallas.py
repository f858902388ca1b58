"""Pallas LSTM recurrence kernel vs the XLA scan (ops/lstm.py).

The kernel must reproduce the scan's length-masked packed-sequence
semantics exactly: final hidden state at each sequence's true last token,
batch tiling + padding, both directions, and the custom_vjp wiring must
leave gradients identical to the XLA path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2pos_tpu.ops.lstm import LSTMParams, _bilstm_xla, bilstm_final_hidden
from text2pos_tpu.ops.lstm_pallas import (bilstm_final_hidden_pallas,
                                          lstm_final_hidden_pallas)


def _params(rng, E, H):
    k1, k2, k3 = jax.random.split(rng, 3)
    s = 1.0 / np.sqrt(H)
    return LSTMParams(
        w_ih=jax.random.uniform(k1, (E, 4 * H), minval=-s, maxval=s),
        w_hh=jax.random.uniform(k2, (H, 4 * H), minval=-s, maxval=s),
        b=jax.random.uniform(k3, (4 * H,), minval=-s, maxval=s),
    )


class TestLSTMPallas:
    @pytest.mark.parametrize("B,T,E,block", [(10, 7, 16, 4), (33, 12, 8, 32)])
    def test_bilstm_matches_xla_scan(self, B, T, E, block):
        rng = jax.random.PRNGKey(0)
        fwd = _params(jax.random.fold_in(rng, 1), E, E)
        bwd = _params(jax.random.fold_in(rng, 2), E, E)
        x = jax.random.normal(jax.random.fold_in(rng, 3), (B, T, E))
        lengths = jax.random.randint(jax.random.fold_in(rng, 4), (B,), 1,
                                     T + 1)

        want = np.asarray(_bilstm_xla(x, lengths, fwd, bwd))
        got = np.asarray(bilstm_final_hidden_pallas(
            x, lengths, fwd, bwd, block_b=block, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_single_direction_masking(self):
        """Steps past each length must not advance the carry: doubling T
        with garbage past the lengths changes nothing."""
        rng = jax.random.PRNGKey(5)
        B, T, E = 6, 5, 8
        p = _params(rng, E, E)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (T, B, E))
        xp = x @ p.w_ih + p.b
        lengths = jnp.asarray([1, 2, 3, 4, 5, 3])
        valid = (jnp.arange(T)[:, None] < lengths[None, :])

        h1 = lstm_final_hidden_pallas(xp, p.w_hh, valid, block_b=8,
                                      interpret=True)
        garbage = jax.random.normal(jax.random.fold_in(rng, 2), (T, B, 4 * E))
        xp2 = jnp.concatenate([xp, garbage], axis=0)
        valid2 = jnp.concatenate([valid, jnp.zeros((T, B), bool)], axis=0)
        h2 = lstm_final_hidden_pallas(xp2, p.w_hh, valid2, block_b=8,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                                   atol=1e-6)

    def test_custom_vjp_gradients_match_xla(self):
        """grad through the fused entry equals grad through the pure XLA
        path (the custom_vjp backward recomputes via the scan)."""
        rng = jax.random.PRNGKey(9)
        B, T, E = 5, 6, 8
        fwd = _params(jax.random.fold_in(rng, 1), E, E)
        bwd = _params(jax.random.fold_in(rng, 2), E, E)
        x = jax.random.normal(jax.random.fold_in(rng, 3), (B, T, E))
        lengths = jnp.asarray([2, 6, 3, 1, 4])

        from text2pos_tpu.ops.lstm import _bilstm_fused

        def loss_fused(xx):
            return jnp.sum(_bilstm_fused(xx, lengths.astype(jnp.float32),
                                         fwd, bwd) ** 2)

        def loss_xla(xx):
            return jnp.sum(_bilstm_xla(xx, lengths, fwd, bwd) ** 2)

        # On CPU the fused primal would need interpret mode, but the VJP
        # never runs the Pallas kernel — only the XLA recompute.
        g_fused = jax.grad(loss_fused)(x)
        g_xla = jax.grad(loss_xla)(x)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_xla),
                                   atol=1e-6)
