"""Length-masked bidirectional LSTM as a ``lax.scan``.

TPU-native replacement for the reference's cuDNN packed-sequence LSTM
(/root/reference/models/modules.py:48-91). Packed sequences do not exist in
XLA; instead we scan over a padded [T, B, E] buffer and gate the carry with
per-step validity so the final hidden state of each sequence equals the
hidden state at its true last token:

 - forward direction: carry updates only while t < len, so after the scan
   the carry holds h_{len-1};
 - backward direction: scan t = T-1 … 0 with the same gate, so steps beyond
   each sequence's length are skipped and the carry ends as the backward
   LSTM's final state over x_{len-1} … x_0 — exactly the packed semantics.

The per-step matmuls are [B, E]×[E, 4E], batched over the whole batch; the
input projection for all timesteps is hoisted out of the scan as one
[T·B, E]×[E, 4E] MXU matmul.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class LSTMParams(NamedTuple):
    """Weights of a single-direction LSTM (gate order: i, f, g, o)."""

    w_ih: jnp.ndarray  # [E, 4H]
    w_hh: jnp.ndarray  # [H, 4H]
    b: jnp.ndarray     # [4H]


def _lstm_scan(x_proj: jnp.ndarray, params: LSTMParams, step_valid: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run a gated LSTM scan.

    Args:
        x_proj:     [T, B, 4H] pre-computed input projections (+ bias)
        params:     LSTM weights (w_hh used inside the scan)
        step_valid: [T, B] bool — whether step t is within sequence b

    Returns:
        final (h, c), each [B, H].
    """
    T, B, H4 = x_proj.shape
    H = H4 // 4

    def step(carry, inp):
        h, c = carry
        xp, valid = inp
        gates = xp + h @ params.w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        v = valid[:, None]
        h = jnp.where(v, h_new, h)
        c = jnp.where(v, c_new, c)
        return (h, c), None

    h0 = jnp.zeros((B, H), x_proj.dtype)
    c0 = jnp.zeros((B, H), x_proj.dtype)
    (h, c), _ = jax.lax.scan(step, (h0, c0), (x_proj, step_valid))
    return h, c


def _bilstm_xla(x: jnp.ndarray, lengths: jnp.ndarray,
                fwd: LSTMParams, bwd: LSTMParams) -> jnp.ndarray:
    B, T, E = x.shape
    t_idx = jnp.arange(T)
    valid = t_idx[None, :] < lengths[:, None]          # [B, T]

    xt = jnp.swapaxes(x, 0, 1)                          # [T, B, E]
    proj_f = xt @ fwd.w_ih + fwd.b                      # hoisted MXU matmul
    proj_b = xt @ bwd.w_ih + bwd.b
    valid_t = jnp.swapaxes(valid, 0, 1)                 # [T, B]

    h_f, _ = _lstm_scan(proj_f, fwd, valid_t)
    h_b, _ = _lstm_scan(proj_b[::-1], bwd, valid_t[::-1])
    return 0.5 * (h_f + h_b)


@jax.custom_vjp
def _bilstm_fused(x, lengths_f, fwd, bwd):
    """Pallas-recurrence forward; gradients transparently fall back to the
    XLA scan (custom_vjp: the primal runs only when not differentiating).
    ``lengths_f`` is float so every primal argument has float cotangents."""
    from text2pos_tpu.ops.lstm_pallas import bilstm_final_hidden_pallas

    return bilstm_final_hidden_pallas(x, lengths_f.astype(jnp.int32),
                                      fwd, bwd)


def _bilstm_fused_fwd(x, lengths_f, fwd, bwd):
    lengths = lengths_f.astype(jnp.int32)
    out, vjp = jax.vjp(lambda xx, f, b: _bilstm_xla(xx, lengths, f, b),
                       x, fwd, bwd)
    return out, (vjp, lengths_f)


def _bilstm_fused_bwd(res, g):
    vjp, lengths_f = res
    dx, dfwd, dbwd = vjp(g)
    return dx, jnp.zeros_like(lengths_f), dfwd, dbwd


_bilstm_fused.defvjp(_bilstm_fused_fwd, _bilstm_fused_bwd)


def bilstm_final_hidden(x: jnp.ndarray, lengths: jnp.ndarray,
                        fwd: LSTMParams, bwd: LSTMParams,
                        impl: str = "auto") -> jnp.ndarray:
    """Final hidden states of a 1-layer bidirectional LSTM, averaged.

    Matches ``torch.mean(h, dim=0)`` over the two directions' final states
    (reference modules.py:89-90).

    Args:
        x:       [B, T, E] embedded tokens (padded with anything past length)
        lengths: [B] int true sequence lengths (≥ 1)
        impl:    "auto" (Pallas recurrence kernel on TPU — the T-step scan
                 is dispatch-latency-bound, measured ~15 ms vs <2 ms at
                 serving shapes — with XLA gradients via custom_vjp) or
                 "xla" (pure scan).

    Returns:
        [B, H] mean of forward/backward final hidden states.
    """
    if impl == "auto" and jax.default_backend() == "tpu":
        return _bilstm_fused(x, lengths.astype(jnp.float32), fwd, bwd)
    return _bilstm_xla(x, lengths, fwd, bwd)
