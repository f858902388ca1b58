"""Pallas TPU kernel: length-masked LSTM recurrence in one program.

The XLA ``lax.scan`` LSTM (ops/lstm.py) issues T sequential small
dispatches; at serving shapes (text: T=64, B=2048, H=256) the scan is
dispatch-latency-bound — measured ~15 ms against <1 ms of matmul work.
This kernel runs the whole recurrence as one grid: batch tiles × time
steps, with the hidden/cell state resident in VMEM scratch across the
time dimension (scratch persists across grid steps; the state is reset at
t=0 of every batch tile). The per-step input projections x·W_ih + b are
precomputed as one big MXU matmul (as in the XLA path) and streamed one
timestep block at a time.

Forward-only (no VJP): training differentiates the XLA scan —
``ops.lstm.bilstm_final_hidden`` wires this kernel in through
``jax.custom_vjp`` so gradients transparently fall back.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_kernel(xp_ref, valid_ref, whh_ref, h_out_ref, h_scr, c_scr):
    t = pl.program_id(1)
    f32 = jnp.float32

    @pl.when(t == 0)
    def _reset():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    h = h_scr[:]
    gates = xp_ref[0].astype(f32) + jnp.dot(
        h.astype(whh_ref.dtype), whh_ref[:], preferred_element_type=f32)
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
    f = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
    c_new = f * c_scr[:] + i * g
    h_new = o * jnp.tanh(c_new)

    # valid is resident for the whole batch tile as [Tpad, Bb] (a per-step
    # (1, Bb) block would violate the sublane tiling rule); pick row t with
    # a dynamic sublane slice and lay it along the batch rows.
    v = jnp.transpose(valid_ref[pl.ds(t, 1), :]).astype(f32)   # [Bb, 1]
    h_scr[:] = v * h_new + (1.0 - v) * h_scr[:]
    c_scr[:] = v * c_new + (1.0 - v) * c_scr[:]
    # Rewritten every step for this batch tile; the block flushes to HBM
    # when the tile changes, so the last timestep's state is what lands.
    h_out_ref[:] = h_scr[:]


def lstm_final_hidden_pallas(x_proj: jnp.ndarray, w_hh: jnp.ndarray,
                             step_valid: jnp.ndarray, block_b: int = 512,
                             interpret: bool = False) -> jnp.ndarray:
    """Final hidden state of a gated LSTM over precomputed projections.

    Same contract as ``ops.lstm._lstm_scan`` (returns h only):
        x_proj:     [T, B, 4H] input projections (+bias already added)
        w_hh:       [H, 4H]
        step_valid: [T, B] bool/int — step t within sequence b
    Returns: h [B, H] float32.
    """
    T, B, H4 = x_proj.shape
    H = H4 // 4

    block_b = min(block_b, max(B, 8))
    pad = (-B) % block_b
    if pad:
        x_proj = jnp.concatenate(
            [x_proj, jnp.zeros((T, pad, H4), x_proj.dtype)], axis=1)
        step_valid = jnp.concatenate(
            [step_valid, jnp.zeros((T, pad), step_valid.dtype)], axis=1)
    Bp = x_proj.shape[1]
    valid = step_valid.astype(jnp.float32)
    t_pad = (-T) % 8
    if t_pad:  # sublane-tile the resident [Tpad, B] validity plane
        valid = jnp.concatenate(
            [valid, jnp.zeros((t_pad, Bp), valid.dtype)], axis=0)
    Tp = valid.shape[0]

    h = pl.pallas_call(
        _lstm_kernel,
        grid=(Bp // block_b, T),
        in_specs=[
            pl.BlockSpec((1, block_b, H4), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tp, block_b), lambda b, t: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, H), lambda b, t: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * Bp * H * H4,
            bytes_accessed=T * Bp * H4 * x_proj.dtype.itemsize + Bp * H * 4,
            transcendentals=4 * T * Bp * H,
        ),
        interpret=interpret,
    )(x_proj, valid, w_hh)
    return h[:B]


def bilstm_final_hidden_pallas(x: jnp.ndarray, lengths: jnp.ndarray,
                               fwd, bwd, block_b: int = 512,
                               interpret: bool = False) -> jnp.ndarray:
    """Pallas twin of ``ops.lstm.bilstm_final_hidden`` (forward only)."""
    B, T, E = x.shape
    t_idx = jnp.arange(T)
    valid = (t_idx[None, :] < lengths[:, None])
    xt = jnp.swapaxes(x, 0, 1)                          # [T, B, E]
    proj_f = xt @ fwd.w_ih + fwd.b
    proj_b = (xt @ bwd.w_ih + bwd.b)[::-1]
    valid_t = jnp.swapaxes(valid, 0, 1)

    h_f = lstm_final_hidden_pallas(proj_f, fwd.w_hh, valid_t,
                                   block_b, interpret)
    h_b = lstm_final_hidden_pallas(proj_b, bwd.w_hh, valid_t[::-1],
                                   block_b, interpret)
    return (0.5 * (h_f + h_b)).astype(x.dtype)
