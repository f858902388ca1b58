"""Pallas TPU kernel: fully-fused SuperGlue attention GNN (eval mode).

The fine matching stage's 12 alternating self/cross attention blocks are
~80% of serving device time (docs/STATUS.md). The XLA graph streams every
intermediate ([N·22·128] activations per op) through HBM; this kernel
keeps a tile of pose-cell pairs resident in VMEM across ALL blocks, the
final projection and the score matrix — one HBM read of the descriptors,
one HBM write of the [N, T0, T1] score matrix.

Eval-mode only (reference semantics after BN calibration,
evaluation/pipeline.calibrated_for_serving): the GNN BatchNorms are folded
into per-channel affines — per descriptor SET, because the weight-shared
block normalizes objects and hints with separate statistics (reference
superglue.py:141-144) — so the program is purely per-pair and fusable.
Training keeps the XLA path (this kernel has no reverse-mode rule).

Layout: pairs tile the grid; per program desc0/desc1 live as
[P, 16, 128] bf16/f32 VMEM blocks (tokens on sublanes, channels on
lanes). Hints are zero-padded 6 → 16 so both sets share the sublane-exact
[P·16, 128] matmul shape; padded hint rows are re-zeroed after every
block and masked out of every softmax (exp(-1e9 − max) underflows to 0 in
f32, so real rows see exactly the unpadded attention). The per-pair
attention core runs as S static VPU broadcast-reduce steps — einsum
batched matmuls at [T≤16, D=32] shapes would leave the MXU idle — while
all projections and MLPs run as [P·16, 128]·[128, ·] MXU matmuls.

Mirrors /root/reference/models/superglue.py:90-146 (attention blocks) and
:239-266 (final projection + score scaling).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def fold_gnn_params(params: Dict, batch_stats: Dict, num_layers: int,
                    eps: float = 1e-5) -> Dict[str, np.ndarray]:
    """Stack the SuperGlue GNN's per-block weights and fold the calibrated
    BN statistics into per-set affines.

    Expects the calibrated layout (bn_stat_groups=2): batch_stats
    ``superglue/gnn/layer_i/mlp/bn_0`` mean/var of shape [2, 2E].
    Returns f32 arrays; the kernel casts to its compute dtype.
    """
    sg = params["superglue"]
    gnn = sg["gnn"]
    L = 2 * num_layers

    def stack(getter):
        return np.stack([np.asarray(getter(gnn[f"layer_{i}"]), np.float32)
                         for i in range(L)])

    out = {
        "wq": stack(lambda l: l["attn"]["proj_q"]["kernel"]),
        "bq": stack(lambda l: l["attn"]["proj_q"]["bias"]),
        "wk": stack(lambda l: l["attn"]["proj_k"]["kernel"]),
        "bk": stack(lambda l: l["attn"]["proj_k"]["bias"]),
        "wv": stack(lambda l: l["attn"]["proj_v"]["kernel"]),
        "bv": stack(lambda l: l["attn"]["proj_v"]["bias"]),
        "wm": stack(lambda l: l["attn"]["merge"]["kernel"]),
        "bm": stack(lambda l: l["attn"]["merge"]["bias"]),
        "w0": stack(lambda l: l["mlp"]["dense_0"]["kernel"]),
        "w1": stack(lambda l: l["mlp"]["dense_1"]["kernel"]),
        "b1": stack(lambda l: l["mlp"]["dense_1"]["bias"]),
        "wf": np.asarray(sg["final_proj"]["kernel"], np.float32),
        "bf": np.asarray(sg["final_proj"]["bias"], np.float32),
    }

    # BN fold, per set g: y = (x·W0 + b0 − mean_g)·scale/√(var_g+eps) + bias
    #                       = (x·W0)·s_g + t_g
    sb = np.stack([np.asarray(gnn[f"layer_{i}"]["mlp"]["bn_0"]["scale"],
                              np.float32) for i in range(L)])      # [L, 2E]
    bb = np.stack([np.asarray(gnn[f"layer_{i}"]["mlp"]["bn_0"]["bias"],
                              np.float32) for i in range(L)])
    b0 = stack(lambda l: l["mlp"]["dense_0"]["bias"])              # [L, 2E]
    bs = batch_stats["superglue"]["gnn"]
    mean = np.stack([np.asarray(bs[f"layer_{i}"]["mlp"]["bn_0"]["mean"],
                                np.float32) for i in range(L)])    # [L, 2, 2E]
    var = np.stack([np.asarray(bs[f"layer_{i}"]["mlp"]["bn_0"]["var"],
                               np.float32) for i in range(L)])
    if mean.ndim != 3:
        raise ValueError("fold_gnn_params needs bn_stat_groups=2 calibrated "
                         f"stats, got mean shape {mean.shape}")
    inv = sb[:, None, :] / np.sqrt(var + eps)                      # [L, 2, 2E]
    out["s0"] = inv
    out["t0"] = bb[:, None, :] + (b0[:, None, :] - mean) * inv
    return out


PARAM_ORDER = ("wq", "bq", "wk", "bk", "wv", "bv", "wm", "bm",
               "w0", "s0", "t0", "w1", "b1", "wf", "bf")


def _gnn_kernel(d0_ref, d1_ref, wq, bq, wk, bk, wv, bv, wm, bm,
                w0, s0, t0, w1, b1, wf, bf, scores_ref, *,
                num_layers: int, heads: int, t0_pad: int, t1_real: int,
                dtype: jnp.dtype, compact_softmax: bool = False):
    """G pose-cell pairs per program, every tensor rank-2.

    Descriptors arrive flattened to [G·T, E] (pairs stacked along MXU
    rows). The per-pair attention structure lives entirely in a static
    [R, R] mask: each head computes the FULL cross-pair score matrix with
    one [R, E/H]·[E/H, R] contraction, off-(block-)diagonal entries are
    biased to −∞, and a row softmax over all R columns then equals the
    per-pair softmax exactly (masked terms underflow to 0 in f32). This
    keeps the MXU on [R=G·T, ·, ·]-shaped 2D matmuls throughout — per-pair
    batched dots at [T≤16, D=32] run it at <1% utilization, and 4D
    broadcast-reduce forms hit unsupported Mosaic lowerings (both measured
    slower than XLA).
    """
    R, E = d0_ref.shape
    T = t0_pad
    D = E // heads
    f32 = jnp.float32

    rows = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    same_pair = (rows // T) == (cols // T)
    if not compact_softmax:
        hint_col = (cols % T) < t1_real
        bias_obj = jnp.where(same_pair, 0.0, NEG_INF)        # [R, R]
        bias_hint = jnp.where(same_pair & hint_col, 0.0, NEG_INF)
    row1 = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    hmask = ((row1 % T) < t1_real).astype(dtype)             # [R, 1]

    d0 = d0_ref[:].astype(dtype)
    d1 = d1_ref[:].astype(dtype) * hmask

    def mm(x, w, b=None):
        y = jnp.dot(x.astype(w.dtype), w, preferred_element_type=f32)
        if b is not None:
            y = y + b.astype(f32)
        return y

    # Compact-softmax machinery: the expensive per-element work on the
    # full [R, R] cross-pair matrix is cut to two passes (mask-multiply,
    # expand-mask) by moving the softmax itself to the [R, T] per-pair
    # domain. Pick/spread between the domains are MXU matmuls with the
    # static 0/1 collapse matrix: rows of (sc · same_pair) have nonzeros
    # only in their own pair's T columns, each mapping to a distinct
    # compact column, so Σ-collapse picks exactly; the expand spreads
    # each compact column back to every c with c % T == t and the
    # same_pair multiply re-zeroes other pairs' columns.
    if compact_softmax:
        same_pair_f = same_pair.astype(f32)                  # [R, R]
        crow_c = jax.lax.broadcasted_iota(jnp.int32, (R, T), 0)
        ccol_c = jax.lax.broadcasted_iota(jnp.int32, (R, T), 1)
        collapse_f = ((crow_c % T) == ccol_c).astype(f32)    # [R, T] pick
        erow_c = jax.lax.broadcasted_iota(jnp.int32, (T, R), 0)
        ecol_c = jax.lax.broadcasted_iota(jnp.int32, (T, R), 1)
        expand_f = ((ecol_c % T) == erow_c).astype(f32)      # [T, R] spread
        ccol1 = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        cbias_obj = jnp.zeros((1, T), f32)
        cbias_hint = jnp.where(ccol1 < t1_real, 0.0, NEG_INF)  # [1, T]
    inv_sqrt_d = 1.0 / np.sqrt(D)

    def attention_compact(x, src, i, key_cbias):
        q = mm(x, wq[i], bq[i]).astype(dtype)                # [R, E]
        k = mm(src, wk[i], bk[i]).astype(dtype)
        v = mm(src, wv[i], bv[i]).astype(dtype)
        msgs = []
        for h in range(heads):
            sl = slice(h * D, (h + 1) * D)
            sc = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=f32)                  # [R, R]
            sc = sc * same_pair_f                            # 1 full pass
            sc_c = jnp.dot(sc, collapse_f,
                           preferred_element_type=f32)       # [R, T] pick
            sc_c = sc_c * inv_sqrt_d + key_cbias
            pr_c = jax.nn.softmax(sc_c, axis=-1)             # [R, T] f32
            pr = (jnp.dot(pr_c, expand_f,
                          preferred_element_type=f32)
                  * same_pair_f).astype(dtype)               # 2 full passes
            msgs.append(jnp.dot(pr, v[:, sl],
                                preferred_element_type=f32))  # [R, D]
        msg = jnp.concatenate(msgs, axis=-1).astype(dtype)   # [R, E]
        return mm(msg, wm[i], bm[i]).astype(dtype)

    def attention(x, src, i, key_bias):
        q = mm(x, wq[i], bq[i]).astype(dtype)                # [R, E]
        k = mm(src, wk[i], bk[i]).astype(dtype)
        v = mm(src, wv[i], bv[i]).astype(dtype)
        msgs = []
        for h in range(heads):
            sl = slice(h * D, (h + 1) * D)
            sc = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=f32)                  # [R, R]
            sc = sc * (1.0 / np.sqrt(D)) + key_bias
            pr = jax.nn.softmax(sc, axis=-1).astype(dtype)
            msgs.append(jnp.dot(pr, v[:, sl],
                                preferred_element_type=f32))  # [R, D]
        msg = jnp.concatenate(msgs, axis=-1).astype(dtype)   # [R, E]
        return mm(msg, wm[i], bm[i]).astype(dtype)

    def mlp(x, m, g, i):
        h = mm(jnp.concatenate([x, m], axis=-1), w0[i])      # [R, 2E] f32
        h = jnp.maximum(h * s0[i][g] + t0[i][g], 0.0).astype(dtype)
        return mm(h, w1[i], b1[i])

    # fori_loop (not an unrolled Python loop): one block's buffers are
    # live at a time — an unrolled 12-block body overflows the Mosaic
    # stack allocator — and the weight stacks are dynamically indexed.
    def body(i, carry):
        d0, d1 = carry
        cross = (i % 2) == 1
        src0 = jnp.where(cross, d1, d0)
        src1 = jnp.where(cross, d0, d1)
        if compact_softmax:
            cb0 = jnp.where(cross, cbias_hint, cbias_obj)
            cb1 = jnp.where(cross, cbias_obj, cbias_hint)
            m0 = attention_compact(d0, src0, i, cb0)
            m1 = attention_compact(d1, src1, i, cb1)
        else:
            bias0 = jnp.where(cross, bias_hint, bias_obj)
            bias1 = jnp.where(cross, bias_obj, bias_hint)
            m0 = attention(d0, src0, i, bias0)
            m1 = attention(d1, src1, i, bias1)
        d0 = d0 + mlp(d0, m0, 0, i).astype(dtype)
        d1 = (d1 + mlp(d1, m1, 1, i).astype(dtype)) * hmask
        return d0, d1

    d0, d1 = jax.lax.fori_loop(0, 2 * num_layers, body, (d0, d1))

    md0 = mm(d0, wf[...], bf[...]).astype(dtype)             # [R, E]
    md1 = mm(d1, wf[...], bf[...]).astype(dtype)

    # Full cross-pair score matrix; keep each pair's own T×T block by
    # masking off-diagonal blocks and collapsing columns with a constant
    # [R, T] matmul (slice-and-concatenate of diagonal blocks would need
    # lane-offset-mismatched tile concats Mosaic can't lower). Row r has
    # nonzeros only in its pair's T columns, each mapping to a distinct
    # output column — the collapse is exact.
    sc = jax.lax.dot_general(md0, md1, (((1,), (1,)), ((), ())),
                             preferred_element_type=f32) * (1.0 / np.sqrt(E))
    sc = sc * same_pair.astype(f32)
    crow = jax.lax.broadcasted_iota(jnp.int32, (R, T), 0)
    ccol = jax.lax.broadcasted_iota(jnp.int32, (R, T), 1)
    collapse = ((crow % T) == ccol).astype(f32)
    scores_ref[:] = jnp.dot(sc, collapse, preferred_element_type=f32)


def gnn_scores_pallas(desc0: jnp.ndarray, desc1: jnp.ndarray,
                      folded: Dict[str, jnp.ndarray], num_layers: int,
                      heads: int = 4, pairs_per_program: int = 16,
                      dtype: jnp.dtype = jnp.bfloat16,
                      compact_softmax: bool = False,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused GNN + final projection + score matrix.

    Args:
        desc0: [N, T0, E] object descriptors (T0 = pad_size = 16)
        desc1: [N, T1, E] hint descriptors (T1 ≤ T0; zero-padded to T0
               internally)
        folded: fold_gnn_params output
        num_layers: self/cross pairs (total blocks = 2·num_layers)
        pairs_per_program: pairs stacked along the MXU row dim per grid
            step (R = pairs·T0 matmul rows; 16 → R=256)
        dtype: kernel compute dtype (matmul accumulation is always f32)
        compact_softmax: softmax in the [R, T] per-pair domain instead of
            the full [R, R] cross-pair matrix — pick/spread via static
            0/1 MXU matmuls, cutting the per-head full-width VPU passes
            from ~8 (bias add + R-wide softmax pipeline) to 2
            (mask-multiply, expand-mask). Same math: masked entries are
            exact zeros picked injectively, so results match the full
            form bit-for-bit in f32.

    Returns: scores [N, T0, T1] float32 (pre-dustbin, pre-Sinkhorn).
    """
    N, T0, E = desc0.shape
    T1 = desc1.shape[1]
    if T1 < T0:
        desc1 = jnp.concatenate(
            [desc1, jnp.zeros((N, T0 - T1, E), desc1.dtype)], axis=1)
    elif T1 > T0:
        raise ValueError(f"hint set larger than object set: {T1} > {T0}")

    G = min(pairs_per_program, max(N, 1))
    pad = (-N) % G
    if pad:
        desc0 = jnp.concatenate(
            [desc0, jnp.zeros((pad, T0, E), desc0.dtype)], axis=0)
        desc1 = jnp.concatenate(
            [desc1, jnp.zeros((pad, T0, E), desc1.dtype)], axis=0)
    Np = desc0.shape[0]
    R = G * T0
    d0_2d = desc0.reshape(Np * T0, E)
    d1_2d = desc1.reshape(Np * T0, E)

    # Matmul weight stacks live in VMEM for all 2L blocks — store them in
    # the compute dtype (f32 stacks alone would be ~13 MB at L=12).
    MATMUL_W = {"wq", "wk", "wv", "wm", "w0", "w1", "wf"}
    weights = [jnp.asarray(folded[k], dtype if k in MATMUL_W else jnp.float32)
               for k in PARAM_ORDER]
    w_specs = [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                            memory_space=pltpu.VMEM) for w in weights]

    L = 2 * num_layers
    flops_proj = 4 * 2 * T0 * E * E * 2          # q,k,v,merge for both sets
    flops_mlp = 2 * T0 * (2 * E * 2 * E + 2 * E * E) * 2
    flops_core = 2 * 2 * T0 * (G * T0) * E * 2   # full cross-pair matrices
    out = pl.pallas_call(
        functools.partial(_gnn_kernel, num_layers=num_layers, heads=heads,
                          t0_pad=T0, t1_real=T1, dtype=dtype,
                          compact_softmax=compact_softmax),
        grid=(Np // G,),
        in_specs=[
            pl.BlockSpec((R, E), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, E), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec((R, T0), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np * T0, T0), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # The default 16 MB scoped-vmem cap is a compiler default, not
            # the physical v5e VMEM (128 MB); the resident weight stacks
            # (~7 MB bf16 at L=12) plus the activation tiles need more
            # headroom than the default allows.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(Np) * (L * (flops_proj + flops_mlp + flops_core)
                             + 2 * T0 * E * E * 2 + T0 * T0 * E * 2),
            bytes_accessed=2 * Np * T0 * E * 2 + Np * T0 * T0 * 4,
            transcendentals=int(Np) * L * 2 * T0 * (G * T0) * heads,
        ),
        interpret=interpret,
    )(d0_2d, d1_2d, *weights)
    return out.reshape(Np, T0, T0)[:N, :, :T1]
