"""Pallas TPU kernel: fused separable PointConv set-abstraction (eval mode).

Fuses one whole SA level — pairwise distances, ball membership, first-K-by-
index selection, the two-layer PointConv MLP (BatchNorm affines folded by
the caller) and the masked max — into a single VMEM-resident kernel:

    out[b, s, :] = max over the first K in-ball points n of
                   relu( relu(a'[b, n] − c'[b, s]) @ W2' + b2' )

where a' and c' carry the separable first layer + folded BN1, and W2'/b2'
carry dense_1 + folded BN2 (see models/pointnet2.py for the algebra).

Compared to the XLA formulation (which materializes the [B,S,K,N] selection
tensor and the [B,S,K,C] gathered features in HBM), this kernel streams
N-chunks of the point projections through VMEM and accumulates the running
max — no selection tensor, no neighbor tensor, two HBM reads (a', pos) and
one write (out) per level.

Gradients are not defined (eval/serving only); training uses the XLA path.

Status: EXPERIMENTAL, not the default. Measured honestly on v5e at
[1536 objects x 256 points] the kernel runs ~77 ms per full PointNet eval
vs ~60 ms for the rank-select one-hot einsum formulation in
models/pointnet2.py: streaming all N candidates through the pairwise MLP
costs ~(N/K)=8x the MXU FLOPs of selecting K=32 neighbors first, and at
these channel widths (32-256) the saved gather/selection traffic does not
pay for that. Kept as the starting point for wider-channel variants and as
a worked example of the VMEM-streaming pattern; equivalence is tested in
interpret mode (tests/test_pointconv_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _kernel(a_ref, pos_ref, c_ref, cent_ref, w2_ref, b2_ref, out_ref, *,
            radius: float, k_cap: int, n_chunk: int):
    S_t = c_ref.shape[1]
    N, C1 = a_ref.shape[1], a_ref.shape[2]
    C2 = w2_ref.shape[1]

    # Ball membership + exclusive rank over the full N row.
    cent = cent_ref[0]                                     # [S_t, 3]
    pos = pos_ref[0]                                       # [N, 3]
    d2 = (jnp.sum(cent * cent, axis=1, keepdims=True)
          - 2.0 * jnp.dot(cent, pos.T, preferred_element_type=jnp.float32)
          + jnp.sum(pos * pos, axis=1)[None, :])           # [S_t, N]
    in_ball = d2 <= radius * radius
    # Exclusive prefix sum as a strictly-lower-triangular matmul (cumsum has
    # no Mosaic lowering; the MXU does this in one pass anyway).
    row = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    tri = (row < col).astype(jnp.float32)                  # [N, N]
    rank = jnp.dot(in_ball.astype(jnp.float32), tri,
                   preferred_element_type=jnp.float32)     # [S_t, N]
    mask_f = (in_ball & (rank < k_cap)).astype(jnp.float32)  # [S_t, N]

    c = c_ref[0]                                           # [S_t, C1]
    w2 = w2_ref[:]
    b2 = b2_ref[:]

    # Static unroll over N chunks (≤ 4 at these sizes): Mosaic has no
    # dynamic_slice on values, and static slices fold into the layout.
    acc = jnp.full((S_t, C2), _NEG, jnp.float32)
    for i in range(N // n_chunk):
        a_t = a_ref[0, i * n_chunk : (i + 1) * n_chunk, :]  # [NT, C1]
        h1 = jnp.maximum(a_t[None, :, :] - c[:, None, :], 0.0)  # [S_t,NT,C1]
        h2 = jax.lax.dot_general(
            h1.reshape(S_t * n_chunk, C1), w2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(S_t, n_chunk, C2) + b2[None, None, :]
        h2 = jnp.maximum(h2, 0.0)
        # Additive f32 penalty instead of a boolean where: Mosaic cannot
        # broadcast i1 along a new minor dimension.
        penalty = (1.0 - mask_f[:, i * n_chunk : (i + 1) * n_chunk]) * _NEG
        h2 = h2 + penalty[:, :, None]
        acc = jnp.maximum(acc, jnp.max(h2, axis=1))

    out_ref[0] = jnp.where(acc > _NEG / 2, acc, 0.0)


def separable_pointconv_max(a: jnp.ndarray, pos: jnp.ndarray, c: jnp.ndarray,
                            cent: jnp.ndarray, w2: jnp.ndarray,
                            b2: jnp.ndarray, radius: float, k_cap: int,
                            s_tile: int = 32, n_chunk: int = 64,
                            interpret: bool = False) -> jnp.ndarray:
    """Fused SA level.

    Args:
        a:    [B, N, C1] per-point projections (BN1 affine folded in)
        pos:  [B, N, 3]  point positions
        c:    [B, S, C1] per-centroid projections (BN1 affine folded in)
        cent: [B, S, 3]  centroid positions
        w2:   [C1, C2]   dense_1 kernel with BN2 scale folded
        b2:   [C2]       dense_1 bias with BN2 affine folded
        radius, k_cap: ball radius and neighbor cap (PyG semantics)

    Returns:
        [B, S, C2] masked-max PointConv features.
    """
    B, N, C1 = a.shape
    S = c.shape[1]
    C2 = w2.shape[1]
    s_tile = min(s_tile, S)
    assert S % s_tile == 0, (S, s_tile)
    n_chunk = min(n_chunk, N)
    assert N % n_chunk == 0, (N, n_chunk)

    grid = (B, S // s_tile)
    return pl.pallas_call(
        functools.partial(_kernel, radius=radius, k_cap=k_cap,
                          n_chunk=n_chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, C1), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 3), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, C1), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, 3), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C1, C2), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C2,), lambda b, s: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_tile, C2), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, C2), jnp.float32),
        interpret=interpret,
    )(a, pos, c, cent, w2, b2)
