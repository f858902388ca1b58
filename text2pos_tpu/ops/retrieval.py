"""Batched on-device top-k retrieval.

Replaces the reference's per-query host loop of numpy matmul + argsort
(/root/reference/training/coarse.py:134-158) with one [Q, E] × [E, C] MXU
matmul and ``lax.top_k`` — the whole retrieval stage is a single fused XLA
program. ``sharded_topk_retrieval`` additionally shards the cell database
over a device mesh (local top-k per shard, all-gather + merge) for maps
too large for one chip's HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax.shard_map is the stable home since 0.8 (check_rep → check_vma)
    from jax import shard_map as _shard_map

    def _smap(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def _smap(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)


def topk_retrieval(text_encodings: jnp.ndarray, cell_encodings: jnp.ndarray,
                   k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k database cells per query by dot-product score.

    Args:
        text_encodings: [Q, E] (already L2-normalized by the model)
        cell_encodings: [C, E]
        k: static retrieval depth

    Returns:
        scores [Q, k] (descending) and indices [Q, k] into C.
    """
    scores = jnp.einsum(
        "qe,ce->qc", text_encodings, cell_encodings,
        preferred_element_type=jnp.float32,
    )
    top_scores, top_idx = jax.lax.top_k(scores, k)
    return top_scores, top_idx.astype(jnp.int32)


def sharded_topk_retrieval(text_encodings: jnp.ndarray,
                           cell_encodings: jnp.ndarray, k: int,
                           mesh: Mesh, axis: str = "dp"
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k retrieval with the cell database SHARDED over ``mesh``.

    The standard distributed MIPS pattern: each device scores all queries
    against its local DB shard ([Q, E] × [E, C/D] on the MXU), takes a
    local top-k, then the k candidates per shard ride one ``all_gather``
    over ICI and a [Q, D·k] merge top-k picks the global winners. Only
    D·k score/index pairs per query cross the interconnect — never the
    full [Q, C] score matrix — so the DB can exceed a single chip's HBM.

    Returns the same (scores [Q, k], indices [Q, k]) as
    :func:`topk_retrieval`; exact index agreement is asserted by
    ``__graft_entry__.dryrun_multichip`` and tests/test_dp_equivalence.py.

    The cell count is padded up to a multiple of the mesh size with
    ``-inf``-scored dummies, so any C works.
    """
    D = mesh.devices.size
    C = cell_encodings.shape[0]
    assert C >= k, (C, k)
    pad = (-C) % D
    if pad:
        cell_encodings = jnp.concatenate(
            [cell_encodings,
             jnp.zeros((pad, cell_encodings.shape[1]),
                       cell_encodings.dtype)])
    shard = (C + pad) // D

    @partial(_smap, mesh=mesh, in_specs=(P(), P(axis, None)),
             out_specs=(P(), P()))
    def _retrieve(text, cells):
        local_scores = jnp.einsum("qe,ce->qc", text, cells,
                                  preferred_element_type=jnp.float32)
        offset = jax.lax.axis_index(axis) * shard
        gidx = offset + jnp.arange(shard, dtype=jnp.int32)
        local_scores = jnp.where(gidx[None, :] < C, local_scores, -jnp.inf)
        # A shard can hold fewer than k cells; D·min(k, shard) ≥ C ≥ k
        # candidates still reach the merge.
        v, i = jax.lax.top_k(local_scores, min(k, shard))  # [Q, k'] / shard
        gi = gidx[i]                                # global cell indices
        vg = jax.lax.all_gather(v, axis, axis=1, tiled=True)   # [Q, D·k']
        ig = jax.lax.all_gather(gi, axis, axis=1, tiled=True)
        vv, sel = jax.lax.top_k(vg, k)
        return vv, jnp.take_along_axis(ig, sel, axis=1)

    dbs = jax.device_put(cell_encodings,
                         NamedSharding(mesh, P(axis, None)))
    scores, idx = _retrieve(jnp.asarray(text_encodings), dbs)
    return scores, idx.astype(jnp.int32)
