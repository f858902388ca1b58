"""sharded_topk_retrieval ≡ topk_retrieval on the virtual 8-device mesh.

The DB-sharded distributed-MIPS path (local top-k per shard, all-gather
+ merge — ops/retrieval.py) must return exactly the single-device result
for any cell count, including ones that don't divide the mesh size.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest

from text2pos_tpu.ops.retrieval import sharded_topk_retrieval, topk_retrieval
from text2pos_tpu.parallel.dp import make_mesh

D = 8


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < D:
        pytest.skip(f"needs {D} devices")
    return make_mesh(D)


def _encodings(rng, q, c, e):
    t = rng.standard_normal((q, e)).astype(np.float32)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    db = rng.standard_normal((c, e)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    return t, db


@pytest.mark.parametrize("C", [64, 61, 9])  # divisible / padded / C < D·k
def test_matches_single_device(mesh, C):
    rng = np.random.default_rng(0)
    text, cells = _encodings(rng, q=16, c=C, e=32)
    k = min(5, C)
    want_s, want_i = jax.device_get(topk_retrieval(
        jax.numpy.asarray(text), jax.numpy.asarray(cells), k))
    got_s, got_i = jax.device_get(sharded_topk_retrieval(
        jax.numpy.asarray(text), jax.numpy.asarray(cells), k, mesh))
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-6, atol=1e-6)


def test_padded_dummies_never_win(mesh):
    # C=9 over 8 shards → 7 shards hold 1-2 real cells + padding; every
    # returned index must still be a real cell.
    rng = np.random.default_rng(1)
    text, cells = _encodings(rng, q=4, c=9, e=16)
    _, idx = jax.device_get(sharded_topk_retrieval(
        jax.numpy.asarray(text), jax.numpy.asarray(cells), 9, mesh))
    assert idx.min() >= 0 and idx.max() < 9
    assert all(len(set(row.tolist())) == 9 for row in idx)
