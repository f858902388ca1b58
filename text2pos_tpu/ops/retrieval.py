"""Batched on-device top-k retrieval.

Replaces the reference's per-query host loop of numpy matmul + argsort
(/root/reference/training/coarse.py:134-158) with one [Q, E] × [E, C] MXU
matmul and ``lax.top_k`` — the whole retrieval stage is a single fused XLA
program.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


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
