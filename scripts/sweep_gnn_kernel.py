"""Sweep the fused Pallas GNN kernel's pairs-per-program at serving scale.

The kernel's cross-pair-masked attention does softmax/mask work on
[G·T, G·T] matrices — VPU cost grows with G² while MXU row utilization
grows with G. This sweeps G to find the crossover against the XLA
broadcast-reduce graph (docs/STATUS.md: 61 ms at N=20480).

Usage: python scripts/sweep_gnn_kernel.py [--n 20480] [--iters 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20480)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--pairs", type=int, nargs="*", default=[4, 8, 16, 32])
    ap.add_argument("--embed", type=int, default=128)
    ap.add_argument("--layers", type=int, default=6)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/t2p_jax_cache")

    from text2pos_tpu.ops.superglue_gnn_pallas import (
        PARAM_ORDER, gnn_scores_pallas)

    E, L = args.embed, 2 * args.layers
    rng = np.random.default_rng(0)
    f = lambda *s: rng.normal(size=s).astype(np.float32) * 0.1
    folded = {
        "wq": f(L, E, E), "bq": f(L, E), "wk": f(L, E, E), "bk": f(L, E),
        "wv": f(L, E, E), "bv": f(L, E), "wm": f(L, E, E), "bm": f(L, E),
        "w0": f(L, 2 * E, 2 * E), "s0": np.abs(f(L, 2, 2 * E)) + 0.5,
        "t0": f(L, 2, 2 * E), "w1": f(L, 2 * E, E), "b1": f(L, E),
        "wf": f(E, E), "bf": f(E),
    }
    folded = {k: jnp.asarray(v) for k, v in folded.items()}
    assert set(folded) == set(PARAM_ORDER)

    N = args.n
    d0s = [jnp.asarray(f(N, 16, E), jnp.bfloat16) for _ in range(args.iters + 1)]
    d1s = [jnp.asarray(f(N, 6, E), jnp.bfloat16) for _ in range(args.iters + 1)]
    jax.block_until_ready((d0s, d1s))

    for compact in (False, True):
        for G in args.pairs:
            fn = jax.jit(lambda a, b, G=G, c=compact: gnn_scores_pallas(
                a, b, folded, args.layers, pairs_per_program=G,
                dtype=jnp.bfloat16, compact_softmax=c))
            try:
                out = fn(d0s[-1], d1s[-1])
                jax.block_until_ready(out)
            except Exception as e:  # noqa: BLE001
                print(f"G={G:3d} compact={int(compact)}: FAILED "
                      f"{type(e).__name__}: {e}", flush=True)
                continue
            t0 = time.time()
            outs = [fn(a, b)
                    for a, b in zip(d0s[: args.iters], d1s[: args.iters])]
            jax.block_until_ready(outs)
            ms = (time.time() - t0) / args.iters * 1e3
            print(f"G={G:3d} compact={int(compact)}: {ms:7.1f} ms   "
                  f"(N={N}, E={E}, 2L={L})", flush=True)


if __name__ == "__main__":
    main()
