"""Decompose the fine stage's device time at serving shapes (VERDICT r4
item 2: re-open the 13% MFU / "bandwidth wall" claim with measurements).

Times each subprogram of the fine matching pass separately at a given
(batch, K) shape, with XLA post-fusion cost analysis (FLOPs + HBM bytes)
per piece, and compares the fused Pallas GNN kernel (both softmax forms,
G sweep) against the XLA graph — measured device time AND measured
bytes, not cost models.

Run (TPU): python scripts/profile_fine_stage.py [--batch 256 --k 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # noqa: E402


def timed(fn, args_list, warm=1):
    import jax

    for _ in range(warm):
        out = fn(*args_list[-1])
    jax.block_until_ready(out)
    t0 = time.time()
    for a in args_list[:-1]:
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / max(len(args_list) - 1, 1) * 1000.0


def cost_of(fn, *args):
    import jax

    try:
        exe = jax.jit(fn).lower(*args).compile()
        ca = exe.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0)), float(ca.get("bytes accessed", 0))
    except Exception as e:
        print(f"# cost_of failed: {e!r}", flush=True)
        return 0.0, 0.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--gs", type=int, nargs="*", default=[8, 16, 32])
    ap.add_argument("--skip_pallas", action="store_true")
    args = ap.parse_args()

    bench._require_backend(float(os.environ.get("T2P_BENCH_INIT_TIMEOUT",
                                                600)))
    import functools

    import jax
    import jax.numpy as jnp

    bench._enable_compile_cache()
    pipe, loader, poses, vocab, trained = bench.build()
    bank = loader.bank

    from text2pos_tpu.data.hints import create_hint_description
    from text2pos_tpu.ops.retrieval import topk_retrieval

    H, Th = pipe.cfg.num_mentioned, pipe.cfg.max_hint_len
    Q = args.batch
    hint_tokens = np.zeros((Q, H, Th), np.int32)
    hint_lengths = np.ones((Q, H), np.int32)
    for i, p in enumerate(poses[:Q]):
        tk, ln = vocab.encode_batch(create_hint_description(p)[:H], Th)
        hint_tokens[i, : len(tk)] = tk
        hint_lengths[i, : len(ln)] = ln

    db_key = bench._db_cache_key() if trained else None
    db_cached = bench._load_db_cache(db_key) if db_key else None
    bank_dev = {k: jnp.asarray(getattr(bank, k)) for k in (
        "points_xyz", "points_rgb", "point_count", "centers", "colors",
        "class_idx", "color_idx", "mask")}
    if db_cached is not None:
        cell_enc, fb0, fb1, cached_bs = db_cached
        fine_bank = (jnp.asarray(fb0), jnp.asarray(fb1))
        if bench.CALIBRATE and cached_bs is not None:
            pipe = pipe.with_calibrated_stats(
                jax.tree.map(jnp.asarray, cached_bs))
    else:
        cell_enc = pipe.coarse.encode_all_cells(pipe.coarse_state, bank,
                                                jax.random.PRNGKey(0))
        if bench.CALIBRATE:
            text_enc0 = pipe.coarse.encode_all_queries(pipe.coarse_state,
                                                       loader)
            _, cal_idx = topk_retrieval(jnp.asarray(text_enc0),
                                        jnp.asarray(cell_enc), 10)
            pipe, fine_bank = pipe.calibrated_for_serving(
                bank, bank_dev, hint_tokens, hint_lengths,
                np.asarray(cal_idx[:Q]))
        else:
            fine_bank = pipe.precompute_fine_bank(bank, bank_dev)
    jax.block_until_ready(fine_bank)

    text_enc = pipe.coarse.encode_all_queries(pipe.coarse_state, loader)
    _, wide = topk_retrieval(jnp.asarray(text_enc[:Q]),
                             jnp.asarray(cell_enc), args.k)
    model = pipe.fine.model
    fs = pipe.fine_state
    variables = {"params": fs.params, "batch_stats": fs.batch_stats}
    N = Q * args.k
    print(f"# shapes: {Q} queries x K={args.k} -> {N} pairs, "
          f"E={model.embed_dim}, blocks={2*model.num_layers}, "
          f"sinkhorn={model.sinkhorn_iters}, dtype={model.dtype}",
          flush=True)

    # Distinct index sets per rep (defeat request-level caches).
    rng = np.random.default_rng(0)
    wides = [jnp.asarray(np.asarray(wide)) for _ in range(1)]
    wides += [jnp.asarray(rng.permuted(np.asarray(wide), axis=1))
              for _ in range(args.reps)]
    htk, hln = jnp.asarray(hint_tokens), jnp.asarray(hint_lengths)

    hint_enc = model.apply(variables, htk, hln,
                           method=type(model).encode_hints)
    hint_rep = jnp.repeat(hint_enc, args.k, axis=0)
    jax.block_until_ready(hint_rep)

    # ---- piece 1: bank gather ----
    @jax.jit
    def gather(idx):
        flat = idx.reshape(-1)
        return fine_bank[0][flat], fine_bank[1][flat]

    ms = timed(gather, [(w,) for w in wides])
    fl, by = cost_of(lambda idx: gather(idx), wides[0])
    print(f"# gather:            {ms:7.2f} ms  ({by/1e9:0.2f} GB, "
          f"{by/1e9/(ms/1e3):0.0f} GB/s)", flush=True)
    obj_enc = gather(wides[0])[0]
    jax.block_until_ready(obj_enc)

    # ---- piece 2: hint encode ----
    @jax.jit
    def henc(tk, ln):
        return model.apply(variables, tk, ln,
                           method=type(model).encode_hints)

    ms = timed(henc, [(htk, hln)] * (args.reps + 1))
    print(f"# hint encode:       {ms:7.2f} ms", flush=True)

    # ---- piece 3: GNN blocks + final proj + score matrix, by depth ----
    objs = [gather(w)[0] for w in wides]
    jax.block_until_ready(objs)
    score_cache = {}
    for L in (1, 2, model.num_layers):
        sub = model.clone(num_layers=L)

        @jax.jit
        def gnn_scores(obj, hr, _sub=sub):
            return _sub.apply(variables, obj, hr, train=False,
                              method=type(_sub).match_encoded)["log_P"]

        ms = timed(gnn_scores, [(o, hint_rep) for o in objs])
        fl, by = cost_of(lambda o, h: gnn_scores(o, h), objs[0], hint_rep)
        print(f"# match_encoded L={L}: {ms:7.2f} ms  ({fl/1e9:0.1f} GFLOP, "
              f"{by/1e9:0.2f} GB)", flush=True)

    # ---- piece 3b: GNN only (no sinkhorn / no extraction) ----
    from text2pos_tpu.ops.sinkhorn import extract_matches, \
        log_optimal_transport

    def gnn_only_fn(L):
        sub = model.clone(num_layers=L, sinkhorn_iters=0)

        def f(obj, hr):
            return sub.apply(variables, obj, hr, train=False,
                             method=type(sub).match_encoded)["log_P"]
        return jax.jit(f)

    for L in (1, model.num_layers):
        try:
            f = gnn_only_fn(L)
            ms = timed(f, [(o, hint_rep) for o in objs])
            fl, by = cost_of(lambda o, h: f(o, h), objs[0], hint_rep)
            print(f"# gnn+proj+score L={L} (sinkhorn=0): {ms:7.2f} ms  "
                  f"({fl/1e9:0.1f} GFLOP, {by/1e9:0.2f} GB)", flush=True)
        except Exception as e:
            print(f"# gnn-only L={L} failed: {e!r}", flush=True)

    # ---- piece 4: sinkhorn by iters on raw scores ----
    raw = jax.random.normal(jax.random.PRNGKey(0), (N, 16, H),
                            jnp.float32)
    raws = [raw * (1 + 0.001 * i) for i in range(args.reps + 1)]
    jax.block_until_ready(raws)
    bin_score = fs.params["superglue"]["bin_score"]
    for iters in (6, 10, 50):
        @functools.partial(jax.jit, static_argnums=())
        def sk(s, _it=iters):
            return log_optimal_transport(s, bin_score, _it, impl="auto")

        ms = timed(sk, [(r,) for r in raws])
        fl, by = cost_of(lambda s: sk(s), raws[0])
        print(f"# sinkhorn iters={iters:3d}: {ms:7.2f} ms  "
              f"({fl/1e9:0.1f} GFLOP, {by/1e9:0.2f} GB)", flush=True)

    # ---- piece 5: extraction + conf/spread/pos tail ----
    Z = log_optimal_transport(raw, bin_score, 6, impl="auto")
    Zs = [Z * (1 + 0.001 * i) for i in range(args.reps + 1)]
    jax.block_until_ready(Zs)
    ctr = gather(wides[0])[1]

    @jax.jit
    def tail(z, ctr_):
        from text2pos_tpu.evaluation.pipeline import (
            _match_confidence_scores, _match_vote_spread)
        from text2pos_tpu.models.matcher import get_pos_in_cell

        out = extract_matches(z, model.match_threshold)
        m0 = out["matches0"].reshape(Q, args.k, -1)
        ms0 = out["matching_scores0"].reshape(Q, args.k, -1)
        conf = _match_confidence_scores(m0, ms0)
        offs = jnp.zeros((Q, args.k, H, 2), jnp.float32)
        c = ctr_.reshape(Q, args.k, -1, 2)
        pos = get_pos_in_cell(c, m0, offs)
        spread = _match_vote_spread(out["matches1"].reshape(Q, args.k, H),
                                    offs, c)
        return conf, pos, spread

    ms = timed(tail, [(z, ctr) for z in Zs])
    fl, by = cost_of(lambda z, c: tail(z, c), Zs[0], ctr)
    print(f"# extract+conf+spread tail: {ms:7.2f} ms  ({fl/1e9:0.1f} GFLOP, "
          f"{by/1e9:0.2f} GB)", flush=True)

    # ---- fused Pallas kernel vs XLA GNN ----
    if not args.skip_pallas:
        from text2pos_tpu.ops.superglue_gnn_pallas import (fold_gnn_params,
                                                           gnn_scores_pallas)

        try:
            folded = {k: jnp.asarray(v) for k, v in fold_gnn_params(
                jax.device_get(fs.params), jax.device_get(fs.batch_stats),
                model.num_layers).items()}
        except Exception as e:
            print(f"# fold_gnn_params failed ({e!r}) — uncalibrated "
                  "stats? skipping pallas", flush=True)
            return
        dt = model.dtype or jnp.float32
        henc_rep = hint_rep
        for compact in (True, False):
            for G in args.gs:
                @functools.partial(jax.jit, static_argnums=())
                def pk(obj, hr, _G=G, _c=compact):
                    return gnn_scores_pallas(obj, hr, folded,
                                             model.num_layers,
                                             dtype=dt, pairs_per_program=_G,
                                             compact_softmax=_c)

                try:
                    ms = timed(pk, [(o, henc_rep) for o in objs])
                    fl, by = cost_of(lambda o, h: pk(o, h), objs[0],
                                     henc_rep)
                    print(f"# pallas GNN compact={int(compact)} G={G:3d}: "
                          f"{ms:7.2f} ms  ({fl/1e9:0.1f} GFLOP, "
                          f"{by/1e9:0.2f} GB measured-by-XLA)", flush=True)
                except Exception as e:
                    print(f"# pallas G={G} compact={compact} failed: "
                          f"{e!r}", flush=True)


if __name__ == "__main__":
    main()
