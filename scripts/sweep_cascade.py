"""Sweep the cascaded re-ranking operating points on the bench protocol.

Stage 1 (offline accuracy, one device pass per cheap config): retrieve
K'=kmax candidates once, run the FULL fine pass over all of them (the
brute-rerank reference), then one CHEAP truncated-matcher pass per
(prune_layers, prune_sinkhorn) config. Every (config, prune_m, λc, γc)
cell of the grid is then a numpy reorder: keep the top prune_m by the
cheap score, re-rank them by the full score, measure top-k@15m from the
per-slot world errors. This reproduces exactly what
``serve_batch(prune_m=...)`` computes, at a tiny fraction of the compile
cost (one jitted cheap-match program per config instead of one serve
program per grid cell).

Stage 2 (throughput, optional --measure L,S,M[,int8]): AOT-compile the
real cascaded serve program for the chosen config(s) and time the
steady state like bench.py.

Run (TPU): python scripts/sweep_cascade.py --kmax 128
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kmax", type=int, default=128)
    ap.add_argument("--top_k", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--lam", type=float, default=4.0,
                    help="final-rerank sim blend (serving default)")
    ap.add_argument("--gam", type=float, default=6.0,
                    help="final-rerank spread penalty (serving default)")
    ap.add_argument("--configs", type=str, nargs="*",
                    default=["0:10", "1:6", "1:10", "2:10"],
                    help="cheap configs as prune_layers:prune_sinkhorn")
    ap.add_argument("--ms", type=int, nargs="*",
                    default=[16, 24, 32, 48, 64])
    ap.add_argument("--kprimes", type=int, nargs="*", default=[],
                    help="additionally evaluate the grid with the pool "
                         "restricted to the first K' of the kmax "
                         "retrievals (numpy column slice — no extra "
                         "device work)")
    ap.add_argument("--cheap_lams", type=float, nargs="*",
                    default=[0.0, 2.0, 4.0, 8.0])
    ap.add_argument("--cheap_gams", type=float, nargs="*",
                    default=[0.0, 3.0, 6.0])
    ap.add_argument("--int8", action="store_true",
                    help="cheap pass reads the int8-quantized bank")
    ap.add_argument("--measure", type=str, nargs="*", default=[],
                    help="L:S:M[:int8] configs to time as real serve "
                         "programs (e.g. 1:10:32:int8)")
    ap.add_argument("--save", type=str, default="",
                    help="npz path for the raw sweep banks")
    args = ap.parse_args()

    bench._require_backend(float(os.environ.get("T2P_BENCH_INIT_TIMEOUT",
                                                600)))
    import jax
    import jax.numpy as jnp

    bench._enable_compile_cache()
    pipe, loader, poses, vocab, trained = bench.build()
    bank = loader.bank
    kmax = min(args.kmax, bank.num_cells)
    print(f"# sweep_cascade: {bank.num_cells} cells, {len(poses)} queries, "
          f"kmax={kmax}, trained={trained}", flush=True)

    db_key = bench._db_cache_key() if trained else None
    db_cached = bench._load_db_cache(db_key) if db_key else None
    from text2pos_tpu.data.hints import create_hint_description
    from text2pos_tpu.ops.retrieval import topk_retrieval

    H, Th = pipe.cfg.num_mentioned, pipe.cfg.max_hint_len
    Q = len(poses)
    hint_tokens = np.zeros((Q, H, Th), np.int32)
    hint_lengths = np.ones((Q, H), np.int32)
    for i, p in enumerate(poses):
        tk, ln = vocab.encode_batch(create_hint_description(p)[:H], Th)
        hint_tokens[i, : len(tk)] = tk
        hint_lengths[i, : len(ln)] = ln

    bank_dev = {k: jnp.asarray(getattr(bank, k)) for k in (
        "points_xyz", "points_rgb", "point_count", "centers", "colors",
        "class_idx", "color_idx", "mask")}
    if db_cached is not None:
        cell_enc, fb0, fb1, cached_bs = db_cached
        fine_bank = (jnp.asarray(fb0), jnp.asarray(fb1))
        if bench.CALIBRATE and cached_bs is not None:
            pipe = pipe.with_calibrated_stats(
                jax.tree.map(jnp.asarray, cached_bs))
        print("# db cache: restored offline precompute", flush=True)
    else:
        cell_enc = pipe.coarse.encode_all_cells(pipe.coarse_state, bank,
                                                jax.random.PRNGKey(0))
        if bench.CALIBRATE:
            text_enc0 = pipe.coarse.encode_all_queries(pipe.coarse_state,
                                                       loader)
            _, cal_idx = topk_retrieval(jnp.asarray(text_enc0),
                                        jnp.asarray(cell_enc), args.top_k)
            pipe, fine_bank = pipe.calibrated_for_serving(
                bank, bank_dev, hint_tokens, hint_lengths,
                np.asarray(cal_idx))
        else:
            fine_bank = pipe.precompute_fine_bank(bank, bank_dev)
        if db_key:
            bench._save_db_cache(db_key, cell_enc, fine_bank,
                                 pipe.fine_state.batch_stats
                                 if bench.CALIBRATE else None)
    cell_enc_dev = jnp.asarray(cell_enc)
    jax.block_until_ready(fine_bank)

    text_enc = pipe.coarse.encode_all_queries(pipe.coarse_state, loader)
    sims_dev, wide_dev = topk_retrieval(jnp.asarray(text_enc), cell_enc_dev,
                                        kmax)
    wide = np.asarray(wide_dev)
    sims = np.asarray(sims_dev, np.float32)

    cheap_src = fine_bank[0]
    if args.int8:
        from text2pos_tpu.evaluation.pipeline import quantize_fine_bank

        qb, qs = quantize_fine_bank(fine_bank[0])
        dt = pipe.fine.model.dtype or jnp.float32
        cheap_src = (qb, qs, dt)

    model = pipe.fine.model
    fs = pipe.fine_state

    def pass_over_wide(match_model, tag, soft=False):
        """(conf, spread, pos_offsets) of `match_model` over all kmax
        candidate slots, chunked; also returns mean device ms/chunk.
        ``soft``: score with the soft transport mass / vote spread
        (losses.soft_mass_and_spread) instead of hard match extraction —
        the serve_batch prune_soft path."""
        import functools

        from text2pos_tpu.train.losses import soft_mass_and_spread

        @functools.partial(jax.jit, static_argnums=())
        def chunk_fn(idx, htk, hln):
            B, K = idx.shape
            flat = idx.reshape(B * K)
            if isinstance(cheap_src, tuple) and match_model is not model:
                qb_, qs_, dt_ = cheap_src
                obj = (qb_[flat].astype(dt_) * qs_[flat].astype(dt_))
            else:
                obj = fine_bank[0][flat]
            ctr = fine_bank[1][flat]
            hint_enc = model.apply(
                {"params": fs.params, "batch_stats": fs.batch_stats},
                htk, hln, method=type(model).encode_hints)
            if soft:
                pad = obj.shape[1]
                hint_rep = jnp.repeat(hint_enc, K, axis=0)
                out = match_model.apply(
                    {"params": fs.params, "batch_stats": fs.batch_stats},
                    obj, hint_rep, train=False,
                    method=type(match_model).match_encoded)
                mass, spr = soft_mass_and_spread(
                    out["P"].reshape(B, K, pad + 1, -1),
                    ctr.reshape(B, K, pad, 2),
                    out["offsets"].reshape(B, K, -1, 2))
                zero = jnp.zeros((B, K, 2), jnp.float32)
                return (None, zero, zero, None, mass, spr)
            return pipe._match_from_enc(
                fs, obj.reshape(B, K, *obj.shape[1:]),
                ctr.reshape(B, K, *ctr.shape[1:]), hint_enc,
                model=match_model)

        conf = np.zeros((Q, kmax), np.float32)
        spread = np.zeros((Q, kmax), np.float32)
        pos = np.zeros((Q, kmax, 2), np.float32)
        times = []
        for i in range(0, Q, args.chunk):
            sl = slice(i, min(i + args.chunk, Q))
            real = sl.stop - sl.start
            idx, htk, hln = wide[sl], hint_tokens[sl], hint_lengths[sl]
            if real < args.chunk:
                reps = args.chunk - real
                idx = np.concatenate([idx, idx[:1].repeat(reps, 0)])
                htk = np.concatenate([htk, htk[:1].repeat(reps, 0)])
                hln = np.concatenate([hln, hln[:1].repeat(reps, 0)])
            t0 = time.time()
            out = chunk_fn(jnp.asarray(idx), jnp.asarray(htk),
                           jnp.asarray(hln))
            jax.block_until_ready(out)
            if i:
                times.append(time.time() - t0)
            _, pm, po, cf, cs, sp = out
            conf[sl] = np.asarray(cs, np.float32)[:real]
            spread[sl] = np.asarray(sp, np.float32)[:real]
            pos[sl] = np.asarray(po, np.float32)[:real]
        ms = float(np.mean(times) * 1000) if times else float("nan")
        print(f"# pass[{tag}] done, {ms:0.1f} ms/chunk({args.chunk})",
              flush=True)
        return conf, spread, pos, ms

    full_conf, full_spread, full_pos, full_ms = pass_over_wide(model,
                                                               "full")

    # Per-slot world error for any reordering.
    pose_w = np.array([p.pose_w[0:2] for p in poses])
    pose_scene = np.array([p.cell_id.split("_")[0] for p in poses])
    cell_scene = np.array([cid.split("_")[0] for cid in bank.cell_ids])
    lo = bank.bbox_w[wide][..., 0:2]
    size = bank.cell_size[wide][..., None]
    world = lo + full_pos * size
    err = np.linalg.norm(world - pose_w[:, None, :], axis=-1)
    err = np.where(cell_scene[wide] == pose_scene[:, None], err,
                   np.inf).astype(np.float32)

    rows = np.arange(Q)[:, None]
    final_score = (full_conf + args.lam * sims - args.gam * full_spread)

    def acc_at(order_slots, k=None):
        k = k or args.top_k
        e = np.take_along_axis(err, order_slots[:, :k], axis=1)
        return float(np.mean(e.min(axis=1) <= 15.0))

    def top1_at(order_slots):
        return float(np.mean(np.take_along_axis(
            err, order_slots[:, :1], axis=1)[:, 0] <= 15.0))

    brute_order = np.argsort(-final_score, axis=1, kind="stable")
    print(f"# brute rerank@{kmax}: top-{args.top_k}@15m "
          f"{acc_at(brute_order):0.4f}, top-1@15m {top1_at(brute_order):0.4f}",
          flush=True)

    results = {}
    banks = dict(wide=wide, sims=sims, err=err, full_conf=full_conf,
                 full_spread=full_spread)
    for cfg_s in args.configs:
        parts = cfg_s.split(":")
        L, S = int(parts[0]), int(parts[1])
        soft = "soft" in parts[2:]
        cheap = pipe._cheap_matcher(L, S)
        tag = f"L{L}:S{S}" + (":soft" if soft else "")
        c_conf, c_spread, _c_pos, c_ms = pass_over_wide(cheap, tag,
                                                        soft=soft)
        banks[f"cheap_conf_{tag.replace(':', '_')}"] = c_conf
        banks[f"cheap_spread_{tag.replace(':', '_')}"] = c_spread
        results[tag] = (c_conf, c_spread, c_ms)

    print(f"\n# grid (final score lam={args.lam} gam={args.gam}; acc = "
          f"top-{args.top_k}@15m after full rerank of the kept M)",
          flush=True)
    print("config    K'   M    best(lamc,gamc)  acc     top1    keep-recall",
          flush=True)
    for kp in sorted(set(args.kprimes) | {kmax}):
        if not args.top_k < kp <= kmax:
            continue
        for tag, (c_conf, c_spread, c_ms) in results.items():
            for M in args.ms:
                if not args.top_k < M < kp:
                    continue
                best = None
                for lc in args.cheap_lams:
                    for gc in args.cheap_gams:
                        cheap_score = (c_conf[:, :kp] + lc * sims[:, :kp]
                                       - gc * c_spread[:, :kp])
                        keep = np.argsort(-cheap_score, axis=1,
                                          kind="stable")[:, :M]
                        kept_final = np.take_along_axis(
                            final_score[:, :kp], keep, axis=1)
                        order_in_keep = np.argsort(-kept_final, axis=1,
                                                   kind="stable")
                        slots = np.take_along_axis(keep, order_in_keep,
                                                   axis=1)
                        a = acc_at(slots)
                        if best is None or a > best[0]:
                            kr = float(np.mean(np.take_along_axis(
                                err[:, :kp], keep, axis=1).min(axis=1)
                                <= 15.0))
                            best = (a, top1_at(slots), lc, gc, kr)
                a, t1, lc, gc, kr = best
                print(f"{tag}  {kp:4d} {M:4d}  lam={lc:g} gam={gc:g}   "
                      f"{a:0.4f}  {t1:0.4f}  {kr:0.4f}", flush=True)

    if args.save:
        np.savez_compressed(args.save, **banks)
        print(f"# banks saved to {args.save}", flush=True)

    # ------------------------------------------------------------------
    # Stage 2: real serve-program timing for chosen configs.
    # ------------------------------------------------------------------
    if args.measure:
        tokens, lengths = loader.all_query_tokens()
        reps = 4
        perms = [np.roll(np.arange(Q), r) for r in range(reps + 1)]
        rep_args = [
            (jnp.asarray(tokens[p]), jnp.asarray(lengths[p]),
             jnp.asarray(hint_tokens[p]), jnp.asarray(hint_lengths[p]))
            for p in perms]
        jax.block_until_ready(rep_args)
        for spec in args.measure:
            parts = spec.split(":")
            L, S, M = int(parts[0]), int(parts[1]), int(parts[2])
            use_int8 = "int8" in parts[3:]
            use_soft = "soft" in parts[3:]
            extra = ()
            if use_int8:
                from text2pos_tpu.evaluation.pipeline import \
                    quantize_fine_bank

                extra = quantize_fine_bank(fine_bank[0])
            t0 = time.time()

            def dispatch(i):
                tk, ln, htk, hln = rep_args[i]
                return pipe.serve_batch(
                    pipe.coarse_state, pipe.fine_state, tk, ln, htk, hln,
                    cell_enc_dev, args.top_k, fine_bank[0], fine_bank[1],
                    kmax, args.lam, args.gam, M, L, S, use_soft, *extra)

            out = jax.device_get(dispatch(reps))
            print(f"# measure[{spec}]: compile+first {time.time()-t0:0.1f}s",
                  flush=True)
            t0 = time.time()
            pending = dispatch(0)
            for i in range(1, reps):
                nxt = dispatch(i)
                out = jax.device_get(pending)
                pending = nxt
            out = jax.device_get(pending)
            elapsed = (time.time() - t0) / reps
            qps = Q / elapsed
            inv = np.argsort(perms[reps - 1])
            top_idx = np.asarray(out[0], np.int64)[inv]
            pos_off = np.asarray(out[2], np.float32)[inv]
            accs = pipe._accuracies(poses, bank, top_idx, pos_off)
            print(f"# measure[{spec}]: {qps:0.1f} q/s, "
                  f"top-{args.top_k}@15m={accs[args.top_k][15]:0.4f}, "
                  f"top-1@15m={accs[1][15]:0.4f}", flush=True)


if __name__ == "__main__":
    main()
