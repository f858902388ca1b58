"""Full-scale synthetic validation run (VERDICT r4 item 5).

Builds a held-out synthetic eval corpus at the REAL dataset's scale —
the reference evaluates 43,381 queries over three test scenes' cells
(/root/reference/README.md:26) — and runs the end-to-end serving
pipeline (trained checkpoints, calibrated BN, single-program serve
batches) at the reference protocol: top-k {1, 5, 10} × distance
thresholds {5, 10, 15} m, pad_size 16, 256 points/object.

Corpus: --scenes held-out scenes (seeds disjoint from both the training
seeds 100+ and the bench seeds 0-7), --poses_per_cell poses each →
~40k+ queries over ~6k+ DB cells. Produces the accuracy table for
docs/SCALE_RUN.md plus wall-clock for every stage.

Run (TPU): python scripts/scale_eval.py [--scenes 24 --poses_per_cell 8]
           [--rerank 128 --prune_m 24 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from train_bench_ckpts import build_corpus  # noqa: E402

EVAL_SEED0 = 200  # disjoint from train (100+) and bench (0-7) seeds


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=24)
    ap.add_argument("--poses_per_cell", type=int, default=8)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--top_k", type=int, nargs="*", default=[1, 5, 10])
    ap.add_argument("--threshs", type=float, nargs="*", default=[5, 10, 15])
    ap.add_argument("--rerank", type=int, default=128)
    ap.add_argument("--lam", type=float, default=4.0)
    ap.add_argument("--gam", type=float, default=6.0)
    ap.add_argument("--prune_m", type=int, default=24)
    ap.add_argument("--prune_layers", type=int, default=1)
    ap.add_argument("--prune_sinkhorn", type=int, default=6)
    ap.add_argument("--int8", type=int, default=1,
                    help="1: cheap pass reads the int8-quantized bank")
    ap.add_argument("--soft", action="store_true",
                    help="soft (extraction-free) cheap-pass scores")
    ap.add_argument("--json_out", default="docs/scale_run_records.json")
    args = ap.parse_args()

    t_all = time.time()
    t0 = time.time()
    cells, poses = build_corpus(
        args.poses_per_cell,
        list(range(EVAL_SEED0, EVAL_SEED0 + args.scenes)), "8")
    t_corpus = time.time() - t0
    print(f"# eval corpus: {len(cells)} cells / {len(poses)} queries "
          f"({t_corpus:0.0f}s)", flush=True)

    bench._require_backend(float(os.environ.get("T2P_BENCH_INIT_TIMEOUT",
                                                600)))
    import jax
    import jax.numpy as jnp

    bench._enable_compile_cache()
    from text2pos_tpu.config import EvalConfig
    from text2pos_tpu.data.hints import create_hint_description
    from text2pos_tpu.data.loaders import CoarseLoader
    from text2pos_tpu.evaluation.metrics import print_accuracies
    from text2pos_tpu.evaluation.pipeline import (
        build_pipeline_from_checkpoints, quantize_fine_bank)
    from text2pos_tpu.ops.retrieval import topk_retrieval

    ecfg = EvalConfig(top_k=tuple(args.top_k), threshs=tuple(args.threshs),
                      pad_size=16, num_mentioned=6, pointnet_numpoints=256)
    pipe, vocab, _ = build_pipeline_from_checkpoints(
        ecfg, bench.CKPT_COARSE, bench.CKPT_FINE, dtype=bench.DTYPE)
    loader = CoarseLoader(cells, poses, vocab, pipe.coarse.cfg.batch_size,
                          pipe.coarse.cfg.coarse_max_objects,
                          pipe.coarse.cfg.pointnet_numpoints,
                          pipe.coarse.cfg.max_text_len)
    bank = loader.bank
    Q = len(poses)

    # ---- offline DB encode + calibration ----
    t0 = time.time()
    cell_enc = pipe.coarse.encode_all_cells(pipe.coarse_state, bank,
                                            jax.random.PRNGKey(0))
    cell_enc_dev = jnp.asarray(cell_enc)
    t_db_coarse = time.time() - t0
    print(f"# coarse DB encode: {bank.num_cells} cells in "
          f"{t_db_coarse:0.0f}s", flush=True)

    H, Th = ecfg.num_mentioned, ecfg.max_hint_len
    hint_tokens = np.zeros((Q, H, Th), np.int32)
    hint_lengths = np.ones((Q, H), np.int32)
    for i, p in enumerate(poses):
        tk, ln = vocab.encode_batch(create_hint_description(p)[:H], Th)
        hint_tokens[i, : len(tk)] = tk
        hint_lengths[i, : len(ln)] = ln
    tokens, lengths = loader.all_query_tokens()

    t0 = time.time()
    bank_dev = {k: jnp.asarray(getattr(bank, k)) for k in (
        "points_xyz", "points_rgb", "point_count", "centers", "colors",
        "class_idx", "color_idx", "mask")}
    text_enc = pipe.coarse.encode_all_queries(pipe.coarse_state, loader)
    _, cal_idx = topk_retrieval(jnp.asarray(text_enc[:2048]), cell_enc_dev,
                                max(args.top_k))
    pipe, fine_bank = pipe.calibrated_for_serving(
        bank, bank_dev, hint_tokens[:2048], hint_lengths[:2048],
        np.asarray(cal_idx))
    jax.block_until_ready(fine_bank)
    t_db_fine = time.time() - t0
    print(f"# fine DB encode + calibration: {t_db_fine:0.0f}s", flush=True)

    cheap = quantize_fine_bank(fine_bank[0]) if args.int8 else ()

    # ---- serve everything in fixed-size batches ----
    def run_mode(tag, rerank_k, prune_m):
        B = args.batch
        top_all = np.zeros((Q, max(args.top_k)), np.int64)
        pos_all = np.zeros((Q, max(args.top_k), 2), np.float32)
        t0 = time.time()
        for i in range(0, Q, B):
            sl = slice(i, min(i + B, Q))
            real = sl.stop - sl.start
            idx = np.arange(sl.start, sl.start + B) % Q
            out = pipe.serve_batch(
                pipe.coarse_state, pipe.fine_state,
                jnp.asarray(tokens[idx]), jnp.asarray(lengths[idx]),
                jnp.asarray(hint_tokens[idx]), jnp.asarray(hint_lengths[idx]),
                cell_enc_dev, max(args.top_k), fine_bank[0], fine_bank[1],
                rerank_k, args.lam, args.gam, prune_m, args.prune_layers,
                args.prune_sinkhorn, args.soft,
                *(cheap if prune_m else ()))
            top_all[sl] = np.asarray(out[0], np.int64)[:real]
            pos_all[sl] = np.asarray(out[2], np.float32)[:real]
        elapsed = time.time() - t0
        accs = pipe._accuracies(poses, bank, top_all, pos_all)
        print(f"\n=== {tag}: {Q} queries in {elapsed:0.1f}s "
              f"({Q/elapsed:0.0f} q/s incl. first-batch compile) ===",
              flush=True)
        print_accuracies(accs, tag)
        return {f"top{k}@{int(t)}m": round(float(accs[k][t]), 4)
                for k in args.top_k for t in args.threshs} | {
                    "elapsed_s": round(elapsed, 1),
                    "qps": round(Q / elapsed, 1)}

    records = {
        "corpus": {"cells": bank.num_cells, "queries": Q,
                   "scenes": args.scenes, "gen_s": round(t_corpus, 1)},
        "db_encode_s": {"coarse": round(t_db_coarse, 1),
                        "fine_plus_calibration": round(t_db_fine, 1)},
        "plain_top10": run_mode("plain (reference protocol)", 0, 0),
        "cascade": run_mode(
            f"cascade rerank@{args.rerank}->m{args.prune_m}", args.rerank,
            args.prune_m),
    }
    records["total_wall_s"] = round(time.time() - t_all, 1)
    with open(args.json_out, "w") as f:
        json.dump(records, f, indent=1)
    print(f"\n# records -> {args.json_out}", flush=True)


if __name__ == "__main__":
    main()
