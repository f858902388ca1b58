"""End-to-end localization throughput benchmark (single TPU chip).

Measures the serving path of the rebuilt Text2Pos pipeline at the published
evaluation protocol (top-10 retrieval, pad_size 16, 256 points/object,
embed 256 coarse / 128 fine, 6 attention layer pairs, 50 Sinkhorn
iterations — reference README.md:61-62, evaluation/args.py:22-26,53):

    text query → LSTM encode → top-10 cell retrieval over the DB →
    SuperGlue fine matching vs each retrieved cell → world position

against a pre-encoded cell database (the map is static at serving time).

``vs_baseline`` compares the batched, fully-jitted pipeline against a
*reference-style* execution of the same models on the same chip: one query
at a time, retrieval as a host numpy matmul + argsort, fine matching with
batch = top-k only — the execution pattern of the PyTorch reference
(/root/reference/evaluation/pipeline.py:190-202, training/coarse.py:134-158),
which processes poses in a Python loop with per-step host↔device traffic.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

import os

# Benchmark scale: a KITTI360Pose-val-sized problem. Overridable via env
# for scaling studies (e.g. T2P_BENCH_GRID=32 → ~1024 DB cells).
#
# The serving program is latency-dominated at small batches (~130 ms fixed
# dispatch+transfer vs ~0.11-0.14 ms/query marginal compute on v5e), so the
# default batch is 2048 queries — realistic for evaluation sweeps and
# high-load serving, with ~0.4 s batch latency. Measured scaling (bf16,
# 256-cell DB): 128q→902 q/s, 256q→1558, 512q→2959, 1024q→4144,
# 2048q→4963, 4096q→5851.
NUM_CELLS_GRID = int(os.environ.get("T2P_BENCH_GRID", 16))
NUM_QUERIES = int(os.environ.get("T2P_BENCH_QUERIES", 2048))
TOP_K = 10
BASELINE_QUERIES = int(os.environ.get("T2P_BENCH_BASELINE_QUERIES", 8))
# Compute dtype for the model bodies. Params, attention logits, softmax,
# the score matrix, Sinkhorn and L2 norms stay float32 (DESIGN.md §6);
# bfloat16 bodies measure ~8% faster at identical synthetic accuracy and
# are the intended TPU deployment mode.
DTYPE = os.environ.get("T2P_BENCH_DTYPE", "bfloat16")

COARSE_DIM = 256
FINE_DIM = 128


def build():
    import jax

    from text2pos_tpu.config import EvalConfig, TrainConfig
    from text2pos_tpu.data.hints import (
        Vocabulary, build_vocabulary, create_hint_description)
    from text2pos_tpu.data.loaders import CoarseLoader, FineLoader
    from text2pos_tpu.data.synthetic import make_synthetic_dataset
    from text2pos_tpu.evaluation.pipeline import LocalizationPipeline
    from text2pos_tpu.train.coarse import CoarseTrainer
    from text2pos_tpu.train.fine import FineTrainer

    cells, poses = make_synthetic_dataset(
        seed=0, extent=30.0 * NUM_CELLS_GRID, cell_size=30.0,
        poses_per_cell=1, objects_per_cell_area=12)
    rng_np = np.random.default_rng(0)
    while len(poses) < NUM_QUERIES:
        poses = poses + poses
    poses = poses[:NUM_QUERIES]

    ccfg = TrainConfig(batch_size=64, embed_dim=COARSE_DIM, num_layers=6,
                       sinkhorn_iters=50, pointnet_numpoints=256,
                       coarse_max_objects=24, pad_size=16, num_mentioned=6,
                       dtype=DTYPE)
    fcfg = TrainConfig(batch_size=32, embed_dim=FINE_DIM, num_layers=6,
                       sinkhorn_iters=50, pointnet_numpoints=256,
                       coarse_max_objects=24, pad_size=16, num_mentioned=6,
                       dtype=DTYPE)
    ecfg = EvalConfig(top_k=(1, 5, TOP_K), threshs=(5, 10, 15), pad_size=16,
                      num_mentioned=6, pointnet_numpoints=256)

    vocab = Vocabulary(build_vocabulary(
        [create_hint_description(p) for p in poses]))

    coarse_loader = CoarseLoader(cells, poses, vocab, ccfg.batch_size,
                                 ccfg.coarse_max_objects,
                                 ccfg.pointnet_numpoints, ccfg.max_text_len)
    coarse = CoarseTrainer(ccfg, vocab)
    fine = FineTrainer(fcfg, vocab)

    rng = jax.random.PRNGKey(0)
    cbatch = next(coarse_loader.epoch(seed=0, drop_last=False))
    cstate = coarse.init_state(cbatch, rng, 1)
    floader = FineLoader(cells, poses, vocab, fcfg.batch_size, fcfg.pad_size,
                         fcfg.num_mentioned, fcfg.pointnet_numpoints,
                         fcfg.max_hint_len)
    fbatch = next(floader.epoch(seed=0, drop_last=False))
    fstate = fine.init_state(fbatch, rng, 1)

    pipe = LocalizationPipeline(coarse, cstate, fine, fstate, ecfg)
    return pipe, coarse_loader, poses, vocab


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/t2p_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def run():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    pipe, loader, poses, vocab = build()
    bank = loader.bank
    print(f"# bench: {bank.num_cells} DB cells, {len(poses)} queries, "
          f"dtype={DTYPE}, devices={jax.devices()}", flush=True)

    # ------------------------------------------------------------------
    # Offline: pre-encode the cell database — coarse retrieval embeddings
    # and the fine stage's query-independent object encodings (the map is
    # static at serving time). Timed separately.
    # ------------------------------------------------------------------
    t0 = time.time()
    cell_enc = pipe.coarse.encode_all_cells(
        pipe.coarse_state, bank, jax.random.PRNGKey(0))
    cell_enc_dev = jnp.asarray(cell_enc)
    print(f"# coarse db encode: {bank.num_cells} cells in "
          f"{time.time()-t0:0.1f}s (incl. compile)", flush=True)

    t0 = time.time()
    bank_dev = {k: jnp.asarray(getattr(bank, k)) for k in (
        "points_xyz", "points_rgb", "point_count", "centers", "colors",
        "class_idx", "color_idx", "mask")}
    fine_bank = pipe.precompute_fine_bank(bank, bank_dev)
    jax.block_until_ready(fine_bank)
    print(f"# fine db encode: {bank.num_cells} cells in {time.time()-t0:0.1f}s "
          f"(incl. compile)", flush=True)

    # ------------------------------------------------------------------
    # Serving path: the ENTIRE query batch in one jitted program
    # (text encode → top-k retrieval → fine matching → positions).
    # ------------------------------------------------------------------
    tokens, lengths = loader.all_query_tokens()
    from text2pos_tpu.data.hints import create_hint_description

    H, Th = pipe.cfg.num_mentioned, pipe.cfg.max_hint_len
    hint_tokens = np.zeros((len(poses), H, Th), np.int32)
    hint_lengths = np.ones((len(poses), H), np.int32)
    for i, p in enumerate(poses):
        tk, ln = vocab.encode_batch(create_hint_description(p), Th)
        hint_tokens[i, : len(tk)] = tk
        hint_lengths[i, : len(ln)] = ln

    # Distinct query orderings per repetition (pre-uploaded): repeated
    # identical inputs could be served from request-level caches in
    # remote-attached runtimes, which would fake the timing.
    reps = 5
    perms = [np.roll(np.arange(len(poses)), r) for r in range(reps + 1)]
    rep_args = []
    for perm in perms:
        rep_args.append((
            jnp.asarray(tokens[perm]), jnp.asarray(lengths[perm]),
            jnp.asarray(hint_tokens[perm]), jnp.asarray(hint_lengths[perm])))
    jax.block_until_ready(rep_args)

    def serve_all(i):
        tk, ln, htk, hln = rep_args[i]
        out = pipe.serve_batch(pipe.coarse_state, pipe.fine_state, tk, ln,
                               htk, hln, cell_enc_dev, TOP_K,
                               fine_bank[0], fine_bank[1])
        # Materialize results to host — the serving contract includes
        # getting the positions back. One batched fetch (the tunnel to the
        # remote-attached chip has high per-transfer latency).
        return jax.device_get(out)

    t0 = time.time()
    serve_all(reps)  # compile + warm
    print(f"# pipeline compile+first run: {time.time()-t0:0.1f}s", flush=True)

    t0 = time.time()
    for i in range(reps):
        top_idx, pos_mean, pos_offsets, conf = serve_all(i)
    elapsed = (time.time() - t0) / reps
    qps = len(poses) / elapsed
    inv = np.argsort(perms[reps - 1])
    accs = pipe._accuracies(poses, bank, np.asarray(top_idx)[inv],
                            np.asarray(pos_offsets)[inv])
    print(f"# steady-state: {len(poses)} queries in {elapsed:0.3f}s "
          f"→ {qps:0.1f} q/s; top-{TOP_K}@15m(synthetic)={accs[TOP_K][15]:0.2f}",
          flush=True)

    # ------------------------------------------------------------------
    # Reference-style execution: per-query host loop (same models, same
    # chip, the reference's batching pattern).
    # ------------------------------------------------------------------
    tokens, lengths = loader.all_query_tokens()
    B = pipe.coarse.cfg.batch_size
    cell_enc_np = np.asarray(cell_enc)

    def one_query(qi):
        tk = np.zeros((B, tokens.shape[1]), tokens.dtype)
        ln = np.ones(B, lengths.dtype)
        tk[0], ln[0] = tokens[qi], lengths[qi]
        enc = np.asarray(pipe.coarse.encode_text_step(
            pipe.coarse_state, jnp.asarray(tk), jnp.asarray(ln)))[0]
        scores = cell_enc_np @ enc                       # host matmul
        order = np.argsort(-scores)[:TOP_K]              # host argsort
        pipe.run_fine(loader, [poses[qi]], order[None], vocab, chunk=1,
                      use_cache=False)                    # re-encode per query

    one_query(0)  # compile the chunk=1 path
    t0 = time.time()
    for qi in range(BASELINE_QUERIES):
        one_query(qi)
    ref_elapsed = time.time() - t0
    ref_qps = BASELINE_QUERIES / ref_elapsed
    print(f"# reference-style loop: {BASELINE_QUERIES} queries in "
          f"{ref_elapsed:0.3f}s → {ref_qps:0.1f} q/s", flush=True)

    print(json.dumps({
        "metric": "localization_queries_per_sec",
        "value": round(qps, 2),
        "unit": "queries/s",
        "vs_baseline": round(qps / ref_qps, 2),
    }), flush=True)


if __name__ == "__main__":
    run()
