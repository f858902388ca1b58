"""End-to-end localization throughput + accuracy benchmark (single TPU chip).

Measures the serving path of the rebuilt Text2Pos pipeline at the published
evaluation protocol (top-10 retrieval, pad_size 16, 256 points/object,
embed 256 coarse / 128 fine, 6 attention layer pairs, 50 Sinkhorn
iterations — reference README.md:61-62, evaluation/args.py:22-26,53):

    text query → LSTM encode → top-10 cell retrieval over the DB →
    SuperGlue fine matching vs each retrieved cell → world position

against a pre-encoded cell database (the map is static at serving time).

Scale: 8 held-out synthetic scenes × 256 cells = 2048 DB cells (a
KITTI360Pose-val-sized database) and 2048 queries. Accuracy is reported
with TRAINED weights when ``checkpoints/bench_{coarse,fine}.msgpack``
exist (produced by scripts/train_bench_ckpts.py on a disjoint multi-scene
corpus — the benchmark scenes are never trained on); falls back to
randomly initialized models (throughput-only) when absent.

``vs_baseline`` compares the batched, fully-jitted pipeline against a
*reference-style* execution of the same models on the same chip: one query
at a time, retrieval as a host numpy matmul + argsort, fine matching with
batch = top-k only — the execution pattern of the PyTorch reference
(/root/reference/evaluation/pipeline.py:190-202, training/coarse.py:134-158),
which processes poses in a Python loop with per-step host↔device traffic.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...} with
accuracy brackets (random/oracle), per-stage device times and a fine-stage
MFU estimate as additional keys.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np

T_START = time.time()
# Wall budget for the whole benchmark process. The driver runs bench.py
# under a hard timeout (BENCH_r03 recorded rc=124); every optional section
# below checks the remaining budget first so the headline JSON line is
# always emitted before a kill can land.
BUDGET_S = float(os.environ.get("T2P_BENCH_BUDGET_S", 1200))


def _remaining() -> float:
    return BUDGET_S - (time.time() - T_START)

# Benchmark scale. A 2048-cell DB (8 scenes × 16×16 grid) ≈ the val-scene
# DB size of KITTI360Pose; 2048 queries ≈ a val-sized query sweep.
NUM_SCENES = int(os.environ.get("T2P_BENCH_SCENES", 8))
NUM_CELLS_GRID = int(os.environ.get("T2P_BENCH_GRID", 16))
NUM_QUERIES = int(os.environ.get("T2P_BENCH_QUERIES", 2048))
TOP_K = 10
BASELINE_QUERIES = int(os.environ.get("T2P_BENCH_BASELINE_QUERIES", 8))
# Compute dtype for the model bodies. Params, attention logits, softmax,
# the score matrix, Sinkhorn and L2 norms stay float32 (DESIGN.md §6).
DTYPE = os.environ.get("T2P_BENCH_DTYPE", "bfloat16")
# Serving-time BN calibration (frozen population statistics, true eval
# mode). 0 reverts to the reference's batch-stats serving semantics.
CALIBRATE = os.environ.get("T2P_BENCH_CALIBRATE", "1") == "1"
CKPT_COARSE = os.environ.get("T2P_BENCH_CKPT_COARSE",
                             "checkpoints/bench_coarse.msgpack")
CKPT_FINE = os.environ.get("T2P_BENCH_CKPT_FINE",
                           "checkpoints/bench_fine.msgpack")

COARSE_DIM = 256
FINE_DIM = 128
PEAK_TFLOPS = float(os.environ.get("T2P_BENCH_PEAK_TFLOPS", 197.0))  # v5e bf16
PEAK_GBS = float(os.environ.get("T2P_BENCH_PEAK_GBS", 819.0))        # v5e HBM


def make_bench_dataset():
    """8 synthetic scenes, 2048 DB cells, ≥NUM_QUERIES held-out poses."""
    from text2pos_tpu.data.synthetic import make_synthetic_dataset

    cells, poses = [], []
    for s in range(NUM_SCENES):
        c, p = make_synthetic_dataset(
            seed=s, scene_name=f"99{s:02d}", extent=30.0 * NUM_CELLS_GRID,
            cell_size=30.0, poses_per_cell=2, objects_per_cell_area=12)
        cells += c
        poses += p
    while len(poses) < NUM_QUERIES:
        poses = poses + poses
    return cells, poses[:NUM_QUERIES]


def build():
    import jax

    from text2pos_tpu.config import EvalConfig, TrainConfig
    from text2pos_tpu.data.hints import (
        Vocabulary, build_vocabulary, create_hint_description)
    from text2pos_tpu.data.loaders import CoarseLoader
    from text2pos_tpu.evaluation.pipeline import (
        LocalizationPipeline, build_pipeline_from_checkpoints)

    cells, poses = make_bench_dataset()

    ecfg = EvalConfig(top_k=(1, 5, TOP_K), threshs=(5, 10, 15), pad_size=16,
                      num_mentioned=6, pointnet_numpoints=256)

    trained = os.path.isfile(CKPT_COARSE) and os.path.isfile(CKPT_FINE)
    if trained:
        pipe, vocab, _ = build_pipeline_from_checkpoints(
            ecfg, CKPT_COARSE, CKPT_FINE, dtype=DTYPE)
    else:
        # Random-init fallback: throughput is valid, accuracy is not.
        from text2pos_tpu.train.coarse import CoarseTrainer
        from text2pos_tpu.train.fine import FineTrainer

        vocab = Vocabulary(build_vocabulary(
            [create_hint_description(p) for p in poses]))
        common = dict(num_layers=6, sinkhorn_iters=50,
                      pointnet_numpoints=256, coarse_max_objects=24,
                      pad_size=16, num_mentioned=6, dtype=DTYPE)
        coarse = CoarseTrainer(
            TrainConfig(batch_size=64, embed_dim=COARSE_DIM, **common), vocab)
        fine = FineTrainer(
            TrainConfig(batch_size=32, embed_dim=FINE_DIM, **common), vocab)
        rng = jax.random.PRNGKey(0)
        loader0 = CoarseLoader(cells, poses, vocab, 64, 24, 256, 64)
        cstate = coarse.init_state(next(loader0.epoch(seed=0,
                                                      drop_last=False)), rng, 1)
        from text2pos_tpu.data.loaders import FineLoader

        floader = FineLoader(cells, poses, vocab, 32, 16, 6, 256, 16)
        fstate = fine.init_state(next(floader.epoch(seed=0,
                                                    drop_last=False)), rng, 1)
        pipe = LocalizationPipeline(coarse, cstate, fine, fstate, ecfg)

    coarse_loader = CoarseLoader(
        cells, poses, vocab, pipe.coarse.cfg.batch_size,
        pipe.coarse.cfg.coarse_max_objects,
        pipe.coarse.cfg.pointnet_numpoints, pipe.coarse.cfg.max_text_len)
    return pipe, coarse_loader, poses, vocab, trained


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/t2p_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _fine_stage_flops(B: int, K: int, T0: int = 16, T1: int = 6,
                      E: int = FINE_DIM, L: int = 6) -> float:
    """Analytic forward FLOPs of the fine matching stage per query batch:
    2·L alternating attention blocks (projections, attention core, MLP)
    over B·K pose-cell pairs + final projection + score matrix."""
    pairs = B * K
    per_block = 0.0
    for cross in (False, True):
        s0, s1 = (T1, T0) if cross else (T0, T1)
        for t, s in ((T0, s0), (T1, s1)):
            proj = (t + 2 * s + t) * E * E * 2          # q, k, v, merge
            core = 2 * (t * s) * E * 2                   # scores + weighted sum
            mlp = t * (2 * E * 2 * E + 2 * E * E) * 2    # [2E→2E→E]
            per_block += proj + core + mlp
    total = L * per_block                                 # L self+cross pairs
    total += (T0 + T1) * E * E * 2                        # final projection
    total += T0 * T1 * E * 2                              # score matrix
    return float(total) * pairs


def _compiled_cost(compiled):
    """(flops, hbm_bytes) from an AOT-compiled executable's XLA cost
    analysis, or (None, None) when the backend doesn't expose it. This is
    the *compiled program's* accounting (post-fusion), not an analytic
    model — the basis for the roofline numbers in the bench JSON."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        return (flops or None), (byts or None)
    except Exception:
        return None, None


def _roofline(flops, byts, measured_ms):
    """% of the hardware roofline achieved and which wall bounds it."""
    if not flops or not byts or not measured_ms:
        return None, None
    t_compute_ms = flops / (PEAK_TFLOPS * 1e12) * 1e3
    t_bw_ms = byts / (PEAK_GBS * 1e9) * 1e3
    bound = "compute" if t_compute_ms >= t_bw_ms else "bandwidth"
    return round(max(t_compute_ms, t_bw_ms) / measured_ms * 100.0, 2), bound


def _require_backend(timeout_s: float) -> None:
    """Fail fast (exit 3) if backend init hangs past ``timeout_s``.

    The remote-attached TPU runtime initializes through a relay; when the
    relay is down, PJRT client creation blocks in a retry loop with no
    timeout of its own, and the benchmark would hang forever instead of
    reporting a failure. ``jax.devices()`` runs in a worker thread so the
    watchdog can observe it; on timeout we ``os._exit`` (the blocked init
    thread is not interruptible from Python).
    """
    import threading

    done = threading.Event()

    def _init():
        import jax

        jax.devices()
        done.set()

    t = threading.Thread(target=_init, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        print(f"# ERROR: backend initialization did not complete within "
              f"{timeout_s:.0f}s — remote TPU runtime unreachable",
              flush=True)
        os._exit(3)


DB_CACHE = os.environ.get("T2P_BENCH_DB_CACHE",
                          "checkpoints/bench_db_cache.npz")
DB_CACHE_VERSION = "v1"


def _db_cache_key() -> str:
    """Cache key binding the offline DB precompute to the exact checkpoint
    bytes and serving protocol — any retrain or protocol change misses."""
    h = hashlib.sha256()
    for path in (CKPT_COARSE, CKPT_FINE):
        with open(path, "rb") as f:
            h.update(f.read())
    h.update(f"{DB_CACHE_VERSION}|{NUM_SCENES}|{NUM_CELLS_GRID}|"
             f"{NUM_QUERIES}|{TOP_K}|{DTYPE}|{CALIBRATE}".encode())
    return h.hexdigest()


def _load_db_cache(key: str):
    """Load (cell_enc, fine_bank, calibrated batch_stats) if the committed
    DB cache matches ``key``. The map is static at serving time, so the
    offline precompute (fine-bank encode + BN calibration — the largest
    XLA programs here, 927 s cold-compile in the BENCH_r03 kill) is run
    once after training and restored on every later bench run."""
    import flax

    if not os.path.isfile(DB_CACHE):
        return None
    try:
        with np.load(DB_CACHE) as z:
            if str(z["key"]) != key:
                print(f"# db cache: stale key, recomputing ({DB_CACHE})",
                      flush=True)
                return None
            import jax.numpy as jnp

            # Cast back to the exact dtypes the fresh path produces —
            # npz stores float32, but serving a bfloat16 program with
            # float32 banks would change the jit signature (full
            # recompile, 1060 s observed) and slow the matmuls ~25%.
            def _restore(name):
                arr = z[name]
                dt = str(z[name + "_dtype"]) if name + "_dtype" in z.files \
                    else None
                return jnp.asarray(arr, jnp.dtype(dt)) if dt else arr

            cell_enc = _restore("cell_enc")
            fb0, fb1 = _restore("fine_bank_enc"), _restore(
                "fine_bank_centers")
            bs = None
            if "batch_stats" in z.files:
                bs = flax.serialization.msgpack_restore(
                    z["batch_stats"].tobytes())
        return cell_enc, fb0, fb1, bs
    except Exception as e:  # corrupt cache must never kill the bench
        print(f"# db cache: load failed ({e!r}), recomputing", flush=True)
        return None


def _save_db_cache(key: str, cell_enc, fine_bank, batch_stats) -> None:
    import flax
    import jax

    arrays = dict(
        key=np.array(key),
        cell_enc=np.asarray(cell_enc, np.float32),
        cell_enc_dtype=np.array(str(np.asarray(cell_enc).dtype)),
        fine_bank_enc=np.asarray(fine_bank[0], np.float32),
        fine_bank_enc_dtype=np.array(str(np.asarray(fine_bank[0]).dtype)),
        fine_bank_centers=np.asarray(fine_bank[1], np.float32),
        fine_bank_centers_dtype=np.array(
            str(np.asarray(fine_bank[1]).dtype)),
    )
    if batch_stats is not None:
        raw = flax.serialization.msgpack_serialize(
            jax.tree.map(lambda x: np.asarray(x),
                         flax.core.unfreeze(batch_stats)))
        arrays["batch_stats"] = np.frombuffer(raw, np.uint8)
    tmp = DB_CACHE + ".tmp"
    os.makedirs(os.path.dirname(DB_CACHE) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, DB_CACHE)
    print(f"# db cache: saved {DB_CACHE} "
          f"({os.path.getsize(DB_CACHE)/1e6:0.1f} MB)", flush=True)


SERVE_EXEC_CACHE = os.environ.get("T2P_BENCH_EXEC_CACHE",
                                  "checkpoints/bench_serve_exec.pkl")


def _exec_mac(key: str, blob: bytes) -> str:
    """HMAC over the pickle bytes, keyed by the cache key (which embeds
    the checkpoint hashes). Unpickling is code execution; verifying the
    MAC before cloudpickle.load means a tampered/corrupted snapshot (or
    one produced without access to the checkpoint bytes) is rejected and
    recompiled instead of executed — mirroring the npz DB cache's
    key-check-before-use pattern."""
    import hmac

    return hmac.new(key.encode(), blob, hashlib.sha256).hexdigest()


def _load_serve_exec(key, path=None):
    """Restore an AOT-compiled executable snapshot if it matches ``key``.
    Self-produced pickle (same trust domain as the checkpoints), gated by
    a checkpoint-keyed MAC over the raw bytes; any mismatch, version
    skew, or load error falls back to compiling."""
    path = path or SERVE_EXEC_CACHE
    if key is None or not os.path.isfile(path):
        return None
    import hmac

    import cloudpickle
    import jax

    from jax.experimental import serialize_executable as se

    try:
        with open(path, "rb") as f:
            blob = f.read()
        mac_path = path + ".mac"
        if os.path.isfile(mac_path):
            with open(mac_path) as f:
                if not hmac.compare_digest(f.read().strip(),
                                           _exec_mac(key, blob)):
                    print(f"# serve exec: MAC mismatch, recompiling "
                          f"({path})", flush=True)
                    return None
        else:
            print(f"# serve exec: no MAC sidecar, recompiling ({path})",
                  flush=True)
            return None
        payload = cloudpickle.loads(blob)
        if payload.get("key") != key:
            print(f"# serve exec: stale key, recompiling ({path})",
                  flush=True)
            return None
        # Bench programs are single-chip: pin the load to one device.
        # (deserialize_and_load defaults to ALL local devices, which
        # breaks under --xla_force_host_platform_device_count=8.)
        loaded = se.deserialize_and_load(
            payload["serialized"], payload["in_tree"], payload["out_tree"],
            execution_devices=jax.devices()[:1])
        return loaded, payload.get("cost", (None, None))
    except Exception as e:
        print(f"# serve exec: load failed ({e!r}), recompiling", flush=True)
        return None


def _save_serve_exec(key, compiled, path=None) -> None:
    import cloudpickle

    from jax.experimental import serialize_executable as se

    path = path or SERVE_EXEC_CACHE
    try:
        serialized, in_tree, out_tree = se.serialize(compiled)
        blob = cloudpickle.dumps({"key": key, "serialized": serialized,
                                  "in_tree": in_tree, "out_tree": out_tree,
                                  "cost": _compiled_cost(compiled)})
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        with open(path + ".mac.tmp", "w") as f:
            f.write(_exec_mac(key, blob))
        os.replace(tmp, path)
        os.replace(path + ".mac.tmp", path + ".mac")
        print(f"# serve exec: saved {path} "
              f"({os.path.getsize(path)/1e6:0.1f} MB)", flush=True)
    except Exception as e:  # snapshotting is best-effort
        print(f"# serve exec: save failed ({e!r})", flush=True)


def run():
    _require_backend(float(os.environ.get("T2P_BENCH_INIT_TIMEOUT", 600)))

    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    pipe, loader, poses, vocab, trained = build()
    bank = loader.bank
    print(f"# bench: {bank.num_cells} DB cells, {len(poses)} queries, "
          f"dtype={DTYPE}, trained_weights={trained}, "
          f"devices={jax.devices()}", flush=True)

    tokens, lengths = loader.all_query_tokens()
    from text2pos_tpu.data.hints import create_hint_description

    H, Th = pipe.cfg.num_mentioned, pipe.cfg.max_hint_len
    hint_tokens = np.zeros((len(poses), H, Th), np.int32)
    hint_lengths = np.ones((len(poses), H), np.int32)
    for i, p in enumerate(poses):
        tk, ln = vocab.encode_batch(create_hint_description(p)[:H], Th)
        hint_tokens[i, : len(tk)] = tk
        hint_lengths[i, : len(ln)] = ln

    # ------------------------------------------------------------------
    # Offline: pre-encode the cell database — coarse retrieval embeddings
    # and the fine stage's query-independent object encodings (the map is
    # static at serving time). Timed separately from serving, and cached
    # on disk keyed by checkpoint hash: after a retrain the first bench
    # run computes + saves it, every later run (e.g. the driver's) loads
    # it and skips the biggest cold compiles in the process.
    # ------------------------------------------------------------------
    cache_key = _db_cache_key() if trained else None
    cached = _load_db_cache(cache_key) if cache_key else None
    if cached is not None:
        cell_enc, fb0, fb1, cached_bs = cached
        cell_enc_dev = jnp.asarray(cell_enc)
        fine_bank = (jnp.asarray(fb0), jnp.asarray(fb1))
        if CALIBRATE and cached_bs is not None:
            pipe = pipe.with_calibrated_stats(
                jax.tree.map(jnp.asarray, cached_bs))
        jax.block_until_ready(fine_bank)
        print(f"# db cache: restored {bank.num_cells} cells from {DB_CACHE} "
              f"({time.time()-T_START:0.1f}s into run)", flush=True)
    else:
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
        if CALIBRATE:
            # Freeze the fine stage's BN statistics on the serving
            # population and serve in true eval mode: per-query results
            # become independent of co-batched queries and the serving
            # program is purely per-pair (pipeline.calibrated_for_serving).
            # Calibration retrievals come from the model itself.
            text_enc_cal = pipe.coarse.encode_all_queries(pipe.coarse_state,
                                                          loader)
            from text2pos_tpu.ops.retrieval import topk_retrieval as _topk

            _, cal_idx = _topk(jnp.asarray(text_enc_cal), cell_enc_dev,
                               TOP_K)
            pipe, fine_bank = pipe.calibrated_for_serving(
                bank, bank_dev, hint_tokens, hint_lengths,
                np.asarray(cal_idx))
            jax.block_until_ready(fine_bank)
            print(f"# fine db encode + BN calibration: {bank.num_cells} "
                  f"cells in {time.time()-t0:0.1f}s (incl. compile)",
                  flush=True)
        else:
            fine_bank = pipe.precompute_fine_bank(bank, bank_dev)
            jax.block_until_ready(fine_bank)
            print(f"# fine db encode: {bank.num_cells} cells in "
                  f"{time.time()-t0:0.1f}s (incl. compile)", flush=True)
        if cache_key:
            _save_db_cache(cache_key, cell_enc, fine_bank,
                           pipe.fine_state.batch_stats if CALIBRATE
                           else None)

    # ------------------------------------------------------------------
    # Serving path: the ENTIRE query batch in one jitted program
    # (text encode → top-k retrieval → fine matching → positions).
    # ------------------------------------------------------------------

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

    # AOT-compile the serve program once (jax.stages): the same executable
    # serves every repetition AND exposes XLA's post-fusion cost analysis
    # (FLOPs + HBM bytes) for the roofline accounting below. The compiled
    # executable is persisted next to the DB cache: the remote-attached
    # runtime does not reliably honor jax's persistent *compilation*
    # cache (an identical serve program recompiled for 1060 s in one
    # observed run), so we snapshot the executable itself
    # (jax.experimental.serialize_executable) keyed by checkpoint hash +
    # shapes + jax version + device kind and restore it on later runs.
    t0 = time.time()
    tk0, ln0, htk0, hln0 = rep_args[0]
    exec_key = (f"{cache_key}|{jax.__version__}|"
                f"{jax.devices()[0].device_kind}|"
                f"{tk0.shape}|{htk0.shape}|{cell_enc_dev.shape}|"
                f"{fine_bank[0].shape}|"
                f"fg{os.environ.get('T2P_FAST_GRAPH', '0')}"
                if cache_key else None)
    def _compile_serve():
        exe = type(pipe).serve_batch.lower(
            pipe, pipe.coarse_state, pipe.fine_state, tk0, ln0, htk0, hln0,
            cell_enc_dev, TOP_K, fine_bank[0], fine_bank[1]).compile()
        return exe, _compiled_cost(exe)

    restored = _load_serve_exec(exec_key)
    if restored is None:
        serve_exec, (serve_flops, serve_bytes) = _compile_serve()
        if exec_key:
            _save_serve_exec(exec_key, serve_exec)
    else:
        serve_exec, (serve_flops, serve_bytes) = restored
        print(f"# serve exec: restored {SERVE_EXEC_CACHE} "
              f"({time.time()-T_START:0.1f}s into run)", flush=True)

    def serve_dispatch(i):
        tk, ln, htk, hln = rep_args[i]
        return serve_exec(pipe.coarse_state, pipe.fine_state, tk, ln,
                          htk, hln, cell_enc_dev,
                          fine_bank[0], fine_bank[1])

    # Materialize results to host — the serving contract includes getting
    # the positions back. One batched fetch (the tunnel to the
    # remote-attached chip has high per-transfer latency). A restored
    # executable that fails at call time (runtime skew) falls back to a
    # fresh compile instead of killing the record.
    try:
        jax.device_get(serve_dispatch(reps))  # warm
    except Exception as e:
        if restored is None:
            raise
        print(f"# serve exec: restored executable failed at call time "
              f"({e!r}), recompiling", flush=True)
        serve_exec, (serve_flops, serve_bytes) = _compile_serve()
        if exec_key:
            _save_serve_exec(exec_key, serve_exec)
        jax.device_get(serve_dispatch(reps))
    print(f"# pipeline compile+first run: {time.time()-t0:0.1f}s", flush=True)

    # Steady state, software-pipelined: batch i+1 is dispatched before
    # batch i's results are fetched, so the device computes the next batch
    # while the previous results ride the D2H DMA (jax async dispatch).
    t0 = time.time()
    pending = serve_dispatch(0)
    for i in range(1, reps):
        nxt = serve_dispatch(i)
        top_idx, pos_mean, pos_offsets, conf = jax.device_get(pending)
        pending = nxt
    top_idx, pos_mean, pos_offsets, conf = jax.device_get(pending)
    elapsed = (time.time() - t0) / reps
    qps = len(poses) / elapsed
    inv = np.argsort(perms[reps - 1])
    top_idx, pos_offsets = np.asarray(top_idx)[inv], np.asarray(pos_offsets)[inv]
    accs = pipe._accuracies(poses, bank, top_idx, pos_offsets)
    acc10_15 = accs[TOP_K][15]
    print(f"# steady-state: {len(poses)} queries in {elapsed:0.3f}s "
          f"→ {qps:0.1f} q/s; top-{TOP_K}@15m={acc10_15:0.3f} "
          f"(top-1@15m={accs[1][15]:0.3f}, top-{TOP_K}@5m={accs[TOP_K][5]:0.3f})",
          flush=True)

    # Accuracy brackets (reference oracle modes, evaluation/args.py:44-50):
    # random retrieval from below, perfect in-cell positions from above.
    rng_np = np.random.default_rng(0)
    rand_idx = rng_np.integers(0, bank.num_cells, size=top_idx.shape)
    acc_random = pipe._accuracies(
        poses, bank, rand_idx,
        np.full(top_idx.shape + (2,), 0.5))[TOP_K][15]
    acc_oracle = pipe.run_fine_oracle(loader, poses, top_idx)[TOP_K][15]
    print(f"# brackets: coarse_random={acc_random:0.3f} ≤ model={acc10_15:0.3f}"
          f" ≤ fine_oracle(same retrievals)={acc_oracle:0.3f}", flush=True)

    # ------------------------------------------------------------------
    # Reference-style execution: per-query host loop (same models, same
    # chip, the reference's batching pattern — /root/reference/evaluation/
    # pipeline.py:190-202). Runs BEFORE the headline JSON so vs_baseline
    # is real; skipped only when the budget is nearly gone.
    # ------------------------------------------------------------------
    ref_qps = None
    if _remaining() > 240:
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
                          use_cache=False)                   # re-encode/query
        one_query(0)  # compile the chunk=1 path
        t0 = time.time()
        for qi in range(BASELINE_QUERIES):
            one_query(qi)
        ref_elapsed = time.time() - t0
        ref_qps = BASELINE_QUERIES / ref_elapsed
        print(f"# reference-style loop: {BASELINE_QUERIES} queries in "
              f"{ref_elapsed:0.3f}s → {ref_qps:0.1f} q/s", flush=True)
    else:
        print(f"# reference-style loop: skipped "
              f"({_remaining():0.0f}s budget left)", flush=True)

    # ------------------------------------------------------------------
    # HEADLINE RECORD — emitted now, before any optional extras, so a
    # driver timeout mid-extras can never cost the round's record again
    # (BENCH_r03 died after 1290 s of cold compiles with no JSON line).
    # Extras below append to `record` and re-print an enriched final line;
    # a parser taking either the first or the last JSON line gets a
    # complete result.
    # ------------------------------------------------------------------
    record = {
        "metric": "localization_queries_per_sec",
        "value": round(qps, 2),
        "unit": "queries/s",
        "vs_baseline": (round(qps / ref_qps, 2) if ref_qps else None),
        "db_cells": int(bank.num_cells),
        "queries": len(poses),
        "trained_weights": trained,
        "bn_mode": "calibrated" if CALIBRATE else "batch_stats",
        "top10_at_15m": round(float(acc10_15), 4),
        "top1_at_15m": round(float(accs[1][15]), 4),
        "bracket_coarse_random": round(float(acc_random), 4),
        "bracket_fine_oracle": round(float(acc_oracle), 4),
        "serve_gflops": (round(serve_flops / 1e9, 1) if serve_flops else None),
        "serve_hbm_gb": (round(serve_bytes / 1e9, 2) if serve_bytes else None),
    }
    print(json.dumps(record), flush=True)

    # ------------------------------------------------------------------
    # Per-stage device time + fine-stage MFU (timed reps, distinct args),
    # budget-gated: two small extra compiles.
    # ------------------------------------------------------------------
    if _remaining() > 150:
        cstate, fstate = pipe.coarse_state, pipe.fine_state

        def _timed(fn, arglists):
            out = fn(*arglists[-1])
            jax.block_until_ready(out)
            t0 = time.time()
            for a in arglists[:-1]:
                out = fn(*a)
            jax.block_until_ready(out)
            return (time.time() - t0) / (len(arglists) - 1) * 1000.0

        @jax.jit
        def _text_retrieve(tk, ln):
            enc = pipe.coarse.model.apply(
                {"params": cstate.params, "batch_stats": cstate.batch_stats},
                tk, ln, method=type(pipe.coarse.model).encode_text)
            from text2pos_tpu.ops.retrieval import topk_retrieval

            return topk_retrieval(enc, cell_enc_dev, TOP_K)[1]

        @jax.jit
        def _fine_match(tidx, htk, hln):
            return pipe._match_chunk_cached(fstate, fine_bank[0],
                                            fine_bank[1], tidx, htk, hln)

        def _cached_exec(name, lowered_fn, probe_args):
            """Executable snapshot for the per-stage extras: restore, probe
            with one real call, fall back to compile+save on any failure."""
            path = SERVE_EXEC_CACHE.replace(".pkl", f"_{name}.pkl")
            key = f"{exec_key}|{name}" if exec_key else None
            restored = _load_serve_exec(key, path)
            if restored is not None:
                exe, cost = restored
                try:
                    jax.block_until_ready(exe(*probe_args))
                    return exe, cost
                except Exception as e:
                    print(f"# {name} exec: restored executable failed "
                          f"({e!r}), recompiling", flush=True)
            exe = lowered_fn().compile()
            if key:
                _save_serve_exec(key, exe, path)
            return exe, _compiled_cost(exe)

        tr_exec, (tr_flops, tr_bytes) = _cached_exec(
            "tr", lambda: _text_retrieve.lower(*rep_args[0][:2]),
            rep_args[0][:2])
        tr_ms = _timed(tr_exec, [(a[0], a[1]) for a in rep_args])
        tops_dev = [tr_exec(a[0], a[1]) for a in rep_args]
        jax.block_until_ready(tops_dev)
        fm_exec, (fm_flops, fm_bytes) = _cached_exec(
            "fm", lambda: _fine_match.lower(tops_dev[0], rep_args[0][2],
                                            rep_args[0][3]),
            (tops_dev[0], rep_args[0][2], rep_args[0][3]))
        fine_ms = _timed(fm_exec,
                         [(t, a[2], a[3]) for t, a in zip(tops_dev,
                                                          rep_args)])
        fine_flops = _fine_stage_flops(len(poses), TOP_K)
        fine_mfu = (fine_flops / (fine_ms / 1000.0)
                    / (PEAK_TFLOPS * 1e12) * 100.0)
        print(f"# device stages: text+retrieval {tr_ms:0.1f} ms, fine match "
              f"{fine_ms:0.1f} ms ({fine_flops/1e9:0.1f} GFLOP → "
              f"{fine_mfu:0.2f}% MFU of {PEAK_TFLOPS:0.0f} TFLOP/s peak)",
              flush=True)

        # Roofline accounting from the compiled executables themselves
        # (XLA post-fusion FLOPs + HBM traffic vs the chip's two walls):
        # says not just how fast each stage is, but how fast it COULD be
        # and which resource binds it.
        fine_roof_pct, fine_bound = _roofline(fm_flops, fm_bytes, fine_ms)
        tr_roof_pct, tr_bound = _roofline(tr_flops, tr_bytes, tr_ms)
        for name, fl, by, ms, pct, bound in (
                ("text+retrieval", tr_flops, tr_bytes, tr_ms, tr_roof_pct,
                 tr_bound),
                ("fine match", fm_flops, fm_bytes, fine_ms, fine_roof_pct,
                 fine_bound)):
            if pct is not None:
                print(f"# roofline[{name}]: {fl/1e9:0.1f} GFLOP, "
                      f"{by/1e9:0.2f} GB HBM → {bound}-bound, {pct:0.1f}% "
                      f"of roofline at {ms:0.1f} ms", flush=True)
        record.update({
            "device_ms_text_retrieval": round(tr_ms, 1),
            "device_ms_fine_match": round(fine_ms, 1),
            "fine_mfu_pct": round(fine_mfu, 2),
            "fine_roofline_pct": fine_roof_pct,
            "fine_bound": fine_bound,
            "text_retrieval_roofline_pct": tr_roof_pct,
            "text_retrieval_bound": tr_bound,
        })
        print(json.dumps(record), flush=True)
    else:
        print(f"# per-stage timing: skipped ({_remaining():0.0f}s budget "
              f"left)", flush=True)

    # ------------------------------------------------------------------
    # Fine-confidence re-ranking (TPU-native addition, serve_batch
    # rerank_k): retrieve RERANK_K coarse candidates, fine-match all of
    # them, return the top-10 best by summed matched transport score.
    # Raises the top-10 ceiling from coarse top-10 recall to coarse
    # top-RERANK_K recall at RERANK_K/10× the fine-stage compute. The
    # headline protocol above stays the reference protocol; this is
    # measured separately. T2P_BENCH_RERANK=0 disables.
    # ------------------------------------------------------------------
    # Operating point from scripts/sweep_rerank.py on the trained bench
    # checkpoints: top-10@15m 0.496 (no rerank) → 0.664 @ k'=40 → 0.694
    # @ k'=64 → 0.770 @ k'=100 → 0.779 @ k'=128 (with the spread/sim
    # fusion below), always best at lambda=4. Default k'=128: the last
    # ~1 pt costs 28% more fine compute but rerank throughput stays
    # >2k q/s (k'=64 → 4.4k q/s at 0.694 if latency matters more).
    RERANK_K = int(os.environ.get("T2P_BENCH_RERANK", 128))
    RERANK_LAMBDA = float(os.environ.get("T2P_BENCH_RERANK_LAMBDA", 4.0))
    # Spread penalty (scripts/rerank_score_lab.py): conf + lam*sim -
    # gamma*spread, gamma=6 lifts top-10@15m 0.715 -> ~0.779 offline at
    # K'=100-128 (top-1 0.385 -> 0.520); stable across split halves.
    RERANK_GAMMA = float(os.environ.get("T2P_BENCH_RERANK_GAMMA", 6.0))
    # Cascaded re-ranking (serve_batch prune_m): cheap truncated-matcher
    # pass over all RERANK_K candidates, full fine pass only on the top
    # PRUNE_M. Operating point from scripts/sweep_cascade.py on the
    # trained checkpoints: L1:S6 keeps brute-rerank accuracy to within
    # noise (0.7798 @ M=32 vs 0.7793 brute) at a fraction of the full
    # fine compute. PRUNE_M=0 disables the third operating point.
    PRUNE_M = int(os.environ.get("T2P_BENCH_PRUNE_M", 24))
    PRUNE_LAYERS = int(os.environ.get("T2P_BENCH_PRUNE_LAYERS", 1))
    PRUNE_SINKHORN = int(os.environ.get("T2P_BENCH_PRUNE_SINKHORN", 6))
    PRUNE_INT8 = os.environ.get("T2P_BENCH_PRUNE_INT8", "1") == "1"
    PRUNE_SOFT = os.environ.get("T2P_BENCH_PRUNE_SOFT", "0") == "1"
    if (RERANK_K > TOP_K and bank.num_cells >= RERANK_K
            and _remaining() > 180):
        t0 = time.time()
        rr_path = SERVE_EXEC_CACHE.replace(".pkl", f"_rr{RERANK_K}.pkl")
        rr_key = (f"{exec_key}|rerank{RERANK_K}|lam{RERANK_LAMBDA}"
                  f"|gam{RERANK_GAMMA}" if exec_key else None)

        def _compile_rr():
            return type(pipe).serve_batch.lower(
                pipe, pipe.coarse_state, pipe.fine_state, tk0, ln0, htk0,
                hln0, cell_enc_dev, TOP_K, fine_bank[0], fine_bank[1],
                RERANK_K, RERANK_LAMBDA, RERANK_GAMMA).compile()

        rr_restored = _load_serve_exec(rr_key, rr_path)
        if rr_restored is None:
            rr_exec = _compile_rr()
            if rr_key:
                _save_serve_exec(rr_key, rr_exec, rr_path)
        else:
            rr_exec = rr_restored[0]

        def rr_dispatch(i):
            tk, ln, htk, hln = rep_args[i]
            return rr_exec(pipe.coarse_state, pipe.fine_state, tk, ln,
                           htk, hln, cell_enc_dev, fine_bank[0], fine_bank[1])

        try:
            jax.device_get(rr_dispatch(reps))  # compile+warm
        except Exception as e:
            if rr_restored is None:
                raise
            print(f"# rerank exec: restored executable failed at call time "
                  f"({e!r}), recompiling", flush=True)
            rr_exec = _compile_rr()
            if rr_key:
                _save_serve_exec(rr_key, rr_exec, rr_path)
            jax.device_get(rr_dispatch(reps))
        print(f"# rerank compile+first run: {time.time()-t0:0.1f}s",
              flush=True)
        t0 = time.time()
        pending = rr_dispatch(0)
        for i in range(1, reps):
            nxt = rr_dispatch(i)
            out = jax.device_get(pending)
            pending = nxt
        out = jax.device_get(pending)
        rr_elapsed = (time.time() - t0) / reps
        rr_qps = len(poses) / rr_elapsed
        rr_top = np.asarray(out[0], np.int64)[inv]
        rr_pos = np.asarray(out[2], np.float32)[inv]
        accs_rr = pipe._accuracies(poses, bank, rr_top, rr_pos)

        # Ceiling: perfect in-cell positions over ALL RERANK_K candidates
        # (= coarse top-RERANK_K recall within 15 m).
        text_enc_all = pipe.coarse.encode_all_queries(pipe.coarse_state,
                                                      loader)
        from text2pos_tpu.ops.retrieval import topk_retrieval as _topk_rr

        _, wide_idx = _topk_rr(jnp.asarray(text_enc_all), cell_enc_dev,
                               RERANK_K)
        wide_idx = np.asarray(wide_idx)
        pose_w = np.array([p.pose_w[0:2] for p in poses])
        lo = bank.bbox_w[wide_idx][..., 0:2]
        size = bank.cell_size[wide_idx][..., None]
        perfect = np.clip((pose_w[:, None, :] - lo) / size, 0, 1)
        rr_ceiling = pipe._accuracies(poses, bank, wide_idx, perfect,
                                      top_k=(RERANK_K,))[RERANK_K][15]
        print(f"# rerank@{RERANK_K}: {rr_qps:0.1f} q/s, top-{TOP_K}@15m="
              f"{accs_rr[TOP_K][15]:0.3f} (top-1@15m={accs_rr[1][15]:0.3f}; "
              f"ceiling coarse top-{RERANK_K} recall={rr_ceiling:0.3f})",
              flush=True)
        record.update({
            "rerank_k": RERANK_K,
            "rerank_lambda": RERANK_LAMBDA,
            "rerank_gamma": RERANK_GAMMA,
            "rerank_qps": round(rr_qps, 2),
            "rerank_top10_at_15m": round(float(accs_rr[TOP_K][15]), 4),
            "rerank_top1_at_15m": round(float(accs_rr[1][15]), 4),
            "rerank_ceiling_recall": round(float(rr_ceiling), 4),
        })
        print(json.dumps(record), flush=True)
    elif RERANK_K > TOP_K:
        print(f"# rerank: skipped ({_remaining():0.0f}s budget left)",
              flush=True)

    # ------------------------------------------------------------------
    # CASCADED re-ranking operating point (round-5 headline): cheap
    # truncated-matcher pass over all RERANK_K candidates (optionally
    # against an int8 bank), full fine pass only on the top PRUNE_M —
    # one operating point that is simultaneously accurate AND fast,
    # collapsing the brute-rerank throughput cliff.
    # ------------------------------------------------------------------
    if (PRUNE_M and TOP_K < PRUNE_M < RERANK_K
            and bank.num_cells >= RERANK_K and _remaining() > 150):
        t0 = time.time()
        cheap = ()
        if PRUNE_INT8:
            from text2pos_tpu.evaluation.pipeline import quantize_fine_bank

            cheap = quantize_fine_bank(fine_bank[0])
        cs_path = SERVE_EXEC_CACHE.replace(
            ".pkl", f"_cs{RERANK_K}m{PRUNE_M}.pkl")
        cs_key = (f"{exec_key}|cascade{RERANK_K}|m{PRUNE_M}|L{PRUNE_LAYERS}"
                  f"|S{PRUNE_SINKHORN}|lam{RERANK_LAMBDA}|gam{RERANK_GAMMA}"
                  f"|int8{int(PRUNE_INT8)}|soft{int(PRUNE_SOFT)}"
                  if exec_key else None)

        def _compile_cs():
            return type(pipe).serve_batch.lower(
                pipe, pipe.coarse_state, pipe.fine_state, tk0, ln0, htk0,
                hln0, cell_enc_dev, TOP_K, fine_bank[0], fine_bank[1],
                RERANK_K, RERANK_LAMBDA, RERANK_GAMMA, PRUNE_M,
                PRUNE_LAYERS, PRUNE_SINKHORN, PRUNE_SOFT,
                *cheap).compile()

        cs_restored = _load_serve_exec(cs_key, cs_path)
        if cs_restored is None:
            cs_exec = _compile_cs()
            if cs_key:
                _save_serve_exec(cs_key, cs_exec, cs_path)
        else:
            cs_exec = cs_restored[0]

        def cs_dispatch(i):
            tk, ln, htk, hln = rep_args[i]
            return cs_exec(pipe.coarse_state, pipe.fine_state, tk, ln,
                           htk, hln, cell_enc_dev, fine_bank[0],
                           fine_bank[1], *cheap)

        try:
            jax.device_get(cs_dispatch(reps))  # compile+warm
        except Exception as e:
            if cs_restored is None:
                raise
            print(f"# cascade exec: restored executable failed at call "
                  f"time ({e!r}), recompiling", flush=True)
            cs_exec = _compile_cs()
            if cs_key:
                _save_serve_exec(cs_key, cs_exec, cs_path)
            jax.device_get(cs_dispatch(reps))
        print(f"# cascade compile+first run: {time.time()-t0:0.1f}s",
              flush=True)
        t0 = time.time()
        pending = cs_dispatch(0)
        for i in range(1, reps):
            nxt = cs_dispatch(i)
            out = jax.device_get(pending)
            pending = nxt
        out = jax.device_get(pending)
        cs_elapsed = (time.time() - t0) / reps
        cs_qps = len(poses) / cs_elapsed
        cs_top = np.asarray(out[0], np.int64)[inv]
        cs_pos = np.asarray(out[2], np.float32)[inv]
        accs_cs = pipe._accuracies(poses, bank, cs_top, cs_pos)
        print(f"# cascade@{RERANK_K}->m{PRUNE_M} (L{PRUNE_LAYERS}:"
              f"S{PRUNE_SINKHORN}{', int8' if PRUNE_INT8 else ''}): "
              f"{cs_qps:0.1f} q/s, top-{TOP_K}@15m="
              f"{accs_cs[TOP_K][15]:0.3f} "
              f"(top-1@15m={accs_cs[1][15]:0.3f})", flush=True)
        record.update({
            "cascade_prune_m": PRUNE_M,
            "cascade_prune_layers": PRUNE_LAYERS,
            "cascade_prune_sinkhorn": PRUNE_SINKHORN,
            "cascade_prune_soft": PRUNE_SOFT,
            "cascade_bank_dtype": "int8" if PRUNE_INT8 else DTYPE,
            "cascade_qps": round(cs_qps, 2),
            "cascade_top10_at_15m": round(float(accs_cs[TOP_K][15]), 4),
            "cascade_top1_at_15m": round(float(accs_cs[1][15]), 4),
        })
        print(json.dumps(record), flush=True)
    elif PRUNE_M:
        print(f"# cascade: skipped ({_remaining():0.0f}s budget left)",
              flush=True)


if __name__ == "__main__":
    run()
