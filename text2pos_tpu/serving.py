"""Production serving front-end: checkpoints + map → world positions.

The reference has no serving story — its evaluation script
(/root/reference/evaluation/pipeline.py:282-343) is the closest thing, a
per-query host loop over torch models. This module packages the rebuilt
pipeline's serving path behind one object:

    server = LocalizationServer("coarse.msgpack", "fine.msgpack", cells)
    result = server.localize([["the pose is east of a gray building",
                               "it is north of a green vegetation"], ...])
    result["positions"]   # [Q, 3] world coordinates (best cell)

Setup encodes the whole map once (coarse retrieval embeddings + the fine
stage's query-independent object encodings), calibrates the fine stage's
BatchNorms on population statistics (true eval mode — each query's result
is independent of its co-batched queries; see
``LocalizationPipeline.calibrated_for_serving``), and serving then runs
text encode → top-k retrieval → fine matching → in-cell positions as ONE
jitted program per batch (``serve_batch``).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from text2pos_tpu.config import EvalConfig

BANK_KEYS = ("points_xyz", "points_rgb", "point_count", "centers", "colors",
             "class_idx", "color_idx", "mask")


class LocalizationServer:
    """End-to-end text→position serving against a static cell map."""

    def __init__(self, path_coarse: str, path_fine: str, cells: Sequence,
                 cfg: Optional[EvalConfig] = None, top_k: int = 10,
                 dtype: Optional[str] = "bfloat16", calibrate: bool = True,
                 calibration_hints: Optional[Sequence[Sequence[str]]] = None,
                 data_parallel: int = 1, rerank_k: int = 0,
                 shard_db: bool = False, rerank_lambda: float = 0.0,
                 rerank_gamma: float = 0.0, prune_m: int = 0,
                 prune_layers: int = 1, prune_sinkhorn: int = 10,
                 prune_soft: bool = False, int8_cheap_bank: bool = False):
        """Args:
            path_coarse/path_fine: msgpack checkpoints (train.coarse /
                train.fine output, or convert_whole_model output).
            cells: the map (Cell objects, e.g. from data.prepare or a
                dataset pickle).
            top_k: retrieved cells per query.
            rerank_k: when > top_k, retrieve this many coarse candidates,
                fine-match all of them and return the top_k highest by
                summed matched transport score (fine-confidence
                re-ranking; ``rerank_k/top_k``× fine-stage compute).
            rerank_lambda: blend weight of the coarse retrieval
                similarity in the re-ranking score (``conf + λ·sim``);
                λ≈2–4 measurably helps at wide pools
                (scripts/sweep_rerank.py).
            rerank_gamma: penalty weight of the matched position votes'
                spread in the re-ranking score (``… − γ·spread``); γ≈6
                is the strongest single re-ranking signal found by the
                offline lab (scripts/rerank_score_lab.py: +6 pts
                top-10@15m, +13 pts top-1@15m at rerank_k=100 on the
                bench protocol).
            dtype: serving compute dtype for the model bodies.
            calibrate: freeze fine-stage BN statistics on population data
                and serve in true eval mode (recommended; False keeps the
                reference's batch-statistics behaviour).
            calibration_hints: optional hint lists used to calibrate the
                GNN statistics; defaults to synthetic descriptions of the
                map's own cells via their object vocabulary — pass real
                queries when available for best-matched statistics.
            data_parallel: shard each query batch over this many devices
                (1-D dp mesh; requires ``calibrate`` — batch-statistics
                serving is not shard-invariant — and query batches
                divisible by the device count).
            shard_db: with ``data_parallel > 1``, also shard the MAP over
                the mesh (ring-rotated retrieval + fine-bank gather,
                ``parallel.dp.dp_serve_batch_dbsharded``) — for
                city-scale maps larger than one chip's HBM. Per-device
                memory for the DB drops by the mesh size; results are
                bit-identical to the replicated-DB mode.
            prune_m: CASCADED re-ranking (requires ``rerank_k > prune_m
                > top_k``): cheap-score all rerank_k candidates with a
                truncated matcher, keep the best prune_m, full
                fine-match only those. Collapses the brute-force
                re-ranking's throughput cliff at ~no accuracy cost
                (pipeline.serve_batch docstring).
            prune_layers / prune_sinkhorn: depth of the cheap pass
                (GNN self/cross pairs of the trained matcher; Sinkhorn
                iterations).
            int8_cheap_bank: feed the cheap pass an int8-quantized fine
                bank (per-object scales) — halves the widest gather's
                HBM traffic. Single-device serving only.
        """
        from text2pos_tpu.data.dense import build_cell_bank
        from text2pos_tpu.evaluation.pipeline import (
            build_pipeline_from_checkpoints)

        self.cfg = cfg or EvalConfig(top_k=(1, 5, top_k), threshs=(5, 10, 15))
        self.top_k = top_k
        self.rerank_k = rerank_k
        self.rerank_lambda = float(rerank_lambda)
        self.rerank_gamma = float(rerank_gamma)
        self.prune_m = int(prune_m)
        self.prune_layers = int(prune_layers)
        self.prune_sinkhorn = int(prune_sinkhorn)
        self.prune_soft = bool(prune_soft)
        if prune_m and not (top_k < prune_m < rerank_k):
            raise ValueError(f"cascaded re-ranking needs top_k < prune_m "
                             f"< rerank_k, got {top_k}/{prune_m}/{rerank_k}")
        pipe, vocab, _ = build_pipeline_from_checkpoints(
            self.cfg, path_coarse, path_fine, dtype=dtype)
        self.vocab = vocab

        self.bank = build_cell_bank(list(cells), self.cfg.coarse_max_objects,
                                    self.cfg.pointnet_numpoints,
                                    seed=self.cfg.seed)
        self._bank_dev = {k: jnp.asarray(getattr(self.bank, k))
                          for k in BANK_KEYS}

        # Offline map encode (coarse retrieval embeddings).
        self.cell_enc = jnp.asarray(pipe.coarse.encode_all_cells(
            pipe.coarse_state, self.bank, jax.random.PRNGKey(self.cfg.seed)))

        if calibrate:
            htk, hln = self._calibration_tokens(calibration_hints)
            # Calibration retrievals from the model itself over the
            # calibration hints' joined texts.
            tk, ln = self.vocab.encode_batch(
                [" ".join(h) for h in self._cal_hint_lists],
                self.cfg.max_text_len)
            enc = self._encode_text(pipe, tk, ln)
            from text2pos_tpu.ops.retrieval import topk_retrieval

            k = min(top_k, self.bank.num_cells)
            _, cal_idx = topk_retrieval(enc, self.cell_enc, k)
            pipe, self.fine_bank = pipe.calibrated_for_serving(
                self.bank, self._bank_dev, htk, hln, np.asarray(cal_idx))
        else:
            self.fine_bank = pipe.precompute_fine_bank(self.bank,
                                                       self._bank_dev)
        self.pipe = pipe

        self.cheap_bank = (None, None)
        if int8_cheap_bank:
            if data_parallel > 1:
                raise ValueError("int8_cheap_bank is single-device only")
            from text2pos_tpu.evaluation.pipeline import quantize_fine_bank

            self.cheap_bank = quantize_fine_bank(self.fine_bank[0])

        self._dp_serve = None
        if data_parallel > 1:
            if not calibrate:
                raise ValueError("data_parallel serving requires calibrate="
                                 "True (batch-statistics BN is not "
                                 "shard-invariant)")
            from text2pos_tpu.parallel.dp import (dp_serve_batch,
                                                  dp_serve_batch_dbsharded,
                                                  make_mesh)

            self._dp = data_parallel
            k = min(top_k, self.bank.num_cells)
            rk = min(rerank_k, self.bank.num_cells)
            if shard_db:
                # Zero-pad the DB arrays to a multiple of the mesh size;
                # the serve program masks the dummies to -inf by global
                # index, so they can never be retrieved.
                C = self.cell_enc.shape[0]
                padn = (-C) % data_parallel
                if padn:
                    z = lambda a: jnp.concatenate(
                        [a, jnp.zeros((padn,) + a.shape[1:], a.dtype)])
                    self.cell_enc = z(self.cell_enc)
                    self.fine_bank = (z(self.fine_bank[0]),
                                      z(self.fine_bank[1]))
                self._dp_serve = dp_serve_batch_dbsharded(
                    pipe, make_mesh(data_parallel), k, rk,
                    num_real_cells=C, rerank_lambda=self.rerank_lambda,
                    rerank_gamma=self.rerank_gamma, prune_m=self.prune_m,
                    prune_layers=self.prune_layers,
                    prune_sinkhorn=self.prune_sinkhorn,
                    prune_soft=self.prune_soft)
            else:
                self._dp_serve = dp_serve_batch(
                    pipe, make_mesh(data_parallel), k, rk,
                    rerank_lambda=self.rerank_lambda,
                    rerank_gamma=self.rerank_gamma, prune_m=self.prune_m,
                    prune_layers=self.prune_layers,
                    prune_sinkhorn=self.prune_sinkhorn,
                    prune_soft=self.prune_soft)

    # ------------------------------------------------------------------
    def _encode_text(self, pipe, tokens, lengths):
        model = pipe.coarse.model
        return model.apply(
            {"params": pipe.coarse_state.params,
             "batch_stats": pipe.coarse_state.batch_stats},
            jnp.asarray(tokens), jnp.asarray(lengths),
            method=type(model).encode_text)

    def _calibration_tokens(self, calibration_hints):
        """Tokenize calibration hints (or fabricate neutral ones from the
        map's class/color vocabulary when none are given)."""
        if calibration_hints is None:
            from text2pos_tpu.constants import (CLASS_TO_LABEL, COLOR_NAMES,
                                                DIRECTIONS)

            labels = sorted(CLASS_TO_LABEL)
            rng = np.random.default_rng(self.cfg.seed)
            calibration_hints = []
            for _ in range(min(256, max(self.bank.num_cells, 32))):
                hints = []
                for _o in range(self.cfg.num_mentioned):
                    d = DIRECTIONS[rng.integers(len(DIRECTIONS))]
                    col = COLOR_NAMES[rng.integers(len(COLOR_NAMES))]
                    cls = labels[rng.integers(len(labels))]
                    hints.append(f"The pose is {d} of a {col} {cls}.")
                calibration_hints.append(hints)
        self._cal_hint_lists = [list(h)[: self.cfg.num_mentioned]
                                for h in calibration_hints]
        # Calibration only gathers BN statistics; repeating short hint
        # lists is always acceptable there.
        return self._hint_tokens(self._cal_hint_lists, pad_short=True)

    def _hint_tokens(self, hint_lists: Sequence[Sequence[str]],
                     pad_short: bool = False):
        """Tokenize per-query hint lists to the static [Q, H, T] layout.

        The matcher has no hint-validity mask — all H slots participate in
        GNN matching, Sinkhorn and the offsets head — so a query with fewer
        than ``num_mentioned`` hints must never be padded with empty
        pseudo-hints (they would skew its matches). Short queries either
        raise (default) or, with ``pad_short``, are padded by cyclically
        repeating their own real hints, which only restates landmarks the
        query already mentions.
        """
        Q = len(hint_lists)
        H, Th = self.cfg.num_mentioned, self.cfg.max_hint_len
        htk = np.zeros((Q, H, Th), np.int32)
        hln = np.ones((Q, H), np.int32)
        short = [i for i, h in enumerate(hint_lists) if len(list(h)) < H]
        if short and not pad_short:
            raise ValueError(
                f"queries {short[:8]}{'…' if len(short) > 8 else ''} have "
                f"fewer than num_mentioned={H} hints; the matcher expects "
                f"exactly {H} hints per query. Pass pad_short_queries=True "
                "to pad by repeating each query's own hints.")
        for i, hints in enumerate(hint_lists):
            hints = list(hints)[:H]
            if not hints:
                raise ValueError(f"query {i} has no hints")
            if len(hints) < H:
                hints = (hints * (H // len(hints) + 1))[:H]
            tk, ln = self.vocab.encode_batch(hints, Th)
            htk[i, : len(tk)] = tk
            hln[i, : len(ln)] = ln
        return htk, hln

    # ------------------------------------------------------------------
    def _prepare(self, hint_lists: Sequence[Sequence[str]],
                 pad_short_queries: bool):
        """Tokenize a query batch to static device-ready arrays."""
        hint_lists = list(hint_lists)
        texts = [" ".join(h) for h in hint_lists]
        tk, ln = self.vocab.encode_batch(texts, self.cfg.max_text_len)
        htk, hln = self._hint_tokens(hint_lists, pad_short=pad_short_queries)
        if self._dp_serve is not None:
            pad = (-len(hint_lists)) % self._dp
            if pad:  # sharded inputs must divide the mesh
                tk = np.concatenate([tk, np.repeat(tk[-1:], pad, 0)])
                ln = np.concatenate([ln, np.repeat(ln[-1:], pad, 0)])
                htk = np.concatenate([htk, np.repeat(htk[-1:], pad, 0)])
                hln = np.concatenate([hln, np.repeat(hln[-1:], pad, 0)])
        return (tk, ln, htk, hln), len(hint_lists)

    def _dispatch(self, tk, ln, htk, hln):
        """Enqueue one serving program; returns unfetched device arrays."""
        pipe = self.pipe
        if self._dp_serve is not None:
            return self._dp_serve(
                pipe.coarse_state, pipe.fine_state, self.cell_enc,
                self.fine_bank[0], self.fine_bank[1], jnp.asarray(tk),
                jnp.asarray(ln), jnp.asarray(htk), jnp.asarray(hln))
        k = min(self.top_k, self.bank.num_cells)
        return pipe.serve_batch(
            pipe.coarse_state, pipe.fine_state, jnp.asarray(tk),
            jnp.asarray(ln), jnp.asarray(htk), jnp.asarray(hln),
            self.cell_enc, k, self.fine_bank[0], self.fine_bank[1],
            min(self.rerank_k, self.bank.num_cells), self.rerank_lambda,
            self.rerank_gamma, self.prune_m, self.prune_layers,
            self.prune_sinkhorn, self.prune_soft,
            cheap_bank=self.cheap_bank[0], cheap_scale=self.cheap_bank[1])

    def localize(self, hint_lists: Sequence[Sequence[str]],
                 pad_short_queries: bool = False) -> Dict:
        """Localize a batch of queries, each a list of hint sentences.

        Queries must carry exactly ``cfg.num_mentioned`` hints (extra hints
        are truncated). Shorter queries raise unless ``pad_short_queries``
        is set, in which case each is padded by cyclically repeating its
        own hints — never by empty pseudo-hints, which would participate in
        matching and skew results.

        Returns dict with
            positions   [Q, 3]      world position from the best cell
            cell_ids    [Q]         best retrieved cell id
            top_cells   [Q, K]      retrieved cell indices
            positions_k [Q, K, 3]   per-retrieval world positions
            confidences [Q, K]      matched-object counts
        """
        args, Q = self._prepare(hint_lists, pad_short_queries)
        return self._finalize(jax.device_get(self._dispatch(*args)), Q)

    def localize_stream(self, batches, pad_short_queries: bool = False):
        """Pipelined serving over an iterable of query batches.

        Batch i+1 is tokenized and dispatched BEFORE batch i's results are
        fetched, so the device computes the next batch while the previous
        results ride the D2H transfer (jax async dispatch) — on
        remote-attached TPUs the fetch is a meaningful fraction of batch
        latency. Yields one ``localize``-shaped dict per input batch, in
        order. Keep batch sizes uniform: each distinct batch shape
        compiles its own serving program.
        """
        pending = None                       # (device arrays, real Q)
        for hint_lists in batches:
            args, Q = self._prepare(hint_lists, pad_short_queries)
            out = self._dispatch(*args)
            if pending is not None:
                yield self._finalize(jax.device_get(pending[0]), pending[1])
            pending = (out, Q)
        if pending is not None:
            yield self._finalize(jax.device_get(pending[0]), pending[1])

    def _finalize(self, fetched, num_queries: int) -> Dict:
        """Host-side decode of one fetched serving batch."""
        top_idx, _, pos_offsets, conf = [
            np.asarray(o)[:num_queries] for o in fetched]

        lo = self.bank.bbox_w[top_idx][..., 0:3]          # [Q, K, 3]
        size = self.bank.cell_size[top_idx][..., None]
        pos_w = lo.copy()
        pos_w[..., 0:2] += np.asarray(pos_offsets) * size
        pos_w[..., 2] += 0.5 * (self.bank.bbox_w[top_idx][..., 5]
                                - self.bank.bbox_w[top_idx][..., 2])
        return {
            "positions": pos_w[:, 0],
            "cell_ids": [self.bank.cell_ids[i] for i in top_idx[:, 0]],
            "top_cells": np.asarray(top_idx),
            "positions_k": pos_w,
            "confidences": np.asarray(conf),
        }


# ----------------------------------------------------------------------
# CLI: JSON-lines serving over stdin/stdout.
# ----------------------------------------------------------------------
def _iter_query_batches(stream, batch: int, on_error=None,
                        min_hints: int = 0):
    """Group stdin JSON lines into fixed-size hint-list batches.

    Each line is either ``{"hints": [...], "id": ...}`` or a bare JSON
    array of hint strings. Yields ``(hint_lists, ids, real)`` with the
    final partial batch padded by repeating its last query (one static
    batch shape → one compiled serving program).

    Malformed lines (invalid JSON, missing/ill-typed ``hints``, or fewer
    than ``min_hints`` hints) never take the stream down: with
    ``on_error(lineno, id_or_None, message)`` they are reported and
    skipped; without it a ``ValueError`` naming the line is raised."""
    import json

    def _bad(lineno, qid, msg):
        if on_error is None:
            raise ValueError(f"stdin line {lineno}: {msg}")
        on_error(lineno, qid, msg)

    buf, ids = [], []
    for lineno, line in enumerate(stream):
        line = line.strip()
        if not line:
            continue
        try:
            rec = json.loads(line)
        except ValueError as e:
            _bad(lineno, None, f"invalid JSON: {e}")
            continue
        if isinstance(rec, dict):
            qid = rec.get("id", lineno)
            hints = rec.get("hints")
        else:
            qid, hints = lineno, rec
        if (not isinstance(hints, list) or not hints
                or not all(isinstance(h, str) for h in hints)):
            _bad(lineno, qid,
                 "expected {\"hints\": [str, ...]} or a JSON array of "
                 "hint strings")
            continue
        if len(hints) < min_hints:
            _bad(lineno, qid,
                 f"query has {len(hints)} hints, the model needs "
                 f"{min_hints} (rerun with --pad_short to self-repeat "
                 f"short queries)")
            continue
        buf.append(hints)
        ids.append(qid)
        if len(buf) == batch:
            yield buf, ids, batch
            buf, ids = [], []
    if buf:
        real = len(buf)
        buf = buf + [buf[-1]] * (batch - real)
        yield buf, ids, real


def main(argv=None):
    """``python -m text2pos_tpu.serving``: text→position, JSON lines.

    Reads one query per stdin line, writes one JSON result line per
    query: {"id", "position", "cell_id", "confidence"}. Batches of
    ``--batch`` queries are served software-pipelined (localize_stream).
    """
    import argparse
    import json
    import sys

    # Persistent compilation cache (same as bench.py): the offline map
    # encode + BN calibration are the biggest XLA programs in the system
    # and the remote-attached TPU runtime compiles slowly per process.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("T2P_COMPILE_CACHE",
                                         "/tmp/t2p_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    ap = argparse.ArgumentParser(
        description="Text2Pos serving: JSON-lines text→position")
    ap.add_argument("--path_coarse", required=True)
    ap.add_argument("--path_fine", required=True)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--cells_pickle",
                     help="pickle of prepared Cell objects (the map)")
    src.add_argument("--base_path",
                     help="reference-format dataset dir (with --scenes)")
    src.add_argument("--synthetic_seed", type=int,
                     help="serve a synthetic demo map built from this seed")
    ap.add_argument("--scenes", default="",
                    help="comma-separated scene names for --base_path")
    ap.add_argument("--top_k", type=int, default=10)
    ap.add_argument("--rerank_k", type=int, default=0,
                    help="fine-confidence re-ranking: retrieve this many "
                         "coarse candidates, fine-match all, return the "
                         "top_k best by match confidence (0 = off)")
    ap.add_argument("--rerank_lambda", type=float, default=0.0,
                    help="blend weight of the coarse similarity in the "
                         "re-ranking score (conf + λ·sim); λ≈2–4 helps "
                         "at wide pools")
    ap.add_argument("--rerank_gamma", type=float, default=0.0,
                    help="penalty weight of the matched position votes' "
                         "spread in the re-ranking score (− γ·spread); "
                         "γ≈6 is the strongest signal at wide pools")
    ap.add_argument("--prune_m", type=int, default=0,
                    help="cascaded re-ranking: cheap-score all rerank_k "
                         "candidates with a truncated matcher, full "
                         "fine-match only the best prune_m (0 = off; "
                         "needs top_k < prune_m < rerank_k)")
    ap.add_argument("--prune_layers", type=int, default=1,
                    help="GNN self/cross pairs in the cascade's cheap pass")
    ap.add_argument("--prune_sinkhorn", type=int, default=10,
                    help="Sinkhorn iterations in the cascade's cheap pass")
    ap.add_argument("--prune_soft", action="store_true",
                    help="cheap pass scores from the soft transport mass "
                         "and vote spread (no hard match extraction)")
    ap.add_argument("--int8_cheap_bank", action="store_true",
                    help="int8-quantized fine bank for the cheap pass "
                         "(halves the widest gather's HBM traffic; "
                         "single-device serving only)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--pad_short", action="store_true",
                    help="self-repeat hints of short queries instead of "
                         "rejecting them")
    ap.add_argument("--no_calibrate", action="store_true")
    ap.add_argument("--data_parallel", type=int, default=1)
    ap.add_argument("--shard_db", action="store_true",
                    help="with --data_parallel N: shard the map over the "
                         "mesh too (ring retrieval + gather) — for maps "
                         "larger than one chip's HBM")
    # Protocol overrides (defaults = the reference evaluation protocol);
    # model dims (embed/layers/Sinkhorn) come from the checkpoints.
    proto = EvalConfig()
    for f in ("pad_size", "num_mentioned", "coarse_max_objects",
              "pointnet_numpoints", "max_hint_len", "max_text_len"):
        ap.add_argument(f"--{f}", type=int, default=getattr(proto, f))
    args = ap.parse_args(argv)

    if args.cells_pickle:
        import pickle

        with open(args.cells_pickle, "rb") as f:
            cells = pickle.load(f)
    elif args.base_path:
        from text2pos_tpu.data.legacy import load_scenes

        cells, _ = load_scenes(args.base_path,
                               [s for s in args.scenes.split(",") if s])
    else:
        from text2pos_tpu.data.synthetic import make_synthetic_dataset

        cells, _ = make_synthetic_dataset(seed=args.synthetic_seed)

    cfg = EvalConfig(
        top_k=(1, 5, args.top_k), threshs=(5, 10, 15),
        pad_size=args.pad_size, num_mentioned=args.num_mentioned,
        coarse_max_objects=args.coarse_max_objects,
        pointnet_numpoints=args.pointnet_numpoints,
        max_hint_len=args.max_hint_len, max_text_len=args.max_text_len)
    server = LocalizationServer(
        args.path_coarse, args.path_fine, cells, cfg=cfg, top_k=args.top_k,
        dtype=None if args.dtype == "float32" else args.dtype,
        calibrate=not args.no_calibrate, data_parallel=args.data_parallel,
        rerank_k=args.rerank_k, shard_db=args.shard_db,
        rerank_lambda=args.rerank_lambda, rerank_gamma=args.rerank_gamma,
        prune_m=args.prune_m, prune_layers=args.prune_layers,
        prune_sinkhorn=args.prune_sinkhorn, prune_soft=args.prune_soft,
        int8_cheap_bank=args.int8_cheap_bank)
    print(f"# serving {server.bank.num_cells} cells, top_k={args.top_k}, "
          f"batch={args.batch}", file=sys.stderr, flush=True)

    import time

    errors = 0

    def on_error(lineno, qid, msg):
        # One JSON line per rejected query (same stream as results, so a
        # consumer keyed on "id" sees every input answered), plus a
        # human-readable note on stderr. The stream keeps serving.
        nonlocal errors
        errors += 1
        print(json.dumps({"id": lineno if qid is None else qid,
                          "error": msg}), flush=True)
        print(f"# line {lineno}: {msg}", file=sys.stderr, flush=True)

    batches = _iter_query_batches(
        sys.stdin, args.batch, on_error=on_error,
        min_hints=0 if args.pad_short else args.num_mentioned)
    metas = []          # (ids, real) per in-flight batch, FIFO

    def gen():
        for hint_lists, ids, real in batches:
            metas.append((ids, real))
            yield hint_lists

    served, latencies_ms = 0, []
    t_start = t_batch = time.time()
    for out in server.localize_stream(gen(), pad_short_queries=args.pad_short):
        ids, real = metas.pop(0)
        for q in range(real):
            print(json.dumps({
                "id": ids[q],
                "position": [float(v) for v in out["positions"][q]],
                "cell_id": str(out["cell_ids"][q]),
                "confidence": int(out["confidences"][q][0]),
            }), flush=True)
        now = time.time()
        latencies_ms.append((now - t_batch) * 1e3)
        t_batch = now
        served += real

    # Self-measurement (stderr): per-batch latency percentiles over the
    # pipelined steady state — the first batch carries compilation and is
    # reported separately as warmup. The reference has no serving CLI at
    # all; one that claims production shape must measure itself.
    if latencies_ms:
        import numpy as _np

        steady = latencies_ms[1:] if len(latencies_ms) > 1 else latencies_ms
        p50, p90, p99 = _np.percentile(steady, (50, 90, 99))
        print("# stats " + json.dumps({
            "queries": served,
            "rejected": errors,
            "batches": len(latencies_ms),
            "warmup_ms": round(latencies_ms[0], 1),
            "p50_ms": round(float(p50), 1),
            "p90_ms": round(float(p90), 1),
            "p99_ms": round(float(p99), 1),
            "qps": round(served / max(time.time() - t_start, 1e-9), 1),
        }), file=sys.stderr, flush=True)
    elif errors:
        print(f"# stats: no servable queries ({errors} rejected)",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
