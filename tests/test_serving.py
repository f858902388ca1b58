"""LocalizationServer: checkpoints + map → world positions in one object.

Covers the production front-end end to end on CPU: random-init
checkpoints saved in the trainers' format, a small synthetic map, BN
calibration on fabricated hints, and a localize() call whose outputs are
geometrically valid (positions inside their retrieved cells).
"""

import jax
import numpy as np
import pytest

from text2pos_tpu.config import EvalConfig, TrainConfig
from text2pos_tpu.data.hints import (Vocabulary, build_vocabulary,
                                     create_hint_description)

TINY = dict(batch_size=4, embed_dim=16, num_layers=2, sinkhorn_iters=10,
            pointnet_numpoints=32, coarse_max_objects=16, pad_size=8,
            num_mentioned=6, max_text_len=48, max_hint_len=12)


@pytest.fixture(scope="module")
def server(synthetic_data, tmp_path_factory):
    from text2pos_tpu.data.loaders import CoarseLoader, FineLoader
    from text2pos_tpu.serving import LocalizationServer
    from text2pos_tpu.train.coarse import CoarseTrainer
    from text2pos_tpu.train.fine import FineTrainer
    from text2pos_tpu.train.state import save_checkpoint

    cells, poses = synthetic_data
    cfg = TrainConfig(**TINY)
    vocab = Vocabulary(build_vocabulary(
        [create_hint_description(p) for p in poses]))
    rng = jax.random.PRNGKey(0)

    loader = CoarseLoader(cells, poses, vocab, cfg.batch_size,
                          cfg.coarse_max_objects, cfg.pointnet_numpoints,
                          cfg.max_text_len)
    coarse_tr = CoarseTrainer(cfg, vocab)
    cstate = coarse_tr.init_state(next(loader.epoch(seed=0)), rng, 1)
    floader = FineLoader(cells, poses, vocab, cfg.batch_size, cfg.pad_size,
                         cfg.num_mentioned, cfg.pointnet_numpoints,
                         cfg.max_hint_len)
    fine_tr = FineTrainer(cfg, vocab)
    fstate = fine_tr.init_state(next(floader.epoch(seed=0)), rng, 1)

    d = tmp_path_factory.mktemp("srv")
    pc, pf = str(d / "coarse.msgpack"), str(d / "fine.msgpack")
    save_checkpoint(pc, cstate, extra={
        "known_words": vocab.known_words, "embed_dim": cfg.embed_dim,
        "variation": 0, "use_features": list(cfg.use_features)})
    save_checkpoint(pf, fstate, extra={
        "known_words": vocab.known_words, "embed_dim": cfg.embed_dim,
        "num_layers": cfg.num_layers, "sinkhorn_iters": cfg.sinkhorn_iters,
        "use_features": list(cfg.use_features)})

    ecfg = EvalConfig(top_k=(1, 3), threshs=(5, 10, 15),
                      pad_size=cfg.pad_size, num_mentioned=cfg.num_mentioned,
                      max_hint_len=cfg.max_hint_len,
                      max_text_len=cfg.max_text_len,
                      coarse_max_objects=cfg.coarse_max_objects,
                      pointnet_numpoints=cfg.pointnet_numpoints)
    srv = LocalizationServer(pc, pf, cells, cfg=ecfg, top_k=3, dtype=None)
    return srv, cells, poses, (pc, pf, ecfg)


class TestLocalizationServer:
    def test_localize_shapes_and_geometry(self, server):
        srv, cells, poses, _ = server
        queries = [create_hint_description(p) for p in poses[:5]]
        out = srv.localize(queries)

        Q, K = 5, min(3, srv.bank.num_cells)
        assert out["positions"].shape == (Q, 3)
        assert out["top_cells"].shape == (Q, K)
        assert out["positions_k"].shape == (Q, K, 3)
        assert out["confidences"].shape == (Q, K)
        assert len(out["cell_ids"]) == Q
        assert np.all(np.isfinite(out["positions"]))

        # Every per-retrieval position lies in its cell's bbox, up to the
        # offset head's reach (offsets are unclipped, like the reference's
        # regressor — random-init weights can push slightly past the
        # boundary, so allow one cell_size of margin).
        lo = srv.bank.bbox_w[out["top_cells"]][..., 0:2]
        hi = srv.bank.bbox_w[out["top_cells"]][..., 3:5]
        size = srv.bank.cell_size[out["top_cells"]][..., None]
        p = out["positions_k"][..., 0:2]
        assert np.all(p >= lo - size) and np.all(p <= hi + size)

    def test_short_queries_rejected_by_default(self, server):
        """Fewer hints than num_mentioned must raise, not be silently
        padded with empty pseudo-hints that skew matching."""
        srv, cells, poses, _ = server
        q = create_hint_description(poses[0])[:2]
        with pytest.raises(ValueError, match="fewer than num_mentioned"):
            srv.localize([q])

    def test_short_queries_pad_by_repetition(self, server):
        """pad_short_queries=True pads with the query's OWN hints: the
        result equals localizing the manually-repeated hint list."""
        srv, cells, poses, _ = server
        H = srv.cfg.num_mentioned
        q = create_hint_description(poses[0])[:2]
        manual = (q * (H // len(q) + 1))[:H]
        padded = srv.localize([q], pad_short_queries=True)
        explicit = srv.localize([manual])
        np.testing.assert_array_equal(padded["top_cells"],
                                      explicit["top_cells"])
        np.testing.assert_allclose(padded["positions"],
                                   explicit["positions"], atol=1e-6)

    def test_batch_independence_with_calibration(self, server):
        """Calibrated serving: the same query localizes identically alone
        and inside a larger batch."""
        srv, cells, poses, _ = server
        queries = [create_hint_description(p) for p in poses[:6]]
        full = srv.localize(queries)
        solo = srv.localize(queries[:1])
        np.testing.assert_allclose(solo["positions"][0],
                                   full["positions"][0], atol=1e-5)
        np.testing.assert_array_equal(solo["top_cells"][0],
                                      full["top_cells"][0])


class TestDataParallelServer:
    def test_dp_server_matches_single_device(self, server):
        """data_parallel=4 serving returns the single-device results,
        including the pad-to-divisible path (5 queries over 4 shards)."""
        from text2pos_tpu.serving import LocalizationServer

        srv, cells, poses, (pc, pf, ecfg) = server
        dsrv = LocalizationServer(pc, pf, cells, cfg=ecfg, top_k=3,
                                  dtype=None, data_parallel=4)
        queries = [create_hint_description(p) for p in poses[:5]]
        single = srv.localize(queries)
        sharded = dsrv.localize(queries)
        np.testing.assert_array_equal(sharded["top_cells"],
                                      single["top_cells"])
        np.testing.assert_allclose(sharded["positions"],
                                   single["positions"], atol=1e-5)

    def test_dbsharded_server_matches_single_device(self, server):
        """--shard_db serving (queries AND the map ring-sharded over the
        mesh, including zero-padding the map to a mesh multiple) returns
        the single-device results exactly."""
        from text2pos_tpu.serving import LocalizationServer

        srv, cells, poses, (pc, pf, ecfg) = server
        dsrv = LocalizationServer(pc, pf, cells, cfg=ecfg, top_k=3,
                                  dtype=None, data_parallel=4,
                                  shard_db=True)
        # The map must have been padded to a multiple of the mesh size.
        assert dsrv.cell_enc.shape[0] % 4 == 0
        queries = [create_hint_description(p) for p in poses[:4]]
        single = srv.localize(queries)
        sharded = dsrv.localize(queries)
        np.testing.assert_array_equal(sharded["top_cells"],
                                      single["top_cells"])
        np.testing.assert_allclose(sharded["positions"],
                                   single["positions"], atol=1e-5)
        assert sharded["top_cells"].max() < srv.bank.num_cells


class TestLocalizeStream:
    def test_stream_matches_per_batch_localize(self, server):
        """Pipelined streaming must produce exactly the per-batch results,
        in order (dispatch overlap must not change any output)."""
        srv, cells, poses, _ = server
        batches = [
            [create_hint_description(p) for p in poses[i : i + 3]]
            for i in (0, 3, 6)
        ]
        streamed = list(srv.localize_stream(batches))
        assert len(streamed) == len(batches)
        for got, batch in zip(streamed, batches):
            want = srv.localize(batch)
            np.testing.assert_array_equal(got["top_cells"],
                                          want["top_cells"])
            np.testing.assert_allclose(got["positions"], want["positions"])
            np.testing.assert_array_equal(got["confidences"],
                                          want["confidences"])
            assert got["cell_ids"] == want["cell_ids"]

    def test_stream_empty_iterable(self, server):
        srv, *_ = server
        assert list(srv.localize_stream([])) == []


class TestServingCLI:
    def test_jsonl_cli_end_to_end(self, server, tmp_path, monkeypatch,
                                  capsys):
        """`python -m text2pos_tpu.serving` over JSON lines: one result
        per query, ids preserved in order, partial final batch handled."""
        import io
        import json
        import pickle
        import sys

        from text2pos_tpu import serving

        srv, cells, poses, (pc, pf, ecfg) = server
        cells_path = str(tmp_path / "map.pkl")
        with open(cells_path, "wb") as f:
            pickle.dump(cells, f)

        queries = [create_hint_description(p) for p in poses[:5]]
        lines = [json.dumps({"hints": q, "id": f"q{i}"})
                 for i, q in enumerate(queries)]
        monkeypatch.setattr(sys, "stdin", io.StringIO("\n".join(lines)))

        serving.main([
            "--path_coarse", pc, "--path_fine", pf,
            "--cells_pickle", cells_path, "--no_calibrate",
            "--dtype", "float32", "--batch", "4", "--top_k", "3",
            "--pad_size", str(ecfg.pad_size),
            "--num_mentioned", str(ecfg.num_mentioned),
            "--coarse_max_objects", str(ecfg.coarse_max_objects),
            "--pointnet_numpoints", str(ecfg.pointnet_numpoints),
            "--max_hint_len", str(ecfg.max_hint_len),
            "--max_text_len", str(ecfg.max_text_len),
        ])

        out = [json.loads(l) for l in
               capsys.readouterr().out.strip().splitlines()]
        assert [r["id"] for r in out] == [f"q{i}" for i in range(5)]
        for r in out:
            assert len(r["position"]) == 3
            assert all(np.isfinite(v) for v in r["position"])
            assert isinstance(r["cell_id"], str)
            assert r["confidence"] >= 0

    def test_malformed_lines_reported_not_fatal(self, server, tmp_path,
                                                monkeypatch, capsys):
        """Invalid JSON / missing hints / short queries must not take the
        stream down: each bad line gets one {"id", "error"} result line,
        good queries are still served, and the stderr stats line reports
        the rejected count + latency percentiles."""
        import io
        import json
        import pickle
        import sys

        from text2pos_tpu import serving

        srv, cells, poses, (pc, pf, ecfg) = server
        cells_path = str(tmp_path / "map.pkl")
        with open(cells_path, "wb") as f:
            pickle.dump(cells, f)

        good = create_hint_description(poses[0])
        lines = [
            json.dumps({"hints": good, "id": "ok0"}),
            "{not json",                                   # parse error
            json.dumps({"id": "nohints"}),                 # missing hints
            json.dumps({"hints": "a string", "id": "badtype"}),
            json.dumps({"hints": good[:2], "id": "short"}),  # < num_mentioned
            json.dumps({"hints": good, "id": "ok1"}),
        ]
        monkeypatch.setattr(sys, "stdin", io.StringIO("\n".join(lines)))

        serving.main([
            "--path_coarse", pc, "--path_fine", pf,
            "--cells_pickle", cells_path, "--no_calibrate",
            "--dtype", "float32", "--batch", "2", "--top_k", "3",
            "--pad_size", str(ecfg.pad_size),
            "--num_mentioned", str(ecfg.num_mentioned),
            "--coarse_max_objects", str(ecfg.coarse_max_objects),
            "--pointnet_numpoints", str(ecfg.pointnet_numpoints),
            "--max_hint_len", str(ecfg.max_hint_len),
            "--max_text_len", str(ecfg.max_text_len),
        ])

        captured = capsys.readouterr()
        out = [json.loads(l) for l in captured.out.strip().splitlines()]
        by_id = {r["id"]: r for r in out}
        # Bad lines answered with errors (line 1 has no id → line number).
        assert "invalid JSON" in by_id[1]["error"]
        assert "hints" in by_id["nohints"]["error"]
        assert "hints" in by_id["badtype"]["error"]
        assert "--pad_short" in by_id["short"]["error"]
        # Good queries still served, in order.
        served = [r for r in out if "position" in r]
        assert [r["id"] for r in served] == ["ok0", "ok1"]
        # Self-measurement on stderr.
        stats_line = next(l for l in captured.err.splitlines()
                          if l.startswith("# stats "))
        stats = json.loads(stats_line[len("# stats "):])
        assert stats["queries"] == 2 and stats["rejected"] == 4
        assert stats["p50_ms"] > 0 and stats["p99_ms"] >= stats["p50_ms"]
        assert stats["warmup_ms"] > 0 and stats["qps"] > 0

    def test_iter_query_batches_on_error_callback(self):
        """Unit: the batcher routes every malformed line through on_error
        (and raises a located ValueError without a callback)."""
        import io
        import json

        import pytest as _pytest

        from text2pos_tpu.serving import _iter_query_batches

        lines = ["not json", json.dumps({"hints": []}),
                 json.dumps(["a", "b"]), json.dumps({"hints": ["a", 3]})]
        errs = []
        got = list(_iter_query_batches(
            io.StringIO("\n".join(lines)), 2,
            on_error=lambda ln, qid, msg: errs.append((ln, qid)),
            min_hints=3))
        assert got == []            # nothing servable
        assert [e[0] for e in errs] == [0, 1, 2, 3]
        with _pytest.raises(ValueError, match="line 0"):
            list(_iter_query_batches(io.StringIO("not json"), 2))

    def test_iter_query_batches_padding(self):
        """Final partial batch is padded to the static size and reports
        the real count; bare-array lines get line-number ids."""
        import io
        import json

        from text2pos_tpu.serving import _iter_query_batches

        lines = [json.dumps([f"hint {i}"]) for i in range(5)]
        got = list(_iter_query_batches(io.StringIO("\n".join(lines)), 3))
        assert len(got) == 2
        full, part = got
        assert full[2] == 3 and part[2] == 2
        assert len(part[0]) == 3 and part[0][2] == part[0][1]  # padded
        assert full[1] == [0, 1, 2] and part[1] == [3, 4]


class TestRerank:
    """Fine-confidence re-ranking (serve_batch rerank_k / EvalConfig.rerank):
    retrieve a wider coarse candidate pool, fine-match all of it, return the
    top_k best by summed matched transport score."""

    def test_serve_batch_rerank_matches_manual_reorder(self, server):
        """serve_batch(top_k, rerank_k) ≡ retrieve rerank_k → fine-match →
        stable-sort by conf score → slice top_k, computed by hand from the
        unreranked building blocks."""
        import jax.numpy as jnp

        from text2pos_tpu.ops.retrieval import topk_retrieval

        srv, cells, poses, _ = server
        pipe = srv.pipe
        queries = [create_hint_description(p)[:srv.cfg.num_mentioned]
                   for p in poses[:4]]
        (tk, ln, htk, hln), _n = srv._prepare(queries, False)
        top_k = 2
        k_all = min(6, srv.bank.num_cells)
        assert k_all > top_k

        # Manual: wide retrieval, fine match, stable reorder, slice.
        model = pipe.coarse.model
        text_enc = model.apply(
            {"params": pipe.coarse_state.params,
             "batch_stats": pipe.coarse_state.batch_stats},
            jnp.asarray(tk), jnp.asarray(ln), method=type(model).encode_text)
        _, wide = topk_retrieval(text_enc, srv.cell_enc, k_all)
        _, pm, po, cf, cs, _sp = pipe._match_chunk_cached(
            pipe.fine_state, srv.fine_bank[0], srv.fine_bank[1],
            wide, jnp.asarray(htk), jnp.asarray(hln))
        cs = np.asarray(cs)
        assert cs.dtype == np.float32 and cs.shape == wide.shape
        order = np.argsort(-cs, axis=1, kind="stable")[:, :top_k]
        rows = np.arange(len(queries))[:, None]
        want_idx = np.asarray(wide)[rows, order]
        want_pm = np.asarray(pm)[rows, order]
        want_cf = np.asarray(cf)[rows, order]

        got = pipe.serve_batch(
            pipe.coarse_state, pipe.fine_state, jnp.asarray(tk),
            jnp.asarray(ln), jnp.asarray(htk), jnp.asarray(hln),
            srv.cell_enc, top_k, srv.fine_bank[0], srv.fine_bank[1], k_all)
        np.testing.assert_array_equal(np.asarray(got[0], np.int64), want_idx)
        np.testing.assert_allclose(np.asarray(got[1], np.float32), want_pm,
                                   atol=1e-3)  # serve wire type is f16
        np.testing.assert_array_equal(np.asarray(got[3], np.int32), want_cf)

    def test_serve_batch_rerank_lambda_blends_coarse_similarity(self, server):
        """serve_batch(rerank_k, rerank_lambda=λ) reorders by
        conf + λ·sim — verified against a manual recompute from the
        unreranked building blocks; λ large enough must reproduce the
        plain coarse order."""
        import jax.numpy as jnp

        from text2pos_tpu.ops.retrieval import topk_retrieval

        srv, cells, poses, _ = server
        pipe = srv.pipe
        queries = [create_hint_description(p)[:srv.cfg.num_mentioned]
                   for p in poses[:4]]
        (tk, ln, htk, hln), _n = srv._prepare(queries, False)
        top_k = 2
        k_all = min(6, srv.bank.num_cells)
        lam = 0.7

        model = pipe.coarse.model
        text_enc = model.apply(
            {"params": pipe.coarse_state.params,
             "batch_stats": pipe.coarse_state.batch_stats},
            jnp.asarray(tk), jnp.asarray(ln), method=type(model).encode_text)
        sims, wide = topk_retrieval(text_enc, srv.cell_enc, k_all)
        _, _pm, _po, _cf, cs, _sp = pipe._match_chunk_cached(
            pipe.fine_state, srv.fine_bank[0], srv.fine_bank[1],
            wide, jnp.asarray(htk), jnp.asarray(hln))
        score = np.asarray(cs, np.float32) + lam * np.asarray(sims,
                                                              np.float32)
        order = np.argsort(-score, axis=1, kind="stable")[:, :top_k]
        rows = np.arange(len(queries))[:, None]
        want_idx = np.asarray(wide)[rows, order]

        got = pipe.serve_batch(
            pipe.coarse_state, pipe.fine_state, jnp.asarray(tk),
            jnp.asarray(ln), jnp.asarray(htk), jnp.asarray(hln),
            srv.cell_enc, top_k, srv.fine_bank[0], srv.fine_bank[1],
            k_all, lam)
        np.testing.assert_array_equal(np.asarray(got[0], np.int64), want_idx)

        # A dominating λ reduces re-ranking to the coarse order.
        got_big = pipe.serve_batch(
            pipe.coarse_state, pipe.fine_state, jnp.asarray(tk),
            jnp.asarray(ln), jnp.asarray(htk), jnp.asarray(hln),
            srv.cell_enc, top_k, srv.fine_bank[0], srv.fine_bank[1],
            k_all, 1e6)
        np.testing.assert_array_equal(np.asarray(got_big[0], np.int64),
                                      np.asarray(wide)[:, :top_k])

    def test_match_vote_spread_matches_numpy(self):
        """_match_vote_spread ≡ numpy recompute: rms distance of matched
        hints' (center + offset) votes to their mean; 0 when nothing
        matches."""
        import jax.numpy as jnp

        from text2pos_tpu.evaluation.pipeline import _match_vote_spread

        rng = np.random.default_rng(0)
        B, K, H, pad = 2, 3, 4, 5
        matches1 = rng.integers(-1, pad, size=(B, K, H))
        matches1[0, 0] = -1                       # no matches → spread 0
        offsets = rng.normal(size=(B, K, H, 2)).astype(np.float32)
        centers = rng.random((B, K, pad, 2)).astype(np.float32)

        got = np.asarray(_match_vote_spread(
            jnp.asarray(matches1), jnp.asarray(offsets),
            jnp.asarray(centers)))

        want = np.zeros((B, K), np.float32)
        for b in range(B):
            for k in range(K):
                votes = [centers[b, k, matches1[b, k, h]] + offsets[b, k, h]
                         for h in range(H) if matches1[b, k, h] >= 0]
                if votes:
                    v = np.stack(votes)
                    want[b, k] = np.sqrt(
                        ((v - v.mean(0)) ** 2).sum(1).mean())
        np.testing.assert_allclose(got, want, atol=1e-5)
        assert got[0, 0] == 0.0

    def test_serve_batch_rerank_gamma_penalizes_spread(self, server):
        """serve_batch(rerank_k, rerank_lambda, rerank_gamma) reorders by
        conf + λ·sim − γ·spread — verified against a manual recompute from
        the unreranked building blocks."""
        import jax.numpy as jnp

        from text2pos_tpu.ops.retrieval import topk_retrieval

        srv, cells, poses, _ = server
        pipe = srv.pipe
        queries = [create_hint_description(p)[:srv.cfg.num_mentioned]
                   for p in poses[:4]]
        (tk, ln, htk, hln), _n = srv._prepare(queries, False)
        top_k = 2
        k_all = min(6, srv.bank.num_cells)
        lam, gam = 0.7, 5.0

        model = pipe.coarse.model
        text_enc = model.apply(
            {"params": pipe.coarse_state.params,
             "batch_stats": pipe.coarse_state.batch_stats},
            jnp.asarray(tk), jnp.asarray(ln), method=type(model).encode_text)
        sims, wide = topk_retrieval(text_enc, srv.cell_enc, k_all)
        _, _pm, _po, _cf, cs, sp = pipe._match_chunk_cached(
            pipe.fine_state, srv.fine_bank[0], srv.fine_bank[1],
            wide, jnp.asarray(htk), jnp.asarray(hln))
        sp = np.asarray(sp)
        assert sp.dtype == np.float32 and sp.shape == wide.shape
        assert (sp >= 0).all() and np.isfinite(sp).all()
        score = (np.asarray(cs, np.float32)
                 + lam * np.asarray(sims, np.float32) - gam * sp)
        order = np.argsort(-score, axis=1, kind="stable")[:, :top_k]
        rows = np.arange(len(queries))[:, None]
        want_idx = np.asarray(wide)[rows, order]

        got = pipe.serve_batch(
            pipe.coarse_state, pipe.fine_state, jnp.asarray(tk),
            jnp.asarray(ln), jnp.asarray(htk), jnp.asarray(hln),
            srv.cell_enc, top_k, srv.fine_bank[0], srv.fine_bank[1],
            k_all, lam, gam)
        np.testing.assert_array_equal(np.asarray(got[0], np.int64), want_idx)

    def test_server_rerank_candidates_from_wider_pool(self, server,
                                                      monkeypatch):
        """A rerank server returns top_k cells drawn from the coarse
        top-rerank_k pool (set inclusion), with unchanged output shapes."""
        import jax.numpy as jnp

        from text2pos_tpu.ops.retrieval import topk_retrieval

        srv, cells, poses, _ = server
        k_all = min(6, srv.bank.num_cells)
        queries = [create_hint_description(p)[:srv.cfg.num_mentioned]
                   for p in poses[:3]]
        monkeypatch.setattr(srv, "rerank_k", k_all)
        out = srv.localize(queries)
        assert out["top_cells"].shape == (3, srv.top_k)

        (tk, ln, _h, _l), _n = srv._prepare(queries, False)
        model = srv.pipe.coarse.model
        enc = model.apply(
            {"params": srv.pipe.coarse_state.params,
             "batch_stats": srv.pipe.coarse_state.batch_stats},
            jnp.asarray(tk), jnp.asarray(ln), method=type(model).encode_text)
        _, wide = topk_retrieval(enc, srv.cell_enc, k_all)
        wide = np.asarray(wide)
        for q in range(3):
            assert set(out["top_cells"][q]) <= set(wide[q])

    def test_rerank_order_formula(self):
        """_rerank_order sorts by conf − γ·spread, stable in coarse order."""
        from text2pos_tpu.evaluation.pipeline import _rerank_order

        conf = np.array([[3.0, 3.0, 1.0]], np.float32)
        spread = np.array([[2.0, 0.5, 0.0]], np.float32)
        # gamma=0: ties keep coarse order → [0, 1, 2]
        np.testing.assert_array_equal(_rerank_order(conf, spread, 0.0),
                                      [[0, 1, 2]])
        # gamma=1: scores 1.0, 2.5, 1.0 → [1, 0, 2] (stable tie 0 before 2)
        np.testing.assert_array_equal(_rerank_order(conf, spread, 1.0),
                                      [[1, 0, 2]])
        # gamma huge: spread dominates → ascending spread [2, 1, 0]
        np.testing.assert_array_equal(_rerank_order(conf, spread, 100.0),
                                      [[2, 1, 0]])

    @pytest.mark.parametrize("gamma", [0.0, 6.0])
    def test_run_fine_rerank_full_k_accuracy_invariant(self, server, gamma):
        """Re-ranking permutes each query's candidate list; accuracy over
        ALL K candidates (min over the row) is permutation-invariant, so
        top-K accuracy must match the unreranked pipeline exactly while
        per-query candidate SETS stay identical — with and without the
        vote-spread penalty (cfg.rerank_gamma)."""
        import dataclasses

        from text2pos_tpu.data.loaders import CoarseLoader

        srv, cells, poses, (pc, pf, ecfg) = server
        pipe = srv.pipe
        k_all = min(4, srv.bank.num_cells)

        loader = CoarseLoader(cells, poses, srv.vocab, ecfg.batch_size,
                              ecfg.coarse_max_objects,
                              ecfg.pointnet_numpoints, ecfg.max_text_len)
        base_cfg = dataclasses.replace(ecfg, top_k=(1, k_all))
        rr_cfg = dataclasses.replace(ecfg, top_k=(1, k_all), rerank=k_all,
                                     rerank_gamma=gamma)

        import copy
        plain = copy.copy(pipe)
        plain.cfg = base_cfg
        rerank = copy.copy(pipe)
        rerank.cfg = rr_cfg

        top_idx, _ = plain.run_coarse(loader, poses)
        top_idx_rr, _ = rerank.run_coarse(loader, poses)
        np.testing.assert_array_equal(top_idx, top_idx_rr)

        accs_p, _, _ = plain.run_fine(loader, poses, top_idx, srv.vocab,
                                      fine_bank=srv.fine_bank)
        accs_r, _, _ = rerank.run_fine(loader, poses, top_idx, srv.vocab,
                                       fine_bank=srv.fine_bank)
        assert accs_p[k_all] == accs_r[k_all]  # full-K is order-invariant


class TestAOTServeExecutable:
    def test_lowered_executable_matches_jit_and_reports_cost(self, server):
        """bench.py serves through an AOT-compiled serve_batch executable
        (jax.stages lower→compile) so XLA's post-fusion cost analysis can
        be read off the very executable being timed. The AOT path must
        produce the jit path's outputs, and the cost analysis — where the
        backend exposes one — must carry positive FLOPs/bytes."""
        import jax.numpy as jnp

        from bench import _compiled_cost, _roofline

        srv, cells, poses, _ = server
        pipe = srv.pipe
        queries = [create_hint_description(p)[:srv.cfg.num_mentioned]
                   for p in poses[:4]]
        (tk, ln, htk, hln), _n = srv._prepare(queries, False)
        k = min(srv.top_k, srv.bank.num_cells)
        dyn = (jnp.asarray(tk), jnp.asarray(ln), jnp.asarray(htk),
               jnp.asarray(hln))

        ref = pipe.serve_batch(pipe.coarse_state, pipe.fine_state, *dyn,
                               srv.cell_enc, k,
                               srv.fine_bank[0], srv.fine_bank[1])
        exec_ = type(pipe).serve_batch.lower(
            pipe, pipe.coarse_state, pipe.fine_state, *dyn, srv.cell_enc, k,
            srv.fine_bank[0], srv.fine_bank[1]).compile()
        aot = exec_(pipe.coarse_state, pipe.fine_state, *dyn, srv.cell_enc,
                    srv.fine_bank[0], srv.fine_bank[1])
        for r, a in zip(ref, aot):
            np.testing.assert_allclose(np.asarray(r), np.asarray(a),
                                       atol=1e-6, rtol=1e-6)

        flops, byts = _compiled_cost(exec_)
        assert flops is None or flops > 0
        assert byts is None or byts > 0
        pct, bound = _roofline(flops, byts, measured_ms=10.0)
        if flops and byts:
            assert pct > 0 and bound in ("compute", "bandwidth")
        else:
            assert pct is None and bound is None
