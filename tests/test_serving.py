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
