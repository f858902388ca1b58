"""Auxiliary subsystems: profiling, transformer ablation, image prep."""

import json
import os

import numpy as np
import pytest


class TestProfiling:
    def test_stage_timer(self):
        from text2pos_tpu.utils.profiling import StageTimer

        lines = []
        t = StageTimer(log=lines.append)
        with t.stage("a"):
            pass
        with t.stage("a"):
            pass
        with t.stage("b"):
            pass
        assert set(t.summary()) == {"a", "b"}
        assert len(lines) == 3

    def test_metrics_logger(self, tmp_path):
        from text2pos_tpu.utils.profiling import MetricsLogger

        path = str(tmp_path / "m.jsonl")
        log = MetricsLogger(path)
        log.log({"epoch": 1, "loss": 2.0})
        log.log({"epoch": 2, "loss": 1.0})
        records = [json.loads(l) for l in open(path)]
        assert len(records) == 2
        assert records[1]["loss"] == 1.0 and "ts" in records[0]

    def test_disabled_logger_noop(self):
        from text2pos_tpu.utils.profiling import MetricsLogger

        MetricsLogger(None).log({"x": 1})  # must not raise


class TestTransformerAblation:
    def test_train_step(self, synthetic_data):
        import jax
        import jax.numpy as jnp

        from text2pos_tpu.config import TrainConfig
        from text2pos_tpu.data.hints import (
            Vocabulary, build_vocabulary, create_hint_description)
        from text2pos_tpu.data.loaders import FineLoader
        from text2pos_tpu.train.transformer import TransformerTrainer

        cells, poses = synthetic_data
        cfg = TrainConfig(batch_size=4, embed_dim=16, num_layers=1,
                          sinkhorn_iters=5, pointnet_numpoints=32,
                          pad_size=8, num_mentioned=6, max_hint_len=12)
        vocab = Vocabulary(build_vocabulary(
            [create_hint_description(p) for p in poses]))
        loader = FineLoader(cells, poses, vocab, cfg.batch_size, cfg.pad_size,
                            cfg.num_mentioned, cfg.pointnet_numpoints,
                            cfg.max_hint_len)
        trainer = TransformerTrainer(cfg, vocab, with_aux_heads=True)
        rng = jax.random.PRNGKey(0)
        batch = next(loader.epoch(seed=0))
        state = trainer.init_state(batch, rng, 1)
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in ("num_real", "pose_idx")}
        state, metrics = trainer.train_step(state, jb, rng)
        assert np.isfinite(float(metrics["loss"]))
        assert 0.0 <= float(metrics["recall"]) <= 1.0


class TestPrepareImages:
    def test_splits(self, tmp_path):
        from text2pos_tpu.data.prepare_images import (
            create_poses_and_images, save_splits)

        scene = "2013_05_28_drive_0000_sync"
        posed = tmp_path / "data_poses" / scene
        posed.mkdir(parents=True)
        rows = []
        for i, x in enumerate(np.linspace(0, 200, 100)):
            mat = np.hstack([np.eye(3), np.array([[x], [0.0], [1.0]])])
            rows.append(np.concatenate([[i], mat.flatten()]))
        np.savetxt(str(posed / "poses.txt"), np.array(rows))

        splits = create_poses_and_images(str(tmp_path), scene,
                                         db_distance=10.0, query_offset=5.0)
        assert len(splits["db"]["frames"]) > 5
        assert len(splits["query"]["frames"]) > 0
        assert len(splits["db"]["images"]) == len(splits["db"]["frames"])
        assert splits["db"]["images"][0].endswith(".png")
        save_splits(splits, str(tmp_path / "out"), scene)
        assert os.path.isfile(tmp_path / "out" / f"{scene}_visloc.pkl")
