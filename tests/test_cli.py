"""CLI-surface tests: flag parsing and the module entry points."""

import sys

import numpy as np
import pytest

from text2pos_tpu.config import (
    EvalConfig,
    PrepareConfig,
    TrainConfig,
    parse_config,
)


class TestParseConfig:
    def test_train_flags_roundtrip(self):
        cfg = parse_config(TrainConfig, [
            "--batch_size", "16", "--embed_dim", "128",
            "--use_features", "class", "position",
            "--ranking_loss", "hardest", "--pointnet_freeze",
            "--top_k", "1", "5", "--lr_gamma", "0.9",
            "--regressor_cell", "best", "--regressor_learn", "closest",
        ])
        assert cfg.batch_size == 16
        assert cfg.embed_dim == 128
        assert cfg.use_features == ("class", "position")
        assert cfg.ranking_loss == "hardest"
        assert cfg.pointnet_freeze is True
        assert cfg.top_k == (1, 5)
        assert cfg.lr_gamma == 0.9
        assert cfg.regressor_cell == "best"

    def test_eval_flags(self):
        cfg = parse_config(EvalConfig, [
            "--top_k", "1", "5", "10", "--threshs", "5", "10", "15",
            "--coarse_only", "--fine_oracle",
        ])
        assert cfg.top_k == (1, 5, 10)
        assert cfg.threshs == (5, 10, 15)
        assert cfg.coarse_only and cfg.fine_oracle

    def test_prepare_dirname_encodes_config(self):
        cfg = parse_config(PrepareConfig, [
            "--cell_size", "30", "--cell_dist", "10", "--grid_cells",
            "--pose_dist", "10", "--pose_count", "4", "--shift_poses",
        ])
        name = cfg.dirname
        assert "k360_30-10" in name and "scG" in name and "pc4" in name

    def test_defaults_match_reference(self):
        """Reference defaults (training/args.py:19-78)."""
        cfg = TrainConfig()
        assert cfg.embed_dim == 300
        assert cfg.num_layers == 6
        assert cfg.sinkhorn_iters == 50
        assert cfg.num_mentioned == 6
        assert cfg.pad_size == 16
        assert cfg.margin == 0.35
        assert cfg.top_k == (1, 3, 5)
        assert cfg.epochs == 16
        assert cfg.pointnet_numpoints == 256
        e = EvalConfig()
        assert e.top_k == (1, 5, 10) and e.threshs == (5, 10, 15)


@pytest.mark.slow
class TestMainEntryPoints:
    def test_train_then_evaluate_pipelines(self, tmp_path, monkeypatch):
        """Tiny end-to-end CLI loop: train both stages → pipeline.main()
        and fine evaluator main()."""
        from text2pos_tpu.config import TrainConfig
        from text2pos_tpu.utils.cli import load_split
        from text2pos_tpu.train import coarse as coarse_mod, fine as fine_mod

        cfg = TrainConfig(dataset="SYNTHETIC", batch_size=8, embed_dim=32,
                          num_layers=1, sinkhorn_iters=5,
                          pointnet_numpoints=32, coarse_max_objects=16,
                          pad_size=8, num_mentioned=6, epochs=2,
                          max_hint_len=12)
        ct, pt = load_split(cfg, "train")
        cv, pv = load_split(cfg, "val")
        _, cres = coarse_mod.train(cfg, ct, pt, cv, pv,
                                   checkpoint_dir=str(tmp_path),
                                   log=lambda *a: None)
        _, fres = fine_mod.train(cfg, ct, pt, cv, pv,
                                 checkpoint_dir=str(tmp_path),
                                 log=lambda *a: None)
        assert cres["best_path"] and fres["best_path"]

        argv = ["pipeline", "--dataset", "SYNTHETIC",
                "--path_coarse", cres["best_path"],
                "--path_fine", fres["best_path"],
                "--batch_size", "8", "--pad_size", "8",
                "--coarse_max_objects", "16", "--top_k", "1", "3",
                "--max_hint_len", "12", "--pointnet_numpoints", "32"]
        monkeypatch.setattr(sys, "argv", argv)
        from text2pos_tpu.evaluation import pipeline as pipe_mod

        pipe_mod.main()  # must run through both stages without error

        argv_fine = ["fine", "--dataset", "SYNTHETIC",
                     "--path_fine", fres["best_path"],
                     "--batch_size", "8", "--pad_size", "8",
                     "--max_hint_len", "12", "--pointnet_numpoints", "32"]
        monkeypatch.setattr(sys, "argv", argv_fine)
        from text2pos_tpu.evaluation import fine as fine_eval

        fine_eval.main()
