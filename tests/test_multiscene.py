"""Multi-scene dataset handling: concatenated banks, cross-scene guards."""

import dataclasses

import jax
import numpy as np
import pytest

from text2pos_tpu.config import EvalConfig, TrainConfig
from text2pos_tpu.data.hints import Vocabulary, build_vocabulary, create_hint_description
from text2pos_tpu.data.loaders import CoarseLoader
from text2pos_tpu.data.synthetic import make_synthetic_dataset
from text2pos_tpu.evaluation.pipeline import LocalizationPipeline
from text2pos_tpu.train.coarse import CoarseTrainer
from text2pos_tpu.train.fine import FineTrainer
from text2pos_tpu.data.loaders import FineLoader

TINY = dict(batch_size=4, embed_dim=16, num_layers=1, sinkhorn_iters=5,
            pointnet_numpoints=32, coarse_max_objects=16, pad_size=8,
            num_mentioned=6, max_hint_len=12, epochs=1)


@pytest.fixture(scope="module")
def two_scene_data():
    """Two synthetic scenes concatenated, like Kitti360CoarseDatasetMulti
    (reference cells.py:113-152)."""
    c1, p1 = make_synthetic_dataset(seed=0, scene_name="1111", extent=60.0)
    c2, p2 = make_synthetic_dataset(seed=1, scene_name="2222", extent=60.0)
    cells = c1 + c2
    poses = p1 + p2
    ids = [c.id for c in cells]
    assert len(np.unique(ids)) == len(ids)
    return cells, poses


class TestMultiScene:
    def test_coarse_oracle_and_guard(self, two_scene_data):
        cells, poses = two_scene_data
        cfg = TrainConfig(**TINY)
        vocab = Vocabulary(build_vocabulary(
            [create_hint_description(p) for p in poses]))
        loader = CoarseLoader(cells, poses, vocab, cfg.batch_size,
                              cfg.coarse_max_objects, cfg.pointnet_numpoints,
                              cfg.max_text_len)
        ecfg = EvalConfig(top_k=(1,), threshs=(5, 15), pad_size=cfg.pad_size,
                          num_mentioned=6, max_hint_len=cfg.max_hint_len,
                          pointnet_numpoints=cfg.pointnet_numpoints,
                          coarse_oracle=True)
        coarse = CoarseTrainer(cfg, vocab)
        fine = FineTrainer(cfg, vocab)
        rng = jax.random.PRNGKey(0)
        cstate = coarse.init_state(next(loader.epoch(seed=0)), rng, 1)
        floader = FineLoader(cells, poses, vocab, cfg.batch_size, cfg.pad_size,
                             cfg.num_mentioned, cfg.pointnet_numpoints,
                             cfg.max_hint_len)
        fstate = fine.init_state(next(floader.epoch(seed=0)), rng, 1)
        pipe = LocalizationPipeline(coarse, cstate, fine, fstate, ecfg)

        # Oracle retrieval of the own best cell: high accuracy, and the
        # cross-scene guard is a no-op (all retrievals in-scene).
        top_idx, accs = pipe.run_coarse(loader, poses)
        assert accs[1][15] >= 0.9

        # Force every retrieval into the OTHER scene: geometric distances
        # may be small (scenes overlap in world coords) but the guard must
        # zero the accuracy.
        scene_of = np.array([c.id.split("_")[0] for c in cells])
        pose_scene = np.array([p.cell_id.split("_")[0] for p in poses])
        other_idx = np.zeros((len(poses), 1), np.int64)
        for qi in range(len(poses)):
            other = np.flatnonzero(scene_of != pose_scene[qi])
            # pick the geometrically closest other-scene cell
            centers = loader.bank.bbox_w[other][:, 0:2] + 15.0
            d = np.linalg.norm(centers - poses[qi].pose_w[0:2], axis=1)
            other_idx[qi, 0] = other[np.argmin(d)]
        accs_other = pipe._accuracies(poses, loader.bank, other_idx,
                                      np.full((len(poses), 1, 2), 0.5),
                                      top_k=(1,))
        assert accs_other[1][15] == 0.0
