"""Round-2 parity fixes: triplet loss, --no_ontop, num_distractors,
multi-scene street oracle."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2pos_tpu.config import EvalConfig, PrepareConfig, TrainConfig
from text2pos_tpu.data.hints import (
    Vocabulary,
    build_vocabulary,
    create_hint_description,
)
from text2pos_tpu.data.loaders import CoarseLoader, FineLoader
from text2pos_tpu.data.synthetic import (
    make_synthetic_dataset,
    make_synthetic_fine_dataset,
)

TINY = dict(batch_size=4, embed_dim=16, num_layers=1, sinkhorn_iters=5,
            pointnet_numpoints=32, coarse_max_objects=16, pad_size=8,
            num_mentioned=6, max_hint_len=12, epochs=1)


class TestTripletLoss:
    """--ranking_loss triplet must train (reference coarse.py:46-50,277-278)."""

    def test_train_step(self, synthetic_data):
        from text2pos_tpu.train.coarse import CoarseTrainer

        cells, poses = synthetic_data
        cfg = TrainConfig(ranking_loss="triplet", **TINY)
        vocab = Vocabulary(build_vocabulary(
            [create_hint_description(p) for p in poses]))
        loader = CoarseLoader(cells, poses, vocab, cfg.batch_size,
                              cfg.coarse_max_objects, cfg.pointnet_numpoints,
                              cfg.max_text_len)
        trainer = CoarseTrainer(cfg, vocab)
        rng = jax.random.PRNGKey(0)
        batch = next(loader.epoch(seed=0))
        state = trainer.init_state(batch, rng, 1)
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in ("num_real", "pose_idx")}
        new_state, loss = trainer.train_step(state, jb, rng)
        assert np.isfinite(float(loss))
        # Parameters must actually move.
        moved = jax.tree.map(
            lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
            state.params, new_state.params)
        assert any(jax.tree.leaves(moved))

    def test_loss_semantics(self):
        from text2pos_tpu.train.losses import triplet_margin_loss

        anchor = jnp.array([[1.0, 0.0], [0.0, 1.0]])
        # positive == anchor, negative far: loss 0 (margin satisfied)
        neg = jnp.array([[-1.0, 0.0], [0.0, -1.0]])
        assert float(triplet_margin_loss(anchor, anchor, neg, 0.35)) == 0.0
        # positive far, negative == anchor: loss = ||a-p|| + margin
        loss = float(triplet_margin_loss(anchor, neg, anchor, 0.35))
        assert np.isclose(loss, 2.0 + 0.35)


class TestNoOntop:
    """--no_ontop drops the on-top direction (reference args.py:28,52;
    descriptions.py:197)."""

    def test_dirname_tag(self):
        cfg = PrepareConfig(no_ontop=True)
        assert "noOntop" in cfg.dirname
        assert "noOntop" not in PrepareConfig().dirname

    def test_describe_no_ontop(self, synthetic_data):
        from text2pos_tpu.data.descriptions import describe_pose_in_pose_cell

        cells, _ = synthetic_data
        found_direction = False
        for cell in cells:
            # Pose right on an object's center would be "on-top" normally.
            obj = cell.objects[0]
            pose = np.clip(obj.get_center(), 0.05, 0.95)
            descrs = describe_pose_in_pose_cell(
                cell.bbox_w[0:3] + pose * cell.cell_size, cell, "closest",
                min(6, len(cell.objects)), no_ontop=True)
            if descrs is None:
                continue
            for d in descrs:
                assert d.direction != "on-top"
                found_direction = True
        assert found_direction

    def test_prepare_threads_flag(self):
        import inspect

        from text2pos_tpu.data import prepare

        src = inspect.getsource(prepare.create_poses)
        assert "no_ontop=cfg.no_ontop" in src


class TestNumDistractors:
    """--num_distractors controls synthetic fine cells (reference
    synthetic.py:91-96, training/args.py:13,82)."""

    def test_fixed_count(self):
        cells, poses = make_synthetic_fine_dataset(
            seed=0, length=8, num_mentioned=6, pad_size=16, num_distractors=4)
        assert len(cells) == len(poses) == 8
        for cell in cells:
            # 6 mentioned + 4 distractors, minus up to 3 deletions.
            assert 7 <= len(cell.objects) <= 10

    def test_all_varies(self):
        cells, _ = make_synthetic_fine_dataset(
            seed=0, length=16, num_mentioned=6, pad_size=16,
            num_distractors="all")
        counts = {len(c.objects) for c in cells}
        assert len(counts) > 1  # random distractor counts

    def test_trains_fine_step(self):
        from text2pos_tpu.train.fine import FineTrainer

        cells, poses = make_synthetic_fine_dataset(
            seed=0, length=8, num_mentioned=6, pad_size=8, num_distractors=2)
        cfg = TrainConfig(**TINY)
        vocab = Vocabulary(build_vocabulary(
            [create_hint_description(p) for p in poses]))
        loader = FineLoader(cells, poses, vocab, cfg.batch_size, cfg.pad_size,
                            cfg.num_mentioned, cfg.pointnet_numpoints,
                            cfg.max_hint_len)
        trainer = FineTrainer(cfg, vocab)
        rng = jax.random.PRNGKey(0)
        batch = next(loader.epoch(seed=0))
        state = trainer.init_state(batch, rng, 1)
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in ("num_real", "pose_idx")}
        _, metrics = trainer.train_step(state, jb, rng)
        assert np.isfinite(float(metrics["loss"]))

    def test_cli_dataset_option(self):
        from text2pos_tpu.utils.cli import load_split

        cfg = TrainConfig(dataset="SYNTHETIC-FINE", num_distractors="3",
                          **TINY)
        cells, poses = load_split(cfg, "val")
        assert len(cells) == len(poses) > 0
        for cell in cells:
            assert 6 <= len(cell.objects) <= 9


class TestStreetOracleMultiScene:
    """street_oracle must key street centers off each pose's scene
    (reference pipeline.py:68-108 hardcodes scene 0010)."""

    @pytest.fixture(scope="class")
    def setup(self):
        from text2pos_tpu.evaluation.pipeline import LocalizationPipeline
        from text2pos_tpu.train.coarse import CoarseTrainer
        from text2pos_tpu.train.fine import FineTrainer

        c1, p1 = make_synthetic_dataset(seed=0, scene_name="1111", extent=60.0)
        c2, p2 = make_synthetic_dataset(seed=1, scene_name="2222", extent=60.0)
        cells, poses = c1 + c2, p1 + p2
        cfg = TrainConfig(**TINY)
        vocab = Vocabulary(build_vocabulary(
            [create_hint_description(p) for p in poses]))
        loader = CoarseLoader(cells, poses, vocab, cfg.batch_size,
                              cfg.coarse_max_objects, cfg.pointnet_numpoints,
                              cfg.max_text_len)
        ecfg = EvalConfig(top_k=(1, 3), threshs=(5, 15), pad_size=cfg.pad_size,
                          num_mentioned=6, max_hint_len=cfg.max_hint_len,
                          pointnet_numpoints=cfg.pointnet_numpoints,
                          coarse_max_objects=cfg.coarse_max_objects,
                          street_oracle=True)
        coarse = CoarseTrainer(cfg, vocab)
        fine = FineTrainer(cfg, vocab)
        rng = jax.random.PRNGKey(0)
        cstate = coarse.init_state(next(loader.epoch(seed=0)), rng, 1)
        floader = FineLoader(cells, poses, vocab, cfg.batch_size, cfg.pad_size,
                             cfg.num_mentioned, cfg.pointnet_numpoints,
                             cfg.max_hint_len)
        fstate = fine.init_state(next(floader.epoch(seed=0)), rng, 1)
        pipe = LocalizationPipeline(coarse, cstate, fine, fstate, ecfg)
        return pipe, loader, poses

    def test_in_scene_and_on_street(self, setup):
        pipe, loader, poses = setup
        bank = loader.bank
        # One "street" per scene quadrant: centers spread across the scene.
        centers = {
            "1111": np.array([[15.0, 15.0, 10.0], [45.0, 45.0, 10.0]]),
            "2222": np.array([[15.0, 45.0, 10.0], [45.0, 15.0, 10.0]]),
        }
        # max_k=1: beyond the on-street cells argsort returns -inf-masked
        # fillers (same as the reference's behaviour).
        top_idx = pipe._street_oracle_retrieval(
            loader, poses, max_k=1, street_centers=centers)

        from scipy.spatial.distance import cdist

        cell_scenes = np.array([cid.split("_")[0] for cid in bank.cell_ids])
        cell_centers = 0.5 * (bank.bbox_w[:, 0:3] + bank.bbox_w[:, 3:6])
        checked = 0
        for qi, pose in enumerate(poses):
            scene = pose.scene_name
            pose_street = int(np.argmin(
                np.linalg.norm(centers[scene] - pose.pose_w, axis=1)))
            for ci in top_idx[qi]:
                if not np.isfinite(cell_centers[ci]).all():
                    continue
                # Retrieved cells must be from the pose's scene (the old
                # single-scene code had no such guarantee) ...
                assert cell_scenes[ci] == scene
                # ... and on the pose's street.
                cell_street = int(np.argmin(cdist(
                    cell_centers[ci:ci + 1], centers[scene])[0]))
                assert cell_street == pose_street
                checked += 1
        assert checked > 0
