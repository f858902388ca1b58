"""Multi-device tests on the virtual 8-device CPU mesh."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy integration tier (conftest --slow)

import jax
import numpy as np


class TestMesh:
    def test_eight_virtual_devices(self):
        assert len(jax.devices()) >= 8, jax.devices()

    def test_make_mesh(self):
        from text2pos_tpu.parallel.dp import make_mesh

        mesh = make_mesh(8)
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("dp",)


class TestDryRun:
    def test_full_dp_training_steps(self):
        """The driver contract: one full DP train step per stage compiles
        and executes over an 8-device mesh."""
        import __graft_entry__ as g

        g.dryrun_multichip(8)


class TestVisloc:
    def test_perfect_features_localize(self, rng):
        from text2pos_tpu.evaluation.visloc import evaluate_features

        D = 40
        db_feats = rng.normal(size=(D, 32))
        db_poses = rng.random((D, 2)) * 200
        # queries = noisy copies of db entries → top-1 must localize exactly
        q_idx = rng.integers(0, D, 10)
        q_feats = db_feats[q_idx] + rng.normal(scale=1e-3, size=(10, 32))
        q_poses = db_poses[q_idx]
        accs = evaluate_features(db_feats, db_poses, q_feats, q_poses,
                                 top_k=(1, 5), threshs=(5, 15))
        assert accs[1][5] == 1.0

    def test_random_features_mostly_fail(self, rng):
        from text2pos_tpu.evaluation.visloc import evaluate_features

        db_feats = rng.normal(size=(100, 16))
        db_poses = rng.random((100, 2)) * 2000
        q_feats = rng.normal(size=(30, 16))
        q_poses = rng.random((30, 2)) * 2000
        accs = evaluate_features(db_feats, db_poses, q_feats, q_poses,
                                 top_k=(1,), threshs=(5,))
        assert accs[1][5] < 0.5


class TestDPEvalEncoding:
    def test_sharded_cell_encoding_matches_single_device(self, synthetic_data):
        """DB cells encoded over the 8-device mesh must equal the
        single-device encoding (same params, eval mode)."""
        import jax.numpy as jnp

        from text2pos_tpu.config import TrainConfig
        from text2pos_tpu.data.dense import flatten_bank_slice
        from text2pos_tpu.data.hints import (
            Vocabulary, build_vocabulary, create_hint_description)
        from text2pos_tpu.data.loaders import CoarseLoader
        from text2pos_tpu.parallel.dp import (
            dp_encode_cells, make_mesh, stack_microbatches)
        from text2pos_tpu.train.coarse import CoarseTrainer

        cells, poses = synthetic_data
        cfg = TrainConfig(batch_size=2, embed_dim=16, pointnet_numpoints=32,
                          coarse_max_objects=16, num_mentioned=6,
                          max_hint_len=12)
        vocab = Vocabulary(build_vocabulary(
            [create_hint_description(p) for p in poses]))
        loader = CoarseLoader(cells, poses, vocab, cfg.batch_size,
                              cfg.coarse_max_objects, cfg.pointnet_numpoints,
                              cfg.max_text_len)
        trainer = CoarseTrainer(cfg, vocab)
        rng = jax.random.PRNGKey(0)
        state = trainer.init_state(next(loader.epoch(seed=0)), rng, 1)

        D, per_dev = 8, 2
        flat_cap = per_dev * cfg.coarse_max_objects
        micro = [
            flatten_bank_slice(loader.bank,
                               np.arange(d * per_dev, (d + 1) * per_dev),
                               flat_cap)
            for d in range(D)
        ]
        stacked = {k: jnp.asarray(v)
                   for k, v in stack_microbatches(micro).items()}
        mesh = make_mesh(D)
        encode = dp_encode_cells(trainer, mesh, per_dev)
        got = np.asarray(encode(state, stacked, rng))
        assert got.shape == (D * per_dev, cfg.embed_dim)

        want = trainer.encode_all_cells(state, loader.bank, rng)[: D * per_dev]
        # Same params; sampling rng differs between the two paths only via
        # fold structure — compare with a loose tolerance on the embeddings'
        # geometry instead of exact values.
        cos = np.sum(got * want, axis=1)
        assert np.all(np.isfinite(got))
        assert np.mean(cos) > 0.9  # same cells → nearly identical embeddings
