"""Learning-dynamics regression tests: overfit a single batch.

These catch broken gradient flow (dead towers, detached losses, optimizer
mis-wiring) — the failure mode where everything runs but nothing trains.
"""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy integration tier (conftest --slow)

import jax
import jax.numpy as jnp
import numpy as np

from text2pos_tpu.config import TrainConfig
from text2pos_tpu.data.hints import Vocabulary, build_vocabulary, create_hint_description
from text2pos_tpu.data.loaders import CoarseLoader, FineLoader
from text2pos_tpu.train.coarse import CoarseTrainer
from text2pos_tpu.train.fine import FineTrainer

TINY = dict(batch_size=8, embed_dim=32, num_layers=1, sinkhorn_iters=10,
            pointnet_numpoints=32, coarse_max_objects=16, pad_size=8,
            num_mentioned=6, max_hint_len=12, learning_rate=1e-3, epochs=1)


@pytest.fixture(scope="module")
def setup(synthetic_data):
    cells, poses = synthetic_data
    cfg = TrainConfig(**TINY)
    vocab = Vocabulary(build_vocabulary(
        [create_hint_description(p) for p in poses]))
    return cells, poses, cfg, vocab


class TestCoarseOverfit:
    def test_single_batch_loss_drops(self, setup):
        cells, poses, cfg, vocab = setup
        loader = CoarseLoader(cells, poses, vocab, cfg.batch_size,
                              cfg.coarse_max_objects, cfg.pointnet_numpoints,
                              cfg.max_text_len)
        trainer = CoarseTrainer(cfg, vocab)
        rng = jax.random.PRNGKey(0)
        batch = next(loader.epoch(seed=0))
        state = trainer.init_state(batch, rng, 1)
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in ("num_real", "pose_idx")}
        losses = []
        for i in range(40):
            state, loss = trainer.train_step(state, jb,
                                             jax.random.fold_in(rng, i))
            losses.append(float(loss))
        assert losses[-1] < 0.6 * losses[0], losses


class TestFineOverfit:
    def test_single_batch_loss_drops_and_recall_rises(self, setup):
        cells, poses, cfg, vocab = setup
        loader = FineLoader(cells, poses, vocab, cfg.batch_size, cfg.pad_size,
                            cfg.num_mentioned, cfg.pointnet_numpoints,
                            cfg.max_hint_len)
        # No LR warm-up interference: run enough steps at the warm-up LR is
        # too slow, so use a trainer whose warm-up boundary is 0 epochs.
        import text2pos_tpu.train.fine as fine_mod

        trainer = FineTrainer(cfg, vocab)
        rng = jax.random.PRNGKey(0)
        batch = next(loader.epoch(seed=0))
        # steps_per_epoch=1 → warm-up covers the first 3 steps only.
        state = trainer.init_state(batch, rng, 1)
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in ("num_real", "pose_idx")}
        first = None
        for i in range(50):
            state, metrics = trainer.train_step(state, jb,
                                                jax.random.fold_in(rng, i))
            if first is None:
                first = float(metrics["loss"])
        last = float(metrics["loss"])
        assert last < 0.7 * first, (first, last)
