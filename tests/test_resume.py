"""Outage-resilient resume tests.

A long training run on the remote-attached TPU can be killed at any time
(the relay has dropped mid-run before). ``TrainConfig.resume_path`` keeps a
rolling full-state checkpoint — params, BatchNorm stats, *optimizer*
state (Adam moments + schedule counts) and the completed-epoch counter —
so a restarted run continues the exact trajectory. These tests assert the
strong property: interrupted-then-resumed training reproduces the straight
run's parameters (not merely "loads without error").
"""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy integration tier (conftest --slow)

import jax
import numpy as np
import optax

from text2pos_tpu.config import TrainConfig
from text2pos_tpu.train.state import (TrainState, load_resume_checkpoint,
                                      save_resume_checkpoint)

TINY = dict(batch_size=2, embed_dim=16, num_layers=2, sinkhorn_iters=10,
            pointnet_numpoints=32, coarse_max_objects=16, pad_size=8,
            num_mentioned=6, max_text_len=48, max_hint_len=12,
            epochs=2, eval_every=1, max_batches=2)


def test_resume_checkpoint_roundtrip(tmp_path):
    """save/load round-trips params, BN stats, optimizer state and step."""
    params = {"w": jax.numpy.ones((3, 2)) * 0.5, "b": jax.numpy.zeros((2,))}
    bs = {"mean": jax.numpy.full((2,), 1.25)}
    tx = optax.adam(lambda step: 1e-3 * (0.9 ** (step // 4)))
    state = TrainState.create(params, bs, tx)
    for i in range(3):
        grads = jax.tree.map(lambda p: p * 0 + 0.1, state.params)
        state = state.apply_gradients(grads)

    path = str(tmp_path / "resume.msgpack")
    save_resume_checkpoint(path, state, epoch=7, best_acc=0.42,
                           best_path="/x/best.msgpack")

    fresh = TrainState.create(jax.tree.map(jax.numpy.zeros_like, params),
                              jax.tree.map(jax.numpy.zeros_like, bs), tx)
    restored, epoch, best_acc, best_path = load_resume_checkpoint(path, fresh)
    assert epoch == 7 and best_path == "/x/best.msgpack"
    assert abs(best_acc - 0.42) < 1e-9
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(restored.opt_state),
                    jax.tree.leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(restored.batch_stats["mean"]), np.asarray(bs["mean"]))


def test_coarse_resume_matches_straight_run(synthetic_data, tmp_path):
    """1 epoch + kill + resume to 2 epochs ≡ straight 2-epoch run.

    Everything epoch 2 consumes is a function of (state, epoch, base rng):
    the loader reseeds per epoch and step rngs are fold_in(rng, i), so with
    the full state (incl. Adam moments) restored the runs must coincide.
    """
    from text2pos_tpu.train import coarse

    cells, poses = synthetic_data

    cfg = TrainConfig(**TINY)
    state_a, _ = coarse.train(cfg, cells, poses, cells, poses,
                              checkpoint_dir=str(tmp_path / "a"),
                              log=lambda *a: None)

    resume = str(tmp_path / "coarse_resume.msgpack")
    cfg1 = TrainConfig(**{**TINY, "epochs": 1}, resume_path=resume)
    coarse.train(cfg1, cells, poses, cells, poses,
                 checkpoint_dir=str(tmp_path / "b"), log=lambda *a: None)

    cfg2 = TrainConfig(**TINY, resume_path=resume)
    state_b, _ = coarse.train(cfg2, cells, poses, cells, poses,
                              checkpoint_dir=str(tmp_path / "b"),
                              log=lambda *a: None)

    assert int(state_a.step) == int(state_b.step)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5),
        state_a.params, state_b.params)


def test_resume_path_skipped_when_absent(synthetic_data, tmp_path):
    """A resume_path that does not exist yet trains from scratch and
    creates the rolling checkpoint at the first eval point."""
    import os

    from text2pos_tpu.train import coarse

    cells, poses = synthetic_data
    resume = str(tmp_path / "fresh_resume.msgpack")
    cfg = TrainConfig(**{**TINY, "epochs": 1}, resume_path=resume)
    coarse.train(cfg, cells, poses, cells, poses,
                 checkpoint_dir=str(tmp_path), log=lambda *a: None)
    assert os.path.isfile(resume)
    import flax

    with open(resume, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    assert payload["epoch"] == 1 and "opt_state" in payload
