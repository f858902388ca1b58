"""Device-resident fused coarse training: semantics and learning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2pos_tpu.config import TrainConfig
from text2pos_tpu.data.hints import (
    Vocabulary,
    build_vocabulary,
    create_hint_description,
    flip_text,
)
from text2pos_tpu.train.fused_coarse import FusedCoarseTrainer, build_token_swap

TINY = dict(batch_size=8, embed_dim=32, pointnet_numpoints=32,
            coarse_max_objects=16, num_mentioned=6, max_hint_len=12,
            max_text_len=72, learning_rate=1e-3, epochs=1)


@pytest.fixture(scope="module")
def fused(synthetic_data):
    cells, poses = synthetic_data
    cfg = TrainConfig(**TINY)
    vocab = Vocabulary(build_vocabulary(
        [create_hint_description(p) for p in poses]))
    return FusedCoarseTrainer(cfg, vocab, cells, poses), vocab, poses


class TestTokenSwap:
    def test_swap_tables_match_string_rewrite(self, fused):
        trainer, vocab, poses = fused
        swap_h = build_token_swap(vocab, 1)
        swap_v = build_token_swap(vocab, -1)
        for p in poses[:5]:
            text = " ".join(create_hint_description(p))
            tok, length = vocab.encode(text, 72)
            want_h, _ = vocab.encode(flip_text(text, 1), 72)
            want_v, _ = vocab.encode(flip_text(text, -1), 72)
            np.testing.assert_array_equal(swap_h[tok], want_h)
            np.testing.assert_array_equal(swap_v[tok], want_v)


class TestAssembleText:
    def test_packing_no_interior_padding(self, fused):
        trainer, vocab, poses = fused
        B = 4
        tokens = np.asarray(trainer.dev["hint_tokens"][:B])
        lengths = np.asarray(trainer.dev["hint_lengths"][:B])
        joined, total = trainer._assemble_text(
            jnp.asarray(tokens), jnp.asarray(lengths),
            jnp.zeros(B, bool), jnp.zeros(B, bool), jax.random.PRNGKey(0))
        joined, total = np.asarray(joined), np.asarray(total)
        for b in range(B):
            assert total[b] == lengths[b].sum()
            # no zeros (pad/unk) inside the sequence
            assert np.all(joined[b, : total[b]] > 0)
            assert np.all(joined[b, total[b]:] == 0)
            # same multiset of tokens as the unshuffled hints
            want = np.sort(np.concatenate(
                [tokens[b, h, : lengths[b, h]] for h in range(tokens.shape[1])]))
            np.testing.assert_array_equal(np.sort(joined[b, : total[b]]), want)


class TestFusedStep:
    def test_learns_and_matches_host_semantics(self, fused):
        trainer, vocab, poses = fused
        cfg = trainer.cfg
        rng = jax.random.PRNGKey(0)
        # Initialize params via the host loader path (shared model).
        from text2pos_tpu.data.loaders import CoarseLoader
        from text2pos_tpu.data.synthetic import make_synthetic_dataset

        cells, poses2 = make_synthetic_dataset(seed=0)
        host_loader = CoarseLoader(cells, poses2, vocab, cfg.batch_size,
                                   cfg.coarse_max_objects,
                                   cfg.pointnet_numpoints, cfg.max_text_len)
        state = trainer.init_state(next(host_loader.epoch(seed=0)), rng, 1)

        idx = jnp.arange(cfg.batch_size, dtype=jnp.int32)
        # Fixed step rng → identical augmented batch every step → the loss
        # must overfit just like the host-path overfit test.
        fixed = jax.random.fold_in(rng, 7)
        losses = []
        for i in range(30):
            state, loss = trainer.fused_train_step(state, idx, fixed)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < 0.6 * losses[0], losses
        # And with per-step augmentation the step stays finite.
        state, loss = trainer.fused_train_step(state, idx,
                                               jax.random.fold_in(rng, 99))
        assert np.isfinite(float(loss))


class TestFusedFine:
    def test_epoch_learns(self, synthetic_data):
        from text2pos_tpu.train.fused_fine import FusedFineTrainer

        cells, poses = synthetic_data
        cfg = TrainConfig(batch_size=8, embed_dim=32, num_layers=1,
                          sinkhorn_iters=10, pointnet_numpoints=32,
                          coarse_max_objects=16, pad_size=8, num_mentioned=6,
                          max_hint_len=12, learning_rate=1e-3, epochs=1)
        vocab = Vocabulary(build_vocabulary(
            [create_hint_description(p) for p in poses]))
        trainer = FusedFineTrainer(cfg, vocab, cells, poses)
        rng = jax.random.PRNGKey(0)
        batch = next(trainer.loader.epoch(seed=0))
        state = trainer.init_state(batch, rng, 1)

        losses = []
        for epoch in range(10):
            state, loss = trainer.fused_train_epoch(state, 0, rng)  # same order
            losses.append(loss)
        assert all(np.isfinite(losses))
        assert losses[-1] < 0.8 * losses[0], losses
