"""Device-resident fused coarse training: semantics and learning."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy integration tier (conftest --slow)

import jax
import jax.numpy as jnp
import numpy as np

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


class TestNegBank:
    """Global-negative memory bank (config.neg_bank)."""

    def _trainers(self, synthetic_data):
        cells, poses = synthetic_data
        vocab = Vocabulary(build_vocabulary(
            [create_hint_description(p) for p in poses]))
        base = FusedCoarseTrainer(TrainConfig(**TINY), vocab, cells, poses)
        nb = FusedCoarseTrainer(
            TrainConfig(neg_bank=True, neg_bank_hardest=4,
                        neg_bank_warmup=0, **TINY), vocab, cells, poses)
        return base, nb, vocab

    def test_inactive_bank_matches_baseline_bitwise(self, synthetic_data):
        """With neg_weight = 0 (warmup) the fused step must equal the
        plain fused step exactly — the bank term is purely additive."""
        base, nb, _ = self._trainers(synthetic_data)
        rng = jax.random.PRNGKey(0)
        from text2pos_tpu.data.loaders import CoarseLoader

        cells, poses = synthetic_data
        host = CoarseLoader(cells, poses, base.vocab, base.cfg.batch_size,
                            base.cfg.coarse_max_objects,
                            base.cfg.pointnet_numpoints,
                            base.cfg.max_text_len)
        batch = next(host.epoch(seed=0))
        s0 = base.init_state(batch, rng, 1)
        s1 = nb.init_state(batch, rng, 1)
        idx = jnp.arange(base.cfg.batch_size, dtype=jnp.int32)
        step_rng = jax.random.fold_in(rng, 3)
        _, loss0 = base.fused_train_step(s0, idx, step_rng)
        _, loss1 = nb.fused_train_step(s1, idx, step_rng)
        assert float(loss0) == float(loss1)

    def test_refresh_matches_eval_encodings(self, synthetic_data):
        """Bank embeddings must equal the eval-path cell embeddings."""
        _, nb, _ = self._trainers(synthetic_data)
        cells, poses = synthetic_data
        from text2pos_tpu.data.loaders import CoarseLoader

        host = CoarseLoader(cells, poses, nb.vocab, nb.cfg.batch_size,
                            nb.cfg.coarse_max_objects,
                            nb.cfg.pointnet_numpoints, nb.cfg.max_text_len)
        state = nb.init_state(next(host.epoch(seed=0)), jax.random.PRNGKey(0), 1)
        nb.refresh_neg_bank(state)
        bank = np.asarray(nb.dev["neg_bank"])
        assert bank.shape == (nb.bank.num_cells, nb.cfg.embed_dim)
        np.testing.assert_allclose(np.linalg.norm(bank, axis=1), 1.0,
                                   atol=1e-4)
        # Cross-check a chunk against the direct core call.
        idx = jnp.arange(nb.cfg.batch_size, dtype=jnp.int32)
        direct = np.asarray(jax.jit(
            lambda s, d, i: nb._encode_cells_core(s, d, i),
        )(state, nb.dev, idx))
        np.testing.assert_allclose(bank[: nb.cfg.batch_size], direct,
                                   atol=1e-5)

    def test_active_bank_epoch_finite_and_learns(self, synthetic_data):
        _, nb, _ = self._trainers(synthetic_data)
        cells, poses = synthetic_data
        from text2pos_tpu.data.loaders import CoarseLoader

        host = CoarseLoader(cells, poses, nb.vocab, nb.cfg.batch_size,
                            nb.cfg.coarse_max_objects,
                            nb.cfg.pointnet_numpoints, nb.cfg.max_text_len)
        state = nb.init_state(next(host.epoch(seed=0)), jax.random.PRNGKey(0), 1)
        rng = jax.random.PRNGKey(1)
        losses = []
        for epoch in range(1, 4):
            state, loss = nb.fused_train_epoch(state, epoch, rng)
            losses.append(loss)
        assert all(np.isfinite(losses)), losses
        assert float(np.asarray(nb.dev["neg_weight"])) == nb.cfg.neg_bank_weight
