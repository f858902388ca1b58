"""Numerical parity vs PyTorch for the reference's trickiest building blocks.

SURVEY.md §7 flags packed-LSTM final-state semantics and BatchNorm
running-stat handling as the hard parity points; torch (CPU) is available
in this image, so we check both against the real thing with identical
weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


class TestBatchNormParity:
    def test_train_and_eval_match_torch(self, rng):
        from text2pos_tpu.models.blocks import MaskedBatchNorm

        N, C = 32, 12
        x1 = rng.normal(size=(N, C)).astype(np.float32) * 2 + 1
        x2 = rng.normal(size=(N, C)).astype(np.float32) * 0.5 - 1

        tbn = torch.nn.BatchNorm1d(C)  # eps 1e-5, momentum 0.1
        mbn = MaskedBatchNorm()
        variables = mbn.init(jax.random.PRNGKey(0), jnp.asarray(x1))

        # two training steps, tracking running stats
        state = variables
        outs = []
        for x in (x1, x2):
            out, updates = mbn.apply(state, jnp.asarray(x), train=True,
                                     mutable=["batch_stats"])
            state = {"params": state["params"],
                     "batch_stats": updates["batch_stats"]}
            outs.append(np.asarray(out))

        tbn.train()
        touts = [tbn(torch.from_numpy(x)).detach().numpy() for x in (x1, x2)]
        for got, want in zip(outs, touts):
            np.testing.assert_allclose(got, want, atol=1e-5)

        np.testing.assert_allclose(
            np.asarray(state["batch_stats"]["mean"]),
            tbn.running_mean.numpy(), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(state["batch_stats"]["var"]),
            tbn.running_var.numpy(), atol=1e-4)

        # eval mode uses the running stats
        tbn.eval()
        x3 = rng.normal(size=(N, C)).astype(np.float32)
        got = np.asarray(mbn.apply(state, jnp.asarray(x3), train=False))
        want = tbn(torch.from_numpy(x3)).detach().numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_masked_equals_torch_on_ragged(self, rng):
        """Masked BN over padded data ≡ torch BN over the packed rows."""
        from text2pos_tpu.models.blocks import MaskedBatchNorm

        N, C = 24, 6
        x = rng.normal(size=(N, C)).astype(np.float32)
        mask = np.zeros(N, bool)
        mask[:17] = True

        mbn = MaskedBatchNorm()
        variables = mbn.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got, _ = mbn.apply(variables, jnp.asarray(x), mask=jnp.asarray(mask),
                           train=True, mutable=["batch_stats"])
        tbn = torch.nn.BatchNorm1d(C)
        tbn.train()
        want = tbn(torch.from_numpy(x[:17])).detach().numpy()
        np.testing.assert_allclose(np.asarray(got)[:17], want, atol=1e-5)


class TestLSTMParity:
    def test_bilstm_final_states_match_packed_torch(self, rng):
        """Our gated-scan bi-LSTM ≡ torch packed bidirectional LSTM,
        mean of final hidden states (reference modules.py:78-90)."""
        from text2pos_tpu.ops.lstm import LSTMParams, bilstm_final_hidden

        B, T, E = 4, 9, 10
        lengths = np.array([9, 5, 2, 7])
        x = rng.normal(size=(B, T, E)).astype(np.float32)
        for b, l in enumerate(lengths):  # garbage past the true length
            x[b, l:] = 99.0

        tl = torch.nn.LSTM(input_size=E, hidden_size=E, bidirectional=True,
                           num_layers=1)
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            torch.from_numpy(x), torch.tensor(lengths), batch_first=True,
            enforce_sorted=False)
        h0 = torch.zeros(2, B, E)
        c0 = torch.zeros(2, B, E)
        _, (h, _) = tl(packed, (h0, c0))
        want = torch.mean(h, dim=0).detach().numpy()

        def params(direction):
            sfx = "" if direction == "fwd" else "_reverse"
            w_ih = tl.__getattr__(f"weight_ih_l0{sfx}").detach().numpy().T
            w_hh = tl.__getattr__(f"weight_hh_l0{sfx}").detach().numpy().T
            b = (tl.__getattr__(f"bias_ih_l0{sfx}")
                 + tl.__getattr__(f"bias_hh_l0{sfx}")).detach().numpy()
            return LSTMParams(jnp.asarray(w_ih), jnp.asarray(w_hh),
                              jnp.asarray(b))

        got = np.asarray(bilstm_final_hidden(
            jnp.asarray(x), jnp.asarray(lengths), params("fwd"), params("bwd")))
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestRankingLossParity:
    def test_pairwise_matches_torch_reference_math(self, rng):
        """Check against a direct torch transcription of losses.py:139-164
        (device-neutralized: the reference hardcodes .cuda())."""
        from text2pos_tpu.train.losses import pairwise_ranking_loss

        a = rng.normal(size=(8, 16)).astype(np.float32)
        p = rng.normal(size=(8, 16)).astype(np.float32)
        margin = 0.35

        im = torch.from_numpy(a)
        s = torch.from_numpy(p)
        im = im / torch.norm(im, dim=1, keepdim=True)
        s = s / torch.norm(s, dim=1, keepdim=True)
        scores = torch.mm(im, s.transpose(1, 0))
        diagonal = scores.diag()
        cost_s = torch.clamp((margin - diagonal).unsqueeze(1).expand_as(scores)
                             + scores, min=0)
        cost_im = torch.clamp((margin - diagonal).unsqueeze(1).expand_as(scores)
                              + scores.t(), min=0)
        cost_s = cost_s - torch.diag(cost_s.diag())
        cost_im = cost_im - torch.diag(cost_im.diag())
        want = float((cost_s.sum() + cost_im.sum()) / len(im))

        got = float(pairwise_ranking_loss(jnp.asarray(a), jnp.asarray(p), margin))
        np.testing.assert_allclose(got, want, rtol=1e-5)
