"""Deep numerical parity of the SuperGlue matching tail vs torch.

Re-implements the reference's attention block and log-optimal-transport in
plain torch from the published equations (multi-head attention with shared
per-block weights, residual MLP without trailing activation, scaled score
matrix, dustbin-augmented Sinkhorn, mutual-max match extraction —
/root/reference/models/superglue.py:90-330) and checks our flax modules
produce the same numbers when loaded with identical weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from text2pos_tpu.models.superglue import (  # noqa: E402
    AttentionalPropagation,
    SuperGlue,
)

DIM = 16
HEADS = 4


def torch_attention_block(x, source, w):
    """One AttentionalPropagation in torch: attn + MLP([x, msg])."""
    import torch.nn.functional as F

    def lin(v, weight, bias):
        return v @ torch.from_numpy(weight) + torch.from_numpy(bias)

    B, N, D = x.shape
    hd = D // HEADS
    q = lin(x, w["q_w"], w["q_b"]).reshape(B, N, HEADS, hd)
    k = lin(source, w["k_w"], w["k_b"]).reshape(B, -1, HEADS, hd)
    v = lin(source, w["v_w"], w["v_b"]).reshape(B, -1, HEADS, hd)
    scores = torch.einsum("bnhd,bmhd->bhnm", q, k) / hd ** 0.5
    prob = F.softmax(scores, dim=-1)
    msg = torch.einsum("bhnm,bmhd->bnhd", prob, v).reshape(B, N, D)
    msg = lin(msg, w["merge_w"], w["merge_b"])

    h = torch.cat([x, msg], dim=-1)
    # SuperGlue MLP: Dense→BN→ReLU→Dense (BN in eval mode ≡ identity with
    # fresh stats, so we test with running stats mean0/var1, scale1/bias0).
    h = lin(h, w["mlp0_w"], w["mlp0_b"])
    h = F.relu(h)  # BN(0,1) with unit scale is identity pre-ReLU
    h = lin(h, w["mlp1_w"], w["mlp1_b"])
    return h


class TestAttentionBlockParity:
    def test_matches_torch(self, rng):
        B, N, M = 2, 5, 3
        x = rng.normal(size=(B, N, DIM)).astype(np.float32)
        src = rng.normal(size=(B, M, DIM)).astype(np.float32)

        model = AttentionalPropagation(DIM, HEADS)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                               jnp.asarray(src))
        p = variables["params"]

        w = {
            "q_w": np.asarray(p["attn"]["proj_q"]["kernel"]),
            "q_b": np.asarray(p["attn"]["proj_q"]["bias"]),
            "k_w": np.asarray(p["attn"]["proj_k"]["kernel"]),
            "k_b": np.asarray(p["attn"]["proj_k"]["bias"]),
            "v_w": np.asarray(p["attn"]["proj_v"]["kernel"]),
            "v_b": np.asarray(p["attn"]["proj_v"]["bias"]),
            "merge_w": np.asarray(p["attn"]["merge"]["kernel"]),
            "merge_b": np.asarray(p["attn"]["merge"]["bias"]),
            "mlp0_w": np.asarray(p["mlp"]["dense_0"]["kernel"]),
            "mlp0_b": np.asarray(p["mlp"]["dense_0"]["bias"]),
            "mlp1_w": np.asarray(p["mlp"]["dense_1"]["kernel"]),
            "mlp1_b": np.asarray(p["mlp"]["dense_1"]["bias"]),
        }

        # Eval mode so BN uses fresh running stats (mean 0, var 1) and the
        # torch reference can treat it as identity.
        got = np.asarray(model.apply(variables, jnp.asarray(x),
                                     jnp.asarray(src), train=False))
        want = torch_attention_block(torch.from_numpy(x),
                                     torch.from_numpy(src), w).numpy()
        np.testing.assert_allclose(got, want, atol=2e-4)


def torch_log_optimal_transport(scores, alpha, iters):
    """Direct torch transcription of the published log-OT equations."""
    b, m, n = scores.shape
    one = scores.new_tensor(1)
    ms, ns = (m * one), (n * one)
    bins0 = alpha.expand(b, m, 1)
    bins1 = alpha.expand(b, 1, n)
    a = alpha.expand(b, 1, 1)
    couplings = torch.cat(
        [torch.cat([scores, bins0], -1), torch.cat([bins1, a], -1)], 1)
    norm = -(ms + ns).log()
    log_mu = torch.cat([norm.expand(m), ns.log()[None] + norm])
    log_nu = torch.cat([norm.expand(n), ms.log()[None] + norm])
    log_mu, log_nu = log_mu[None].expand(b, -1), log_nu[None].expand(b, -1)
    u, v = torch.zeros_like(log_mu), torch.zeros_like(log_nu)
    for _ in range(iters):
        u = log_mu - torch.logsumexp(couplings + v.unsqueeze(1), dim=2)
        v = log_nu - torch.logsumexp(couplings + u.unsqueeze(2), dim=1)
    return couplings + u.unsqueeze(2) + v.unsqueeze(1) - norm


class TestFullSuperGlueParity:
    def test_transport_and_matches_match_torch(self, rng):
        """End-to-end SuperGlue (0 GNN layers → isolates proj+OT+extraction)."""
        B, M, N = 2, 6, 4
        d0 = rng.normal(size=(B, M, DIM)).astype(np.float32)
        d1 = rng.normal(size=(B, N, DIM)).astype(np.float32)

        model = SuperGlue(descriptor_dim=DIM, num_layers=0,
                          sinkhorn_iterations=40)
        variables = model.init(jax.random.PRNGKey(1), jnp.asarray(d0),
                               jnp.asarray(d1))
        out = model.apply(variables, jnp.asarray(d0), jnp.asarray(d1),
                          train=False)

        p = variables["params"]
        w = torch.from_numpy(np.asarray(p["final_proj"]["kernel"]))
        bias = torch.from_numpy(np.asarray(p["final_proj"]["bias"]))
        alpha = torch.tensor(float(np.asarray(p["bin_score"])))

        t0 = torch.from_numpy(d0) @ w + bias
        t1 = torch.from_numpy(d1) @ w + bias
        scores = torch.einsum("bmd,bnd->bmn", t0, t1) / DIM ** 0.5
        Z = torch_log_optimal_transport(scores, alpha, 40)

        np.testing.assert_allclose(np.asarray(out["log_P"]), Z.numpy(),
                                   atol=2e-4)

        # Mutual-max + threshold extraction parity.
        z = Z[:, :-1, :-1]
        max0, max1 = z.max(2), z.max(1)
        indices0, indices1 = max0.indices, max1.indices
        ar_m = torch.arange(M)[None]
        ar_n = torch.arange(N)[None]
        mutual0 = ar_m == indices1.gather(1, indices0)
        mutual1 = ar_n == indices0.gather(1, indices1)
        zero = Z.new_tensor(0)
        mscores0 = torch.where(mutual0, max0.values.exp(), zero)
        valid0 = mutual0 & (mscores0 > 0.2)
        valid1 = mutual1 & valid0.gather(1, indices1)
        want_m0 = torch.where(valid0, indices0,
                              indices0.new_tensor(-1)).numpy()
        want_m1 = torch.where(valid1, indices1,
                              indices1.new_tensor(-1)).numpy()
        np.testing.assert_array_equal(np.asarray(out["matches0"]), want_m0)
        np.testing.assert_array_equal(np.asarray(out["matches1"]), want_m1)
