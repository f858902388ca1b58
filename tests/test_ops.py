"""Golden tests for the kernel library against NumPy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2pos_tpu.ops.fps import farthest_point_sampling
from text2pos_tpu.ops.neighbors import ball_query, masked_knn, pairwise_sqdist
from text2pos_tpu.ops.pooling import gather_neighbors, masked_max, masked_mean
from text2pos_tpu.ops.sinkhorn import extract_matches, log_optimal_transport
from text2pos_tpu.ops.lstm import LSTMParams, bilstm_final_hidden
from text2pos_tpu.ops.retrieval import topk_retrieval
from text2pos_tpu.ops.transforms import fixed_points, normalize_scale, random_rotate_z


def np_fps(points, num_samples, start=0):
    n = points.shape[0]
    selected = [start]
    min_dist = np.full(n, np.inf)
    for _ in range(num_samples - 1):
        d = np.sum((points - points[selected[-1]]) ** 2, axis=1)
        min_dist = np.minimum(min_dist, d)
        selected.append(int(np.argmax(min_dist)))
    return np.array(selected)


class TestFPS:
    def test_matches_numpy(self, rng):
        pts = rng.random((3, 64, 3)).astype(np.float32)
        got = np.asarray(farthest_point_sampling(jnp.asarray(pts), 16))
        for b in range(3):
            np.testing.assert_array_equal(got[b], np_fps(pts[b], 16))

    def test_spread(self, rng):
        # FPS on a line picks the extremes first.
        pts = np.zeros((1, 8, 3), np.float32)
        pts[0, :, 0] = np.arange(8)
        got = np.asarray(farthest_point_sampling(jnp.asarray(pts), 3))[0]
        assert got[0] == 0 and got[1] == 7


class TestNeighbors:
    def test_pairwise_sqdist(self, rng):
        a = rng.random((2, 5, 3)).astype(np.float32)
        b = rng.random((2, 7, 3)).astype(np.float32)
        got = np.asarray(pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
        want = np.sum((a[:, :, None] - b[:, None]) ** 2, axis=-1)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_ball_query(self, rng):
        pts = rng.random((2, 32, 3)).astype(np.float32)
        cent = pts[:, :8]
        idx, valid = ball_query(jnp.asarray(cent), jnp.asarray(pts), 0.3, 16)
        idx, valid = np.asarray(idx), np.asarray(valid)
        d = np.sqrt(np.sum((cent[:, :, None] - pts[:, None]) ** 2, axis=-1))
        for b in range(2):
            for s in range(8):
                in_ball = np.where(d[b, s] <= 0.3)[0]
                got = set(idx[b, s][valid[b, s]].tolist())
                want = set(in_ball[:16].tolist())
                assert got == want
                # centroid itself is always a neighbor
                assert valid[b, s].any()

    def test_masked_knn(self, rng):
        x = rng.random((2, 10, 4)).astype(np.float32)
        mask = np.ones((2, 10), bool)
        mask[1, 7:] = False
        idx, valid = masked_knn(jnp.asarray(x), jnp.asarray(mask), 3)
        idx, valid = np.asarray(idx), np.asarray(valid)
        d = np.sum((x[:, :, None] - x[:, None]) ** 2, axis=-1)
        for b in range(2):
            for i in range(10):
                if not mask[b, i]:
                    assert not valid[b, i].any()
                    continue
                dd = d[b, i].copy()
                dd[~mask[b]] = np.inf
                want = set(np.argsort(dd, kind="stable")[:3].tolist())
                got = set(idx[b, i][valid[b, i]].tolist())
                assert got == want
                assert i in got  # self-loop included

    def test_knn_small_set(self):
        x = np.zeros((1, 5, 2), np.float32)
        x[0, :, 0] = np.arange(5)
        mask = np.array([[True, True, False, False, False]])
        idx, valid = masked_knn(jnp.asarray(x), jnp.asarray(mask), 4)
        assert np.asarray(valid)[0, 0].sum() == 2  # only 2 valid neighbors exist


class TestPooling:
    def test_masked_max_mean(self, rng):
        x = rng.normal(size=(2, 6, 4)).astype(np.float32)
        mask = np.ones((2, 6, 1), bool)
        mask[0, 4:] = False
        gm = np.asarray(masked_max(jnp.asarray(x), jnp.asarray(mask), axis=1))
        np.testing.assert_allclose(gm[0], x[0, :4].max(0), atol=1e-6)
        np.testing.assert_allclose(gm[1], x[1].max(0), atol=1e-6)
        mm = np.asarray(masked_mean(jnp.asarray(x), jnp.asarray(mask), axis=1))
        np.testing.assert_allclose(mm[0], x[0, :4].mean(0), atol=1e-6)

    def test_all_masked_is_zero(self):
        x = jnp.ones((1, 3, 2))
        mask = jnp.zeros((1, 3, 1), bool)
        assert np.all(np.asarray(masked_max(x, mask, axis=1)) == 0)
        assert np.all(np.asarray(masked_mean(x, mask, axis=1)) == 0)

    def test_gather(self, rng):
        x = rng.normal(size=(2, 8, 3)).astype(np.float32)
        idx = rng.integers(0, 8, size=(2, 4, 5))
        got = np.asarray(gather_neighbors(jnp.asarray(x), jnp.asarray(idx)))
        for b in range(2):
            np.testing.assert_allclose(got[b], x[b][idx[b]], atol=1e-6)


def np_log_optimal_transport(scores, alpha, iters):
    """Direct NumPy port of reference superglue.py:149-177 for goldens."""
    b, m, n = scores.shape
    couplings = np.zeros((b, m + 1, n + 1))
    couplings[:, :m, :n] = scores
    couplings[:, m, :] = alpha
    couplings[:, :, n] = alpha
    norm = -np.log(m + n)
    log_mu = np.concatenate([np.full(m, norm), [np.log(n) + norm]])
    log_nu = np.concatenate([np.full(n, norm), [np.log(m) + norm]])
    from scipy.special import logsumexp

    u = np.zeros((b, m + 1))
    v = np.zeros((b, n + 1))
    for _ in range(iters):
        u = log_mu[None] - logsumexp(couplings + v[:, None, :], axis=2)
        v = log_nu[None] - logsumexp(couplings + u[:, :, None], axis=1)
    return couplings + u[:, :, None] + v[:, None, :] - norm


class TestSinkhorn:
    def test_matches_reference_math(self, rng):
        scores = rng.normal(size=(2, 5, 4)).astype(np.float64)
        got = np.asarray(
            log_optimal_transport(jnp.asarray(scores), jnp.asarray(1.3), 30)
        )
        want = np_log_optimal_transport(scores, 1.3, 30)
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_transport_marginals(self, rng):
        scores = rng.normal(size=(1, 6, 4)).astype(np.float32)
        Z = log_optimal_transport(jnp.asarray(scores), jnp.asarray(1.0), 100)
        # Z is scaled by M+N, so P = exp(Z)/(M+N) is a doubly-"stochastic"
        # transport: non-dustbin rows sum to 1/(M+N) and the whole matrix to 1.
        P = np.exp(np.asarray(Z)) / (6 + 4)
        np.testing.assert_allclose(P.sum(axis=2)[0, :6], np.full(6, 1.0 / (6 + 4)), atol=1e-3)
        np.testing.assert_allclose(P[0].sum(), 1.0, atol=1e-3)

    def test_extract_matches_mutual(self):
        # Construct a transport where object 0↔hint 1 is a clear mutual max.
        z = np.full((1, 3, 3), -5.0, np.float32)
        z[0, 0, 1] = 0.0
        z[0, 1, 2] = -0.1
        z[0, 2, 2] = -0.05  # hint 2's best is object 2 → object 1 not mutual
        Z = np.full((1, 4, 4), -5.0, np.float32)
        Z[:, :3, :3] = z
        out = extract_matches(jnp.asarray(Z), match_threshold=0.2)
        m0 = np.asarray(out["matches0"])[0]
        assert m0[0] == 1
        assert m0[1] == -1  # not mutual
        m1 = np.asarray(out["matches1"])[0]
        assert m1[1] == 0


class TestLSTM:
    def _np_lstm(self, x, lengths, p: LSTMParams, reverse=False):
        B, T, E = x.shape
        H = p.w_hh.shape[0]
        out = np.zeros((B, H))
        for b in range(B):
            h = np.zeros(H)
            c = np.zeros(H)
            ts = range(lengths[b])
            if reverse:
                ts = reversed(list(ts))
            for t in ts:
                gates = x[b, t] @ np.asarray(p.w_ih) + h @ np.asarray(p.w_hh) + np.asarray(p.b)
                i, f, g, o = np.split(gates, 4)
                sig = lambda v: 1 / (1 + np.exp(-v))
                c = sig(f) * c + sig(i) * np.tanh(g)
                h = sig(o) * np.tanh(c)
            out[b] = h
        return out

    def test_masked_bilstm_matches_numpy(self, rng):
        B, T, E = 3, 7, 8
        x = rng.normal(size=(B, T, E)).astype(np.float32)
        lengths = np.array([7, 3, 1])
        mk = lambda: LSTMParams(
            w_ih=jnp.asarray(rng.normal(size=(E, 4 * E)).astype(np.float32) * 0.2),
            w_hh=jnp.asarray(rng.normal(size=(E, 4 * E)).astype(np.float32) * 0.2),
            b=jnp.asarray(rng.normal(size=(4 * E,)).astype(np.float32) * 0.1),
        )
        fwd, bwd = mk(), mk()
        got = np.asarray(
            bilstm_final_hidden(jnp.asarray(x), jnp.asarray(lengths), fwd, bwd)
        )
        want = 0.5 * (
            self._np_lstm(x, lengths, fwd) + self._np_lstm(x, lengths, bwd, reverse=True)
        )
        np.testing.assert_allclose(got, want, atol=2e-3)

    def test_padding_is_ignored(self, rng):
        B, T, E = 2, 6, 4
        x = rng.normal(size=(B, T, E)).astype(np.float32)
        x2 = x.copy()
        x2[:, 3:] = 99.0  # garbage in padding
        lengths = np.array([3, 3])
        mk = lambda: LSTMParams(
            w_ih=jnp.asarray(rng.normal(size=(E, 4 * E)).astype(np.float32) * 0.2),
            w_hh=jnp.asarray(rng.normal(size=(E, 4 * E)).astype(np.float32) * 0.2),
            b=jnp.zeros(4 * E, jnp.float32),
        )
        fwd, bwd = mk(), mk()
        a = np.asarray(bilstm_final_hidden(jnp.asarray(x), jnp.asarray(lengths), fwd, bwd))
        b = np.asarray(bilstm_final_hidden(jnp.asarray(x2), jnp.asarray(lengths), fwd, bwd))
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestRetrieval:
    def test_topk(self, rng):
        q = rng.normal(size=(5, 16)).astype(np.float32)
        c = rng.normal(size=(20, 16)).astype(np.float32)
        scores, idx = topk_retrieval(jnp.asarray(q), jnp.asarray(c), 4)
        want = np.argsort(-(q @ c.T), axis=1)[:, :4]
        np.testing.assert_array_equal(np.asarray(idx), want)


class TestTransforms:
    def test_fixed_points_only_valid(self, rng):
        xyz = rng.random((2, 3, 10, 3)).astype(np.float32)
        rgb = rng.random((2, 3, 10, 3)).astype(np.float32)
        counts = np.array([[10, 4, 1], [2, 10, 5]])
        sx, _ = fixed_points(jnp.asarray(xyz), jnp.asarray(rgb), jnp.asarray(counts),
                             8, jax.random.PRNGKey(0))
        sx = np.asarray(sx)
        for b in range(2):
            for o in range(3):
                valid_set = {tuple(p) for p in xyz[b, o, : counts[b, o]]}
                for p in sx[b, o]:
                    assert tuple(p) in valid_set

    def test_normalize_scale(self, rng):
        xyz = rng.normal(size=(4, 32, 3)).astype(np.float32) * 5
        out = np.asarray(normalize_scale(jnp.asarray(xyz)))
        np.testing.assert_allclose(out.mean(axis=1), 0, atol=1e-5)
        assert np.abs(out).max() <= 1.0 + 1e-5

    def test_rotate_preserves_z_and_norm(self, rng):
        xyz = rng.normal(size=(4, 32, 3)).astype(np.float32)
        out = np.asarray(random_rotate_z(jnp.asarray(xyz), jax.random.PRNGKey(1)))
        np.testing.assert_allclose(out[..., 2], xyz[..., 2], atol=1e-6)
        np.testing.assert_allclose(
            np.linalg.norm(out[..., :2], axis=-1),
            np.linalg.norm(xyz[..., :2], axis=-1),
            atol=1e-4,
        )


class TestSinkhornPallas:
    def test_matches_xla_impl(self, rng):
        """Pallas fused kernel (interpret mode on CPU) ≡ XLA fori_loop."""
        import jax

        from text2pos_tpu.ops.sinkhorn import log_sinkhorn
        from text2pos_tpu.ops.sinkhorn_pallas import log_sinkhorn_pallas

        B, M, N = 37, 9, 5  # non-multiple of block to exercise padding
        Z = jnp.asarray(rng.normal(size=(B, M, N)).astype(np.float32))
        log_mu = jnp.asarray(rng.normal(size=(B, M)).astype(np.float32))
        log_nu = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
        want = np.asarray(log_sinkhorn(Z, log_mu, log_nu, 20))
        got = np.asarray(log_sinkhorn_pallas(Z, log_mu, log_nu, 20,
                                             block_b=16, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-4)
