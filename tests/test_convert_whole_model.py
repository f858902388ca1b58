"""Round-trip test for the whole-model pickle converter.

Builds torch modules with the reference's exact module tree and attribute
names (CellRetrievalNetwork / SuperGlueMatch — cell_retrieval.py:23-67,
superglue_matcher.py:51-84, superglue.py:53-146,183-230, modules.py:11-53,
pointcloud/pointnet2.py:18-65), pickles them wholesale under the
reference's module paths, DELETES those modules so unpickling must go
through the stub machinery, converts, and checks that every tensor lands
in the right flax slot and the restored models run.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from text2pos_tpu.config import TrainConfig

E = 16          # embed dim for both fake models
V = 11          # vocab size (10 words + padding row, reference style)
NUM_LAYERS = 2  # self/cross pairs


def get_mlp(channels):
    """reference modules.py:11-29 — nested Sequential((Linear, BN, ReLU))."""
    return tnn.Sequential(*[
        tnn.Sequential(tnn.Linear(channels[i - 1], channels[i]),
                       tnn.BatchNorm1d(channels[i]), tnn.ReLU())
        for i in range(1, len(channels))
    ])


def sg_mlp(channels):
    """reference superglue.py:53-64 — Conv1d/BN/ReLU flat Sequential."""
    layers = []
    for i in range(1, len(channels)):
        layers.append(tnn.Conv1d(channels[i - 1], channels[i], 1, bias=True))
        if i < len(channels) - 1:
            layers.append(tnn.BatchNorm1d(channels[i]))
            layers.append(tnn.ReLU())
    return tnn.Sequential(*layers)


class SetAbstractionLayer(tnn.Module):
    def __init__(self, mlp):
        super().__init__()
        self.point_conv = tnn.Module()
        self.point_conv.local_nn = mlp


class GlobalAbstractionLayer(tnn.Module):
    def __init__(self, mlp):
        super().__init__()
        self.mlp = mlp


class CellRetrievalNetwork(tnn.Module):
    pass


class DynamicEdgeConv(tnn.Module):
    def __init__(self, nn_module):
        super().__init__()
        self.nn = nn_module


class SuperGlueMatch(tnn.Module):
    pass


class SuperGlue(tnn.Module):
    pass


class AttentionalPropagation(tnn.Module):
    def __init__(self):
        super().__init__()
        self.attn = tnn.Module()
        self.attn.merge = tnn.Conv1d(E, E, 1)
        self.attn.proj = tnn.ModuleList(
            [tnn.Conv1d(E, E, 1) for _ in range(3)])
        self.mlp = sg_mlp([2 * E, 2 * E, E])


def make_pointnet():
    """Attribute-faithful PointNet2 (reference pointnet2.py:52-65)."""
    pn = tnn.Module()
    pn.sa1 = SetAbstractionLayer(get_mlp([3 + 3, 32, 64]))
    pn.sa2 = SetAbstractionLayer(get_mlp([64 + 3, 128, 128]))
    pn.sa3 = SetAbstractionLayer(get_mlp([128 + 3, 256, 256]))
    pn.ga = GlobalAbstractionLayer(get_mlp([256 + 3, 512, 1024]))
    pn.lin1 = tnn.Linear(1024, 512)
    pn.lin2 = tnn.Linear(512, 256)
    pn.class_classifier = tnn.Linear(256, 23)
    pn.color_classifier = tnn.Linear(256, 9)
    pn.dim2 = 256
    return pn


def make_object_encoder():
    oe = tnn.Module()
    oe.class_embedding = tnn.Embedding(23, E, padding_idx=0)
    oe.color_embedding = tnn.Embedding(9, E, padding_idx=0)
    oe.pos_encoder = get_mlp([3, 64, E])
    oe.color_encoder = get_mlp([3, 64, E])
    oe.pointnet = make_pointnet()
    oe.mlp_pointnet = get_mlp([256, E])
    oe.mlp_merge = get_mlp([3 * E, E])
    return oe


def make_language_encoder(words):
    le = tnn.Module()
    le.known_words = {w: i + 1 for i, w in enumerate(words)}
    le.word_embedding = tnn.Embedding(len(le.known_words) + 1, E,
                                      padding_idx=0)
    le.lstm = tnn.LSTM(E, E, num_layers=1, bidirectional=True)
    return le


def _args(**kw):
    import argparse

    base = dict(embed_dim=E, use_features=["class", "color", "position"],
                variation=0, class_embed=False, color_embed=False,
                num_layers=NUM_LAYERS, sinkhorn_iters=5, pointnet_features=2)
    base.update(kw)
    return argparse.Namespace(**base)


WORDS = ["the", "pose", "is", "east", "of", "a", "gray", "building",
         "north", "pad"]


def make_coarse_model():
    m = CellRetrievalNetwork()
    m.args = _args()
    m.embed_dim = E
    m.variation = 0
    m.object_encoder = make_object_encoder()
    m.language_encoder = make_language_encoder(WORDS)
    m.graph1 = DynamicEdgeConv(get_mlp([2 * E, E, E]))
    m.lin = get_mlp([E, E, E])
    return m, {"models.cell_retrieval": [CellRetrievalNetwork],
               "models.pointcloud.pointnet2": [SetAbstractionLayer,
                                               GlobalAbstractionLayer],
               "torch_geometric.nn": [DynamicEdgeConv]}


def make_fine_model():
    m = SuperGlueMatch()
    m.args = _args()
    m.embed_dim = E
    m.num_layers = NUM_LAYERS
    m.sinkhorn_iters = 5
    m.object_encoder = make_object_encoder()
    m.language_encoder = make_language_encoder(WORDS)
    # get_mlp_offset([E, E//2, 2]) = Sequential(Linear, ReLU, Linear)
    m.mlp_offsets = tnn.Sequential(tnn.Linear(E, E // 2), tnn.ReLU(),
                                   tnn.Linear(E // 2, 2))
    sg = SuperGlue()
    sg.bin_score = tnn.Parameter(torch.tensor(1.234))
    sg.final_proj = tnn.Conv1d(E, E, 1, bias=True)
    sg.gnn = tnn.Module()
    sg.gnn.layers = tnn.ModuleList(
        [AttentionalPropagation() for _ in range(2 * NUM_LAYERS)])
    m.superglue = sg
    return m, {"models.superglue_matcher": [SuperGlueMatch],
               "models.pointcloud.pointnet2": [SetAbstractionLayer,
                                               GlobalAbstractionLayer],
               "models.superglue": [SuperGlue, AttentionalPropagation]}


def save_under_reference_paths(model, registry, path):
    """Register classes under the reference's module paths, torch.save the
    whole model, then remove those modules so loading exercises stubs."""
    installed = []
    for mod_name, classes in registry.items():
        parts = mod_name.split(".")
        for i in range(1, len(parts) + 1):
            name = ".".join(parts[:i])
            if name not in sys.modules:
                sys.modules[name] = types.ModuleType(name)
                installed.append(name)
        for cls in classes:
            cls.__module__ = mod_name
            cls.__qualname__ = cls.__name__
            setattr(sys.modules[mod_name], cls.__name__, cls)
    torch.save(model, path)
    for name in installed:
        del sys.modules[name]
    # Drop any stub roots a previous conversion may have registered so each
    # test starts clean.
    for name in list(sys.modules):
        root = name.split(".")[0]
        if root in ("models", "torch_geometric", "easydict") and not any(
                name == k for k in registry):
            mod = sys.modules[name]
            if isinstance(mod, types.ModuleType) and not hasattr(
                    mod, "__file__"):
                del sys.modules[name]


def _shapes(tree):
    return jax.tree.map(lambda x: jnp.shape(x), tree)


class TestCoarseConversion:
    def test_round_trip(self, tmp_path):
        model, registry = make_coarse_model()
        pth = str(tmp_path / "coarse_whole.pth")
        out = str(tmp_path / "coarse_native.msgpack")
        save_under_reference_paths(model, registry, pth)

        from text2pos_tpu.utils.convert_whole_model import convert_checkpoint

        payload = convert_checkpoint(pth, out)
        assert payload["extra"]["known_words"] == WORDS
        assert payload["extra"]["embed_dim"] == E

        # Structure + shapes must match a freshly initialized model.
        from text2pos_tpu.data.hints import Vocabulary
        from text2pos_tpu.train.coarse import CoarseTrainer

        cfg = TrainConfig(batch_size=2, embed_dim=E, pointnet_numpoints=16,
                          coarse_max_objects=4, num_mentioned=3,
                          max_text_len=16)
        vocab = Vocabulary(WORDS)
        trainer = CoarseTrainer(cfg, vocab)
        B, O, P = 2, 4, 16
        flat = B * O
        variables = jax.jit(trainer.model.init, static_argnums=(12, 13))(
            jax.random.PRNGKey(0),
            jnp.zeros((B, 16), jnp.int32), jnp.ones((B,), jnp.int32),
            jnp.zeros((flat, P, 3)), jnp.zeros((flat, P, 3)),
            jnp.zeros((flat, 3)), jnp.zeros((flat, 3)),
            jnp.zeros((flat,), jnp.int32), jnp.zeros((flat,), jnp.int32),
            jnp.ones((flat,), bool), jnp.zeros((flat,), jnp.int32),
            jnp.zeros((flat,), jnp.int32), B, O)
        assert _shapes(variables["params"]) == _shapes(payload["params"])
        assert _shapes(variables["batch_stats"]) == _shapes(
            payload["batch_stats"])

        # Spot-check exact tensor placement.
        np.testing.assert_allclose(
            payload["params"]["language_encoder"]["lstm_fwd_w_ih"],
            model.language_encoder.lstm.weight_ih_l0.detach().numpy().T)
        np.testing.assert_allclose(
            payload["params"]["graph1"]["edge_mlp"]["dense_1"]["kernel"],
            model.graph1.nn[1][0].weight.detach().numpy().T)
        np.testing.assert_allclose(
            payload["batch_stats"]["lin"]["bn_0"]["var"],
            model.lin[0][1].running_var.detach().numpy())

        # The converted variables must actually run.
        out_enc = trainer.model.apply(
            {"params": payload["params"],
             "batch_stats": payload["batch_stats"]},
            jnp.ones((B, 16), jnp.int32), jnp.full((B,), 5, jnp.int32),
            method=type(trainer.model).encode_text)
        assert np.all(np.isfinite(np.asarray(out_enc)))


class TestFineConversion:
    def test_round_trip(self, tmp_path):
        model, registry = make_fine_model()
        pth = str(tmp_path / "fine_whole.pth")
        out = str(tmp_path / "fine_native.msgpack")
        save_under_reference_paths(model, registry, pth)

        from text2pos_tpu.utils.convert_whole_model import convert_checkpoint

        payload = convert_checkpoint(pth, out)
        assert payload["extra"]["num_layers"] == NUM_LAYERS
        assert payload["extra"]["sinkhorn_iters"] == 5
        assert float(payload["params"]["superglue"]["bin_score"]) == (
            pytest.approx(1.234))

        from text2pos_tpu.data.hints import Vocabulary
        from text2pos_tpu.train.fine import FineTrainer

        cfg = TrainConfig(batch_size=2, embed_dim=E, num_layers=NUM_LAYERS,
                          sinkhorn_iters=5, pointnet_numpoints=16,
                          pad_size=4, num_mentioned=3, max_hint_len=8)
        vocab = Vocabulary(WORDS)
        trainer = FineTrainer(cfg, vocab)
        B, O, P, H, T = 2, 4, 16, 3, 8
        variables = jax.jit(trainer.model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((B, H, T), jnp.int32), jnp.ones((B, H), jnp.int32),
            jnp.zeros((B, O, P, 3)), jnp.zeros((B, O, P, 3)),
            jnp.zeros((B, O, 3)), jnp.zeros((B, O, 3)),
            jnp.zeros((B, O), jnp.int32), jnp.zeros((B, O), jnp.int32))
        assert _shapes(variables["params"]) == _shapes(payload["params"])
        assert _shapes(variables["batch_stats"]) == _shapes(
            payload["batch_stats"])

        # Spot-checks: Conv1d(k=1) → transposed dense kernel with head
        # channels re-laid-out from the reference's interleaved split to our
        # contiguous blocks; proj order.
        from text2pos_tpu.utils.convert_whole_model import _attn_head_perm

        perm = _attn_head_perm(E, 4)
        lyr = model.superglue.gnn.layers[1]
        np.testing.assert_allclose(
            payload["params"]["superglue"]["gnn"]["layer_1"]["attn"]
            ["proj_k"]["kernel"],
            lyr.attn.proj[1].weight.detach().numpy()[:, :, 0].T[:, perm])
        np.testing.assert_allclose(
            payload["params"]["superglue"]["gnn"]["layer_1"]["attn"]
            ["merge"]["kernel"],
            lyr.attn.merge.weight.detach().numpy()[:, :, 0].T[perm, :])
        np.testing.assert_allclose(
            payload["params"]["mlp_offsets"]["dense_1"]["kernel"],
            model.mlp_offsets[2].weight.detach().numpy().T)

        # Full fine forward with converted weights must run and be finite.
        out_m = trainer.model.apply(
            {"params": payload["params"],
             "batch_stats": payload["batch_stats"]},
            jnp.ones((B, H, T), jnp.int32), jnp.full((B, H), 4, jnp.int32),
            jnp.asarray(np.random.default_rng(0).random((B, O, P, 3)),
                        jnp.float32),
            jnp.zeros((B, O, P, 3)), jnp.zeros((B, O, 3)),
            jnp.zeros((B, O, 3)), jnp.ones((B, O), jnp.int32),
            jnp.ones((B, O), jnp.int32), train=False)
        assert np.all(np.isfinite(np.asarray(out_m["P"])))
        assert np.all(np.isfinite(np.asarray(out_m["offsets"])))


class TestRestrictedUnpickling:
    def test_malicious_reduce_is_blocked(self, tmp_path):
        """A checkpoint whose pickle invokes os.system via __reduce__ must be
        rejected by the allowlisting Unpickler, not executed."""
        import pickle

        class Evil:
            def __reduce__(self):
                import os
                return (os.system, ("echo pwned",))

        path = tmp_path / "evil.pth"
        torch.save({"model": Evil()}, str(path))

        from text2pos_tpu.utils.convert_whole_model import load_whole_model

        with pytest.raises(pickle.UnpicklingError, match="blocked unpickle"):
            load_whole_model(str(path))

    def test_stub_modules_are_scoped(self, tmp_path):
        """After load_whole_model returns, no stub package may shadow a later
        genuine import of e.g. ``models``."""
        model, registry = make_coarse_model()
        pth = str(tmp_path / "coarse_scoped.pth")
        save_under_reference_paths(model, registry, pth)

        from text2pos_tpu.utils.convert_whole_model import (
            _StubFinder, _StubModule, load_whole_model)

        loaded = load_whole_model(pth)
        assert type(loaded).__name__ == "CellRetrievalNetwork"
        leftover = [n for n, m in sys.modules.items()
                    if isinstance(m, _StubModule)]
        assert leftover == []
        assert not any(isinstance(f, _StubFinder) for f in sys.meta_path)


class TestAttentionForwardParity:
    """Converted attention must compute the SAME function as the torch
    original — not merely land tensors in the right slots.

    The reference splits d_model into heads as ``view(B, dim, heads, N)``
    (superglue.py:108-112): interleaved channels, head h owns channels
    c % heads == h. Our flax attention reshapes ``(B, N, heads, dim)``:
    contiguous blocks. The converter re-lays-out q/k/v output channels and
    the merge kernel's input rows; this test verifies the composition
    numerically against a torch forward with the reference's exact
    semantics.
    """

    HEADS = 4

    @staticmethod
    def _torch_attention_forward(proj, merge, x_q, x_kv, heads):
        """Reference MultiHeadedAttention.forward (superglue.py:103-115):
        Conv1d projections, view(B, dim, heads, N), scaled-dot attention
        over the N axis, merge Conv1d. Inputs [B, D, N]."""
        B, D, _ = x_q.shape
        dim = D // heads
        q = proj[0](x_q).view(B, dim, heads, -1)
        k = proj[1](x_kv).view(B, dim, heads, -1)
        v = proj[2](x_kv).view(B, dim, heads, -1)
        scores = torch.einsum("bdhn,bdhm->bhnm", q, k) / dim ** 0.5
        prob = torch.nn.functional.softmax(scores, dim=-1)
        out = torch.einsum("bhnm,bdhm->bdhn", prob, v)
        return merge(out.contiguous().view(B, dim * heads, -1))

    def test_converted_attention_matches_torch(self):
        torch.manual_seed(7)
        B, N, M = 2, 5, 7
        proj = [tnn.Conv1d(E, E, 1) for _ in range(3)]
        merge = tnn.Conv1d(E, E, 1)
        x_q = torch.randn(B, E, N)
        x_kv = torch.randn(B, E, M)
        with torch.no_grad():
            ref = self._torch_attention_forward(
                proj, merge, x_q, x_kv, self.HEADS).numpy()

        from text2pos_tpu.models.superglue import MultiHeadedAttention
        from text2pos_tpu.utils.convert_whole_model import (
            _attn_head_perm, _attn_merge, _attn_proj)

        sd = {}
        for j, p in enumerate(proj):
            sd[f"a.proj.{j}.weight"] = p.weight.detach().numpy()
            sd[f"a.proj.{j}.bias"] = p.bias.detach().numpy()
        sd["a.merge.weight"] = merge.weight.detach().numpy()
        sd["a.merge.bias"] = merge.bias.detach().numpy()

        perm = _attn_head_perm(E, self.HEADS)
        params = {"merge": _attn_merge(sd, "a.merge", perm)}
        for j, name in enumerate(("proj_q", "proj_k", "proj_v")):
            params[name] = _attn_proj(sd, f"a.proj.{j}", perm)

        model = MultiHeadedAttention(num_heads=self.HEADS, d_model=E)
        got = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                          jnp.asarray(x_q.numpy().transpose(0, 2, 1)),
                          jnp.asarray(x_kv.numpy().transpose(0, 2, 1)),
                          jnp.asarray(x_kv.numpy().transpose(0, 2, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref,
                                   atol=2e-5)

    def test_converted_gnn_block_matches_torch(self):
        """Full AttentionalPropagation block (attn + residual MLP), eval-mode
        BN, torch vs converted flax — compounds the per-head partition over
        the merge + MLP path where a layout mismatch is amplified."""
        torch.manual_seed(11)
        B, N, M = 2, 6, 4
        lyr = AttentionalPropagation().eval()
        # Give BN non-trivial running stats.
        lyr.mlp[1].running_mean.normal_(0.0, 0.3)
        lyr.mlp[1].running_var.uniform_(0.5, 1.5)
        x = torch.randn(B, E, N)
        src = torch.randn(B, E, M)
        with torch.no_grad():
            msg = self._torch_attention_forward(
                list(lyr.attn.proj), lyr.attn.merge, x, src, self.HEADS)
            ref = lyr.mlp(torch.cat([x, msg], dim=1)).numpy()

        from text2pos_tpu.models.superglue import AttentionalPropagation as FlaxAP
        from text2pos_tpu.utils.convert_whole_model import (
            _attn_head_perm, _attn_merge, _attn_proj, _bn, _conv1d)

        sd = {f"l.{k}": v.detach().numpy()
              for k, v in lyr.state_dict().items()}
        perm = _attn_head_perm(E, self.HEADS)
        attn_p = {"merge": _attn_merge(sd, "l.attn.merge", perm)}
        for j, name in enumerate(("proj_q", "proj_k", "proj_v")):
            attn_p[name] = _attn_proj(sd, f"l.attn.proj.{j}", perm)
        mlp_p = {"dense_0": _conv1d(sd, "l.mlp.0"),
                 "dense_1": _conv1d(sd, "l.mlp.3")}
        bn_p, bn_s = _bn(sd, "l.mlp.1")
        mlp_p["bn_0"] = bn_p

        # torch .eval() normalizes with running stats; the flax equivalent
        # is train=False with eval_batch_stats left False.
        model = FlaxAP(feature_dim=E)
        variables = {
            "params": jax.tree.map(jnp.asarray,
                                   {"attn": attn_p, "mlp": mlp_p}),
            "batch_stats": jax.tree.map(jnp.asarray, {"mlp": {"bn_0": bn_s}}),
        }
        got = model.apply(variables,
                          jnp.asarray(x.numpy().transpose(0, 2, 1)),
                          jnp.asarray(src.numpy().transpose(0, 2, 1)),
                          train=False)
        np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref,
                                   atol=2e-5)


class TestConvertedFullSuperGlueParity:
    """Strongest checkpoint-fidelity evidence: a whole-model pickle with
    non-trivial BN running statistics, loaded through the stub machinery
    and converted, must make our SuperGlue (all GNN blocks + final
    projection + Sinkhorn) compute the SAME transport matrix as the torch
    original run in eval mode — the per-block parity tests compose."""

    def test_converted_superglue_log_transport_matches_torch(self, tmp_path):
        torch.manual_seed(23)
        model, registry = make_fine_model()
        for lyr in model.superglue.gnn.layers:
            bn = lyr.mlp[1]
            bn.running_mean.normal_(0.0, 0.3)
            bn.running_var.uniform_(0.5, 1.5)
            bn.weight.data.uniform_(0.7, 1.3)
            bn.bias.data.normal_(0.0, 0.2)
        model.eval()

        B, M, N = 2, 5, 3
        rng = np.random.default_rng(3)
        d0 = rng.normal(size=(B, M, E)).astype(np.float32)
        d1 = rng.normal(size=(B, N, E)).astype(np.float32)

        # Torch reference forward (reference superglue.py:130-146,239-266):
        # alternating self/cross blocks applied to both sets with shared
        # weights, then final_proj + scaled scores + log-OT.
        tfwd = TestAttentionForwardParity._torch_attention_forward
        x0 = torch.from_numpy(d0).permute(0, 2, 1)   # [B, E, M]
        x1 = torch.from_numpy(d1).permute(0, 2, 1)
        with torch.no_grad():
            for i, lyr in enumerate(model.superglue.gnn.layers):
                cross = (i % 2) == 1
                src0, src1 = (x1, x0) if cross else (x0, x1)
                m0 = tfwd(list(lyr.attn.proj), lyr.attn.merge, x0, src0, 4)
                m1 = tfwd(list(lyr.attn.proj), lyr.attn.merge, x1, src1, 4)
                x0 = x0 + lyr.mlp(torch.cat([x0, m0], dim=1))
                x1 = x1 + lyr.mlp(torch.cat([x1, m1], dim=1))
            md0 = model.superglue.final_proj(x0).permute(0, 2, 1)
            md1 = model.superglue.final_proj(x1).permute(0, 2, 1)
            scores = torch.einsum("bmd,bnd->bmn", md0, md1) / E ** 0.5
            from test_superglue_torch_parity import torch_log_optimal_transport

            want = torch_log_optimal_transport(
                scores, model.superglue.bin_score, 5).numpy()

        pth = str(tmp_path / "fine_whole.pth")
        out = str(tmp_path / "fine_native.msgpack")
        save_under_reference_paths(model, registry, pth)

        from text2pos_tpu.models.superglue import SuperGlue as FlaxSuperGlue
        from text2pos_tpu.utils.convert_whole_model import convert_checkpoint

        payload = convert_checkpoint(pth, out)
        # eval_batch_stats=False + train=False ≡ torch .eval(): normalize
        # with the converted running statistics (models/blocks.py:26-41).
        flax_model = FlaxSuperGlue(descriptor_dim=E, num_layers=NUM_LAYERS,
                                   sinkhorn_iterations=5)
        got = flax_model.apply(
            {"params": payload["params"]["superglue"],
             "batch_stats": payload["batch_stats"]["superglue"]},
            jnp.asarray(d0), jnp.asarray(d1), train=False)
        np.testing.assert_allclose(np.asarray(got["log_P"]), want, atol=3e-4)
