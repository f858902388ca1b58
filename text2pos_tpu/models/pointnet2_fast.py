"""Serving-path PointNet++ forward using the fused Pallas SA kernel.

``pointnet2_eval_fast(variables, xyz, rgb)`` reproduces
``PointNet2.apply(variables, xyz, rgb, train=False)`` exactly (same
parameter tree, same math) but folds every BatchNorm's eval-mode affine
into the adjacent linear layers and runs each set-abstraction level as one
fused Pallas kernel (ops/pointconv_pallas.py) — no selection tensors or
neighbor gathers touch HBM.

BN fold algebra (MaskedBatchNorm eval: y = (x − μ)/√(σ²+ε) · γ + β):
    s = γ / √(σ²+ε),  t = β − μ·s           →  y = x·s + t
First layer (separable): bn1(a_n − c_s) = (a_n·s1 + t1) − c_s·s1.
Second layer: relu(bn2(h@W2 + b2)) = relu(h@(W2·s2) + (b2·s2 + t2)).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from text2pos_tpu.ops.fps import farthest_point_sampling
from text2pos_tpu.ops.pointconv_pallas import separable_pointconv_max

_SA_SPECS = (("sa1", 0.2), ("sa2", 0.3), ("sa3", 0.4))
_K_CAP = 32


def _bn_affine(params: Dict, stats: Dict):
    eps = 1e-5
    s = params["scale"] / jnp.sqrt(stats["var"] + eps)
    t = params["bias"] - stats["mean"] * s
    return s, t


def _sa_level_fast(params: Dict, stats: Dict, x, pos, radius: float,
                   interpret: bool = False):
    """One SA level via the fused kernel. x [B,N,C], pos [B,N,3]."""
    B, N, _ = pos.shape
    S = max(1, N // 2)

    conv_p, conv_s = params["conv_mlp"], stats["conv_mlp"]
    k1 = conv_p["dense_0"]["kernel"]          # [C+3, C1]
    b1 = conv_p["dense_0"]["bias"]
    s1, t1 = _bn_affine(conv_p["bn_0"], conv_s["bn_0"])
    k2 = conv_p["dense_1"]["kernel"]          # [C1, C2]
    b2 = conv_p["dense_1"]["bias"]
    s2, t2 = _bn_affine(conv_p["bn_1"], conv_s["bn_1"])

    idx = farthest_point_sampling(pos, S)
    cent = jnp.take_along_axis(pos, idx[..., None], axis=1)

    xpos = jnp.concatenate([x, pos], axis=-1)
    a = (xpos @ k1 + b1) * s1 + t1                          # [B, N, C1]
    c = (cent @ k1[-3:]) * s1                               # [B, S, C1]

    w2f = k2 * s2[None, :]
    b2f = b2 * s2 + t2
    out = separable_pointconv_max(a, pos, c, cent, w2f, b2f, radius, _K_CAP,
                                  interpret=interpret)
    return out, cent


def pointnet2_eval_fast(variables: Dict, xyz: jnp.ndarray, rgb: jnp.ndarray,
                        interpret: bool = False) -> Dict[str, jnp.ndarray]:
    """Eval-mode PointNet++ forward on the standard variable tree."""
    params = variables["params"]
    stats = variables["batch_stats"]

    x, pos = rgb, xyz
    for name, radius in _SA_SPECS:
        x, pos = _sa_level_fast(params[name], stats[name], x, pos, radius,
                                interpret=interpret)

    # Global abstraction: MLP (BN affines in eval) + global max.
    h = jnp.concatenate([x, pos], axis=-1)
    ga_p, ga_s = params["ga"]["mlp"], stats["ga"]["mlp"]
    for i in (0, 1):
        h = h @ ga_p[f"dense_{i}"]["kernel"] + ga_p[f"dense_{i}"]["bias"]
        s, t = _bn_affine(ga_p[f"bn_{i}"], ga_s[f"bn_{i}"])
        h = jnp.maximum(h * s + t, 0.0)
    features0 = jnp.max(h, axis=1)

    features1 = jnp.maximum(
        features0 @ params["lin1"]["kernel"] + params["lin1"]["bias"], 0.0)
    features2 = jnp.maximum(
        features1 @ params["lin2"]["kernel"] + params["lin2"]["bias"], 0.0)
    class_pred = (features2 @ params["class_classifier"]["kernel"]
                  + params["class_classifier"]["bias"])
    color_pred = (features2 @ params["color_classifier"]["kernel"]
                  + params["color_classifier"]["bias"])
    return {
        "features0": features0,
        "features1": features1,
        "features2": features2,
        "class_pred": class_pred,
        "color_pred": color_pred,
    }
