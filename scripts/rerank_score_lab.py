"""Offline re-rank scoring lab: sweep fusion variants on saved banks.

Input: the npz written by ``sweep_rerank.py --save_banks`` — per-(query,
slot) coarse similarity (descending), fine match mass (summed Sinkhorn
transport of matched objects), integer match count, and world-space
localization error (inf for cross-scene slots). With those, ANY
re-ranking score is a pure-numpy experiment: reorder the first K'
candidate slots by the score, keep top-10, and read accuracy straight
off the error matrix — no device, no recompute.

Variants swept here:
  blend     conf + lam*sims                  (the serving default)
  +count    conf + lam*sims + mu*count
  zblend    conf + lam*zscore_per_query(sims)
  rrf       1/(c+rank_conf) + w/(c+rank_sim) (reciprocal-rank fusion)

Run: python scripts/rerank_score_lab.py /tmp/rerank_banks.npz [--kprime 100]
"""

from __future__ import annotations

import argparse

import numpy as np


def acc(err: np.ndarray, score: np.ndarray, kprime: int, top_k: int = 10,
        thresh: float = 15.0) -> float:
    order = np.argsort(-score[:, :kprime], axis=1, kind="stable")[:, :top_k]
    chosen = np.take_along_axis(err[:, :kprime], order, axis=1)
    return float(np.mean(np.min(chosen, axis=1) <= thresh))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("banks")
    ap.add_argument("--kprime", type=int, nargs="*", default=[64, 100, 128])
    ap.add_argument("--top_k", type=int, default=10)
    args = ap.parse_args()

    d = np.load(args.banks)
    sims, conf = d["sims"], d["conf"]
    count, err = d["count"].astype(np.float32), d["err"]
    Q, kmax = sims.shape
    print(f"# banks: Q={Q}, kmax={kmax}")

    mu_s = sims.mean(axis=1, keepdims=True)
    sd_s = sims.std(axis=1, keepdims=True) + 1e-6
    zsims = (sims - mu_s) / sd_s

    for kp in args.kprime:
        kp = min(kp, kmax)
        ceiling = float(np.mean(np.min(err[:, :kp], axis=1) <= 15.0))
        base = acc(err, -np.broadcast_to(
            np.arange(kmax, dtype=np.float32), (Q, kmax)), kp, args.top_k)
        print(f"\n== K'={kp}  (coarse-order {base:0.4f}, "
              f"ceiling {ceiling:0.4f}) ==")

        best = {}
        for lam in (0.0, 1.0, 2.0, 4.0, 6.0, 8.0):
            a = acc(err, conf + lam * sims, kp, args.top_k)
            best.setdefault("blend", (a, f"lam={lam:g}"))
            if a > best["blend"][0]:
                best["blend"] = (a, f"lam={lam:g}")
        for lam in (2.0, 4.0, 6.0):
            for mu in (0.0, 0.25, 0.5, 1.0, 2.0):
                a = acc(err, conf + lam * sims + mu * count, kp, args.top_k)
                best.setdefault("+count", (a, f"lam={lam:g},mu={mu:g}"))
                if a > best["+count"][0]:
                    best["+count"] = (a, f"lam={lam:g},mu={mu:g}")
        for lam in (0.25, 0.5, 1.0, 2.0, 4.0):
            a = acc(err, conf + lam * zsims, kp, args.top_k)
            best.setdefault("zblend", (a, f"lam={lam:g}"))
            if a > best["zblend"][0]:
                best["zblend"] = (a, f"lam={lam:g}")
        rank_sim = np.broadcast_to(np.arange(kmax, dtype=np.float32),
                                   (Q, kmax))
        rank_conf = np.argsort(np.argsort(-conf, axis=1, kind="stable"),
                               axis=1).astype(np.float32)
        for c in (10.0, 30.0, 60.0):
            for w in (0.5, 1.0, 2.0):
                a = acc(err, 1.0 / (c + rank_conf) + w / (c + rank_sim),
                        kp, args.top_k)
                best.setdefault("rrf", (a, f"c={c:g},w={w:g}"))
                if a > best["rrf"][0]:
                    best["rrf"] = (a, f"c={c:g},w={w:g}")

        if "mass_h" in d:
            mass_h, dustbin_h = d["mass_h"], d["dustbin_h"]
            spread = d["spread"]
            for alpha in (0.25, 0.5, 1.0, 2.0):
                a = acc(err, conf + 4.0 * sims + alpha * mass_h, kp,
                        args.top_k)
                best.setdefault("+mass", (a, f"a={alpha:g}"))
                if a > best["+mass"][0]:
                    best["+mass"] = (a, f"a={alpha:g}")
            for beta in (0.25, 0.5, 1.0, 2.0):
                a = acc(err, conf + 4.0 * sims - beta * dustbin_h, kp,
                        args.top_k)
                best.setdefault("-dustbin", (a, f"b={beta:g}"))
                if a > best["-dustbin"][0]:
                    best["-dustbin"] = (a, f"b={beta:g}")
            for g in (0.5, 1.0, 2.0, 4.0):
                a = acc(err, conf + 4.0 * sims - g * spread, kp, args.top_k)
                best.setdefault("-spread", (a, f"g={g:g}"))
                if a > best["-spread"][0]:
                    best["-spread"] = (a, f"g={g:g}")

            # Split-half fitted fusion (honest: fit on one half of the
            # queries, evaluate on the other, average the two folds).
            feats = np.stack([conf, sims, count, mass_h, dustbin_h, spread],
                             axis=-1)                    # [Q, kmax, F]
            f2 = feats[:, :kp].reshape(-1, feats.shape[-1])
            mu, sd = f2.mean(0), f2.std(0) + 1e-6
            X = (feats[:, :kp] - mu) / sd                # [Q, kp, F]
            y = (err[:, :kp] <= 15.0).astype(np.float32)
            halves = [np.arange(Q) % 2 == 0, np.arange(Q) % 2 == 1]
            fold_accs = []
            for tr, te in (halves, halves[::-1]):
                Xt = X[tr].reshape(-1, X.shape[-1])
                yt = y[tr].reshape(-1)
                w = np.zeros(X.shape[-1])
                b = 0.0
                lr = 0.5
                for _ in range(300):
                    z = Xt @ w + b
                    p = 1.0 / (1.0 + np.exp(-z))
                    g_w = Xt.T @ (p - yt) / len(yt)
                    g_b = float(np.mean(p - yt))
                    w -= lr * g_w
                    b -= lr * g_b
                score_te = np.einsum("qkf,f->qk", X[te], w)
                fold_accs.append(acc(err[te], score_te, kp, args.top_k))
            best["logistic"] = (float(np.mean(fold_accs)),
                                "6-feat split-half")

        for name, (a, cfg) in sorted(best.items(), key=lambda kv: -kv[1][0]):
            print(f"  {name:8s} {a:0.4f}  ({cfg})")


if __name__ == "__main__":
    main()
