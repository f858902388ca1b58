"""Probe coarse checkpoints' retrieval recall on the bench protocol.

For each given coarse checkpoint: encode the 2048-cell bench DB and the
2048 bench queries, report recall@{10,24,32,64,96,128} where "recall" is
the fine-oracle bracket (pose within 15 m of a perfectly-localized
retrieved cell) — the quantity that ceilings both the plain protocol
(recall@10) and every re-ranking operating point (recall@K').

Run (TPU): python scripts/probe_coarse.py ckptA.msgpack ckptB.msgpack ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # noqa: E402


def main() -> None:
    paths = sys.argv[1:]
    assert paths, "usage: probe_coarse.py ckpt.msgpack [...]"
    bench._require_backend(float(os.environ.get("T2P_BENCH_INIT_TIMEOUT",
                                                600)))
    import jax
    import jax.numpy as jnp

    bench._enable_compile_cache()
    from text2pos_tpu.config import EvalConfig
    from text2pos_tpu.data.loaders import CoarseLoader
    from text2pos_tpu.evaluation.pipeline import (
        build_pipeline_from_checkpoints)
    from text2pos_tpu.ops.retrieval import topk_retrieval

    cells, poses = bench.make_bench_dataset()
    ecfg = EvalConfig(top_k=(1, 5, 10), threshs=(5, 10, 15), pad_size=16,
                      num_mentioned=6, pointnet_numpoints=256)
    ks = (10, 24, 32, 64, 96, 128)
    pose_w = np.array([p.pose_w[0:2] for p in poses])
    pose_scene = np.array([p.cell_id.split("_")[0] for p in poses])

    for path in paths:
        t0 = time.time()
        pipe, vocab, _ = build_pipeline_from_checkpoints(
            ecfg, path, bench.CKPT_FINE, dtype=bench.DTYPE)
        loader = CoarseLoader(cells, poses, vocab,
                              pipe.coarse.cfg.batch_size,
                              pipe.coarse.cfg.coarse_max_objects,
                              pipe.coarse.cfg.pointnet_numpoints,
                              pipe.coarse.cfg.max_text_len)
        bank = loader.bank
        cell_enc = pipe.coarse.encode_all_cells(pipe.coarse_state, bank,
                                                jax.random.PRNGKey(0))
        text_enc = pipe.coarse.encode_all_queries(pipe.coarse_state, loader)
        _, wide = topk_retrieval(jnp.asarray(text_enc),
                                 jnp.asarray(cell_enc), max(ks))
        wide = np.asarray(wide)
        cell_scene = np.array([cid.split("_")[0] for cid in bank.cell_ids])
        lo = bank.bbox_w[wide][..., 0:2]
        size = bank.cell_size[wide][..., None]
        perfect = np.clip((pose_w[:, None, :] - lo) / size, 0, 1)
        world = lo + perfect * size
        err = np.linalg.norm(world - pose_w[:, None, :], axis=-1)
        err = np.where(cell_scene[wide] == pose_scene[:, None], err, np.inf)
        rec = {k: float(np.mean(err[:, :k].min(axis=1) <= 15.0))
               for k in ks}
        import flax

        with open(path, "rb") as f:
            va = flax.serialization.msgpack_restore(f.read()).get(
                "extra", {}).get("val_acc")
        print(f"{path}  val_acc={va}  "
              + "  ".join(f"R@{k}={rec[k]:0.4f}" for k in ks)
              + f"  ({time.time()-t0:0.0f}s)", flush=True)


if __name__ == "__main__":
    main()
