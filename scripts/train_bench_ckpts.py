"""Train the benchmark checkpoints on a multi-scene synthetic corpus.

Produces ``checkpoints/bench_coarse.msgpack`` and
``checkpoints/bench_fine.msgpack`` at the reference budgets (coarse:
batch 64 / embed 256 / lr 1e-3; fine: batch 32 / embed 128 / 6 layer
pairs / 50 Sinkhorn iterations — /root/reference/README.md:61-62) so that
``bench.py`` measures throughput AND accuracy with *trained* weights.

Corpus: 5 train scenes + 1 val scene (256-cell grid each, disjoint seeds
from the benchmark scenes). The benchmark's own 8 scenes (seeds 0-7,
scene names 99xx) are never seen in training — bench accuracy is
held-out-scene generalization, mirroring the reference protocol of
training on 5 KITTI360 scenes and evaluating on unseen ones
(/root/reference/datapreparation/kitti360pose/utils.py:17-31).

Usage: python scripts/train_bench_ckpts.py [--epochs N] [--probe]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRAIN_SEEDS = list(range(100, 110))
VAL_SEED = 77


def _generator_version() -> str:
    """Content hash of the synthetic-corpus generators: a change to the
    generation code must invalidate cached corpora (a stale cache would
    silently mask data/synthetic.py changes)."""
    import hashlib

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "text2pos_tpu", "data")
    h = hashlib.sha256()
    for name in ("synthetic.py", "descriptions.py", "select.py"):
        with open(os.path.join(root, name), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:12]


def build_corpus(poses_per_cell: int, seeds, tag: str):
    """Synthetic multi-scene corpus, cached on disk — the 48-scene build
    takes ~3 min of host time and the outage-resilient wrapper restarts
    this script after every relay drop, so rebuilding per attempt would
    dominate the retry loop.

    The cache lives under the (user-owned) checkpoints dir, NOT /tmp:
    pickle.load executes arbitrary code, and a predictable world-writable
    /tmp path could be planted by another local user. The key includes a
    content hash of the generator modules so corpus-generation changes
    can never be masked by a stale cache."""
    import pickle

    cache_dir = os.environ.get("T2P_CORPUS_CACHE_DIR", "checkpoints")
    os.makedirs(cache_dir, exist_ok=True)
    cache = os.path.join(
        cache_dir,
        f"t2p_corpus_{tag}_{seeds[0]}-{seeds[-1]}_ppc{poses_per_cell}"
        f"_{_generator_version()}.pkl")
    if os.path.isfile(cache):
        try:
            with open(cache, "rb") as f:
                cells, poses = pickle.load(f)
            print(f"corpus cache hit: {cache}", flush=True)
            return cells, poses
        except Exception:
            pass

    from text2pos_tpu.data.synthetic import make_synthetic_dataset

    cells, poses = [], []
    for s in seeds:
        c, p = make_synthetic_dataset(
            seed=s, scene_name=f"{tag}{s:03d}", extent=30.0 * 16,
            cell_size=30.0, poses_per_cell=poses_per_cell,
            objects_per_cell_area=12)
        cells += c
        poses += p
    try:
        with open(cache + ".tmp", "wb") as f:
            pickle.dump((cells, poses), f)
        os.replace(cache + ".tmp", cache)
    except Exception:
        pass
    return cells, poses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--fine_epochs", type=int, default=0,
                    help="defaults to --epochs")
    ap.add_argument("--coarse_lr", type=float, default=1e-3)
    ap.add_argument("--fine_lr", type=float, default=3e-4)
    ap.add_argument("--out_dir", default="checkpoints")
    ap.add_argument("--skip_pointnet", action="store_true")
    ap.add_argument("--skip_coarse", action="store_true")
    ap.add_argument("--skip_fine", action="store_true")
    ap.add_argument("--pointnet_epochs", type=int, default=12)
    ap.add_argument("--pointnet_freeze", action="store_true")
    ap.add_argument("--coarse_gamma", type=float, default=0.9)
    ap.add_argument("--train_scenes", type=int, default=10)
    ap.add_argument("--poses_per_cell", type=int, default=3)
    ap.add_argument("--neg_bank", action="store_true",
                    help="global-negative memory bank for the coarse stage")
    ap.add_argument("--neg_bank_weight", type=float, default=1.0)
    ap.add_argument("--neg_bank_hardest", type=int, default=8)
    ap.add_argument("--neg_bank_warmup", type=int, default=2)
    ap.add_argument("--neg_bank_refresh", type=int, default=1,
                    help="bank re-embeds per epoch (mining staleness)")
    ap.add_argument("--eval_every", type=int, default=1)
    ap.add_argument("--rank_weight", type=float, default=0.0,
                    help="rank-aware fine loss weight (listwise softmax "
                         "over in-batch negative cells; 0 = off)")
    ap.add_argument("--rank_negatives", type=int, default=4)
    ap.add_argument("--rank_tau", type=float, default=1.0)
    ap.add_argument("--rank_gamma", type=float, default=0.0,
                    help="soft vote-spread penalty inside the rank score")
    ap.add_argument("--resume", action="store_true",
                    help="outage-resilient mode: stages whose bench_*.msgpack "
                         "already exists in --out_dir are skipped, and "
                         "in-flight stages keep a rolling resume checkpoint "
                         "so a killed run continues where it stopped")
    ap.add_argument("--coarse_continue", default="",
                    help="msgpack checkpoint to fine-tune the coarse stage "
                         "from (e.g. checkpoints/bench_coarse.msgpack); "
                         "use with a reduced --coarse_lr")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/t2p_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from text2pos_tpu.config import TrainConfig

    t0 = time.time()
    cells_train, poses_train = build_corpus(
        args.poses_per_cell, list(range(100, 100 + args.train_scenes)), "7")
    cells_val, poses_val = build_corpus(1, [VAL_SEED], "7")
    print(f"corpus: {len(cells_train)} train cells / {len(poses_train)} poses, "
          f"{len(cells_val)} val cells / {len(poses_val)} poses "
          f"({time.time()-t0:.0f}s)", flush=True)

    os.makedirs(args.out_dir, exist_ok=True)
    fine_epochs = args.fine_epochs or args.epochs

    # Stage 0: PointNet++ pretraining on object classification — both
    # stages seed their ObjectEncoder from it, exactly like the reference
    # flow (training/pointcloud/pointnet2.py → object_encoder.py:43-46).
    pn_path = os.path.join(args.out_dir, "bench_pointnet.msgpack")
    if args.resume and os.path.isfile(pn_path):
        args.skip_pointnet = True
    if not args.skip_pointnet:
        from text2pos_tpu.train import pointnet2

        pcfg = TrainConfig(batch_size=64, learning_rate=1e-3, lr_gamma=0.95,
                           epochs=args.pointnet_epochs,
                           pointnet_numpoints=256)
        t0 = time.time()
        state, res = pointnet2.train(pcfg, cells_train, cells_val,
                                     checkpoint_dir=args.out_dir)
        print(f"pointnet pretraining done in {time.time()-t0:.0f}s, "
              f"best={res['best_path']}", flush=True)
        shutil.copy(res["best_path"], pn_path)
    pn_kwargs = {}
    if os.path.isfile(pn_path):
        pn_kwargs = dict(pointnet_path=pn_path,
                         pointnet_freeze=args.pointnet_freeze)

    coarse_out = os.path.join(args.out_dir, "bench_coarse.msgpack")
    if args.resume and os.path.isfile(coarse_out):
        print(f"resume: {coarse_out} exists, skipping coarse", flush=True)
        args.skip_coarse = True
    if not args.skip_coarse:
        from text2pos_tpu.train import coarse

        ccfg = TrainConfig(
            resume_path=(os.path.join(args.out_dir, "coarse_resume.msgpack")
                         if args.resume else ""),
            batch_size=64, embed_dim=256, learning_rate=args.coarse_lr,
            lr_gamma=args.coarse_gamma, epochs=args.epochs, fused=True,
            coarse_max_objects=24, pointnet_numpoints=256,
            pad_size=16, num_mentioned=6, neg_bank=args.neg_bank,
            neg_bank_weight=args.neg_bank_weight,
            neg_bank_hardest=args.neg_bank_hardest,
            neg_bank_warmup=args.neg_bank_warmup,
            neg_bank_refresh=args.neg_bank_refresh,
            eval_every=args.eval_every,
            continue_path=args.coarse_continue, **pn_kwargs)
        t0 = time.time()
        state, res = coarse.train(ccfg, cells_train, poses_train,
                                  cells_val, poses_val,
                                  checkpoint_dir=args.out_dir)
        print(f"coarse training done in {time.time()-t0:.0f}s, "
              f"best={res['best_path']}", flush=True)
        shutil.copy(res["best_path"], coarse_out)

    fine_out = os.path.join(args.out_dir, "bench_fine.msgpack")
    if args.resume and os.path.isfile(fine_out):
        print(f"resume: {fine_out} exists, skipping fine", flush=True)
        args.skip_fine = True
    if not args.skip_fine:
        from text2pos_tpu.train import fine

        fcfg = TrainConfig(
            resume_path=(os.path.join(args.out_dir, "fine_resume.msgpack")
                         if args.resume else ""),
            batch_size=32, embed_dim=128, learning_rate=args.fine_lr,
            epochs=fine_epochs, fused=True, num_layers=6, sinkhorn_iters=50,
            coarse_max_objects=24, pointnet_numpoints=256,
            pad_size=16, num_mentioned=6, rank_weight=args.rank_weight,
            rank_negatives=args.rank_negatives, rank_tau=args.rank_tau,
            rank_gamma=args.rank_gamma, **pn_kwargs)
        t0 = time.time()
        state, res = fine.train(fcfg, cells_train, poses_train,
                                cells_val, poses_val,
                                checkpoint_dir=args.out_dir)
        print(f"fine training done in {time.time()-t0:.0f}s, "
              f"best={res['best_path']}", flush=True)
        shutil.copy(res["best_path"], fine_out)


if __name__ == "__main__":
    main()
