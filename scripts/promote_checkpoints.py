"""Promote freshly-trained bench checkpoints if they beat the incumbents.

Compares the ``extra["val_acc"]`` metadata stored by the trainers'
best-checkpoint saves (train/coarse.py, train/fine.py) and copies a
candidate over the incumbent only on a strict improvement — so a partial
or degraded training run can never regress the benchmark weights.

Usage:
    python scripts/promote_checkpoints.py --candidate_dir checkpoints_r4 \
        [--incumbent_dir checkpoints] [--stages coarse fine] [--dry_run]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def checkpoint_val_acc(path: str) -> float:
    import flax

    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    return float(payload.get("extra", {}).get("val_acc", float("-inf")))


def promote(candidate_dir: str, incumbent_dir: str, stage: str,
            dry_run: bool = False) -> bool:
    cand = os.path.join(candidate_dir, f"bench_{stage}.msgpack")
    inc = os.path.join(incumbent_dir, f"bench_{stage}.msgpack")
    if not os.path.isfile(cand):
        print(f"{stage}: no candidate at {cand}")
        return False
    cand_acc = checkpoint_val_acc(cand)
    inc_acc = checkpoint_val_acc(inc) if os.path.isfile(inc) else float("-inf")
    better = cand_acc > inc_acc
    verdict = "PROMOTE" if better else "keep incumbent"
    print(f"{stage}: candidate val_acc={cand_acc:0.4f} vs "
          f"incumbent val_acc={inc_acc:0.4f} -> {verdict}")
    if better and not dry_run:
        if os.path.isfile(inc):
            shutil.copy(inc, inc + ".prev")
        shutil.copy(cand, inc)
    return better


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--candidate_dir", required=True)
    ap.add_argument("--incumbent_dir", default="checkpoints")
    ap.add_argument("--stages", nargs="+", default=["coarse", "fine"])
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args()
    promoted = [s for s in args.stages
                if promote(args.candidate_dir, args.incumbent_dir, s,
                           args.dry_run)]
    print(f"promoted: {promoted or 'nothing'}")


if __name__ == "__main__":
    main()
