#!/usr/bin/env python
"""Train/val/test manifest splitter.

Re-design of scripts/divideLeftRightTrainVal.py: shuffles paired L/R image +
seg manifests (seed 0/42), splits 80/15/5, derives disp manifests via the
seg->disp path rewrite.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def split_lists(items, seed=42, fractions=(0.80, 0.15, 0.05)):
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(items))
    n = len(items)
    a = int(fractions[0] * n)
    b = a + int(fractions[1] * n)
    return (
        [items[i] for i in idx[:a]],
        [items[i] for i in idx[a:b]],
        [items[i] for i in idx[b:]],
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("left_manifest")
    p.add_argument("right_manifest")
    p.add_argument("seg_manifest")
    p.add_argument("--out", default=".")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--disp-from-seg", default=("seg", "disp"), nargs=2,
                   help="substring rewrite seg->disp for disparity paths")
    args = p.parse_args()

    def rd(path):
        with open(path) as f:
            return [l.strip() for l in f if l.strip()]

    left, right, seg = rd(args.left_manifest), rd(args.right_manifest), rd(
        args.seg_manifest
    )
    assert len(left) == len(right) == len(seg)
    pairs = list(zip(left, right, seg))
    tr, va, te = split_lists(pairs, seed=args.seed)
    os.makedirs(args.out, exist_ok=True)
    for name, chunk in (("train", tr), ("val", va), ("test", te)):
        for i, kind in enumerate(("colorL", "colorR", "seg")):
            with open(os.path.join(args.out, f"{kind}_{name}.txt"), "w") as f:
                f.write("\n".join(p[i] for p in chunk) + "\n")
        with open(os.path.join(args.out, f"disp_{name}.txt"), "w") as f:
            f.write(
                "\n".join(
                    p[2].replace(args.disp_from_seg[0], args.disp_from_seg[1])
                    for p in chunk
                )
                + "\n"
            )
    print(f"train/val/test: {len(tr)}/{len(va)}/{len(te)} -> {args.out}")


if __name__ == "__main__":
    main()
