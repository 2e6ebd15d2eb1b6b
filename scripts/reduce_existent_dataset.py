#!/usr/bin/env python
"""Tiny-manifest generator for smoke tests.

Re-design of scripts/reduceExistentDataset.py: truncates the 10 manifests to
100/50/2 train/val/test entries into reduced_size/*__small.txt, "to realize
tests with less computation requirements" (README.md:37).
"""
from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("manifests", nargs="+")
    p.add_argument("--out", default="reduced_size")
    p.add_argument("--n-train", type=int, default=100)
    p.add_argument("--n-val", type=int, default=50)
    p.add_argument("--n-test", type=int, default=2)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for m in args.manifests:
        with open(m) as f:
            lines = [l.strip() for l in f if l.strip()]
        if "test" in os.path.basename(m):
            n = args.n_test
        elif "val" in os.path.basename(m):
            n = args.n_val
        else:
            n = args.n_train
        base = os.path.basename(m).rsplit(".", 1)[0]
        out = os.path.join(args.out, f"{base}__small.txt")
        with open(out, "w") as f:
            f.write("\n".join(lines[:n]) + "\n")
        print(out, len(lines[:n]))


if __name__ == "__main__":
    main()
