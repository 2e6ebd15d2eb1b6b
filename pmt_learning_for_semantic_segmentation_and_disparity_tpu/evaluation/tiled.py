"""Tiled / sliding-window whole-image inference.

Re-design of the reference's two alternative paths:
* divideNetOutput — 4x overlapping 256x512 sub-crops, weight sub_crop^2,
  accumulated (torch_implementation.py:69-115);
* slideWindowInfer — 512x512 windows, stride 256, softmax accumulation
  (torch_implementation.py:187-232).

TPU-native twist: windows are gathered into one batched tensor and run in a
SINGLE batched forward (the reference loops windows through the model one
by one), so the MXU sees one large batch. This is also the honest spatial-
parallel path — with a mesh, the window batch shards over 'data'.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def _window_starts(total: int, win: int, stride: int):
    starts = list(range(0, max(total - win, 0) + 1, stride))
    if not starts:
        starts = [0]
    if starts[-1] + win < total:
        starts.append(total - win)
    return starts


def tiled_inference(
    apply_fn: Callable[[jnp.ndarray, jnp.ndarray], Dict[str, jnp.ndarray]],
    left: jnp.ndarray,
    right: jnp.ndarray,
    window: Tuple[int, int] = (256, 512),
    stride: Tuple[int, int] = (128, 256),
    softmax_seg: bool = False,
) -> Dict[str, jnp.ndarray]:
    """apply_fn maps (left, right) -> output dict with seg1/disp1/seg2.

    window/stride (256,512)/(128,256) reproduces divideNetOutput's
    sub_crop=0.5 overlap; (512,512)/(256,256) + softmax_seg=True reproduces
    slideWindowInfer.
    """
    b, h, w, _ = left.shape
    wh, ww = window
    sh, sw = stride
    ys = _window_starts(h, wh, sh)
    xs = _window_starts(w, ww, sw)

    # gather all windows into one batch: (B*nw, wh, ww, C)
    tiles_l = []
    tiles_r = []
    for y in ys:
        for x in xs:
            tiles_l.append(left[:, y : y + wh, x : x + ww])
            tiles_r.append(right[:, y : y + wh, x : x + ww])
    big_l = jnp.concatenate(tiles_l, axis=0)
    big_r = jnp.concatenate(tiles_r, axis=0)
    out = apply_fn(big_l, big_r)

    weight = 0.25 if not softmax_seg else 1.0
    results: Dict[str, jnp.ndarray] = {}
    counts = jnp.zeros((1, h, w, 1))
    for key in ("seg1", "seg2", "disp1"):
        if out.get(key) is None:
            continue
        c = out[key].shape[-1]
        acc = jnp.zeros((b, h, w, c), out[key].dtype)
        idx = 0
        for y in ys:
            for x in xs:
                tile = out[key][idx * b : (idx + 1) * b]
                if softmax_seg and key.startswith("seg"):
                    tile = jax.nn.softmax(tile, axis=-1)
                acc = acc.at[:, y : y + wh, x : x + ww].add(weight * tile)
                idx += 1
        results[key] = acc
    for y in ys:
        for x in xs:
            counts = counts.at[:, y : y + wh, x : x + ww].add(1.0)
    results["window_counts"] = counts
    return results
