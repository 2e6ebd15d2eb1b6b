"""Space-to-depth (block 2) execution domain for small-channel full-res convs.

The reference's decoder heads run long chains of stride-1 convs at FULL
resolution with 32-64 channels (models/dsnet_t2.py:1199-1222 disparity head,
:1259-1284 seg heads). On TPU those channel counts waste the MXU: both the
lane (C_out) and contraction (C_in) dimensions pad to the 128-wide tile, so
a 5x5 64-ch conv at 512x960 measures ~14% of peak (tools/probe_s2d.py).

Rewriting the SAME function in the space-to-depth domain fixes this exactly:

    conv_k(x)  ==  d2s( conv3x3_embedded(s2d(x)) )

where s2d packs each 2x2 spatial block into 4x the channels (phase-major
order: channel index = phase*C + c) and the k x k kernel (k odd, <= 5,
stride 1, dilation 1) embeds into a 3x3 kernel over 4C -> 4C' channels with
structural zeros. FLOPs grow by (9*16/4)/k^2 (1.44x for k=5, 4x for k=3)
but the MXU tiles are full; measured wall time per conv drops ~1.7x for the
5x5/64ch case and the whole chain stays in the s2d domain so the transforms
themselves amortize to (near) zero:

* nearest-upsampled-by-2f inputs never materialize at full res:
  s2d(upsample_nearest(x, 2f)) == tile_phases(upsample_nearest(x, f)).
* the chain's 1-channel image skips and 1-to-few-channel outputs are the
  only tensors that cross the boundary.

Everything here is exact (fp roundoff only) — no approximation — so the
torch parity suite covers the s2d path whenever it is enabled.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

BLOCK = 2
PHASES = BLOCK * BLOCK


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC -> (N, H/2, W/2, 4C), phase-major channel order (ph, pw, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H2, W2, 4C) -> (N, 2*H2, 2*W2, C), inverse of space_to_depth."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * 2, w * 2, c)


def s2d_concat(tensors: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Channel-concat of s2d tensors (phase-major blocks must interleave)."""
    parts = []
    for t in tensors:
        n, h, w, c4 = t.shape
        parts.append(t.reshape(n, h, w, PHASES, c4 // PHASES))
    out = jnp.concatenate(parts, axis=-1)
    n, h, w, _, c = out.shape
    return out.reshape(n, h, w, PHASES * c)


def tile_phases(x: jnp.ndarray) -> jnp.ndarray:
    """s2d representation of a 2x-nearest-upsampled map: all four phases
    equal x. (phase-major: plain channel tile)."""
    return jnp.tile(x, (1, 1, 1, PHASES))


@functools.lru_cache(maxsize=None)
def _selector(k: int) -> np.ndarray:
    """0/1 selector S[ti, tj, pi, po, di, dj]: s2d tap (ti,tj) from input
    phase (piH,piW) contributes original tap (di,dj) to output phase
    (poH,poW) iff di == 2*ti + piH - poH (and same for W), |di| <= k//2.

    Phases are flattened row-major (pH*2 + pW); taps are 0..2 == -1..1."""
    r = k // 2
    s = np.zeros((3, 3, PHASES, PHASES, k, k), np.float32)
    for ti in range(3):
        for tj in range(3):
            for ph in range(2):
                for pw in range(2):
                    for oh in range(2):
                        for ow in range(2):
                            di = 2 * (ti - 1) + ph - oh
                            dj = 2 * (tj - 1) + pw - ow
                            if abs(di) <= r and abs(dj) <= r:
                                s[ti, tj, ph * 2 + pw, oh * 2 + ow,
                                  di + r, dj + r] = 1.0
    return s


def embed_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(k,k,Cin,Cout) stride-1 SAME conv kernel -> its exact s2d-domain
    (3,3,4Cin,4Cout) equivalent. Linear in w (differentiable; the embedding
    is a constant 0/1 einsum)."""
    k = w.shape[0]
    assert w.shape[1] == k and k % 2 == 1 and k <= 5, (
        f"s2d embedding needs odd k<=5, got {w.shape}")
    sel = jnp.asarray(_selector(k), w.dtype)
    # out[ti,tj,pi,ci,po,co] = sum_{di,dj} sel * w
    out = jnp.einsum("abiodr,drcf->abicof", sel, w)
    cin, cout = w.shape[2], w.shape[3]
    return out.reshape(3, 3, PHASES * cin, PHASES * cout)


def to_s2d_nearest(x: jnp.ndarray, target_hw: Tuple[int, int]) -> jnp.ndarray:
    """s2d representation of ``resize_nearest(x, target_hw)`` (target dims
    even). Even integer upsample factors never materialize the full-res
    tensor: torch-nearest by 2f == nearest by f then 2x pixel repeat, and
    the repeat is exactly ``tile_phases``."""
    from .resize import resize_nearest

    th, tw = int(target_hw[0]), int(target_hw[1])
    h, w = x.shape[1], x.shape[2]
    if (th, tw) == (h, w):
        return space_to_depth(x)
    if (th % h == 0 and tw % w == 0
            and (th // h) % 2 == 0 and (tw // w) % 2 == 0):
        return tile_phases(resize_nearest(x, (th // 2, tw // 2)))
    return space_to_depth(resize_nearest(x, (th, tw)))


def tile_channel_param(p: jnp.ndarray) -> jnp.ndarray:
    """Per-channel vector (C,) -> its s2d equivalent (4C,), phase-major."""
    return jnp.tile(p, (PHASES,))
