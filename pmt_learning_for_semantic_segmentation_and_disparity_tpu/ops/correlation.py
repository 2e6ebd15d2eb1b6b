"""Stereo patch correlation (cost volume) — the TPU-native replacement for
the external CUDA ``spatial_correlation_sampler`` package the reference
depends on (README.md:7, models/dsnet_t2.py:1078-1087).

Semantics (SpatialCorrelationSampler(kernel_size=1, patch_size=(ph, pw),
stride=1, padding=0, dilation_patch=1)):

    out[b, i, j, y, x] = sum_c f1[b, c, y, x] * f2[b, c, y+i-ph//2, x+j-pw//2]

with zeros outside the image. The reference then reshapes to (B, ph*pw, H, W)
and, for the 2-D case only, divides by the channel count
(models/dsnet_t2.py:1189-1193).

We work in NHWC and emit the displacement axis as the trailing channel axis
(B, H, W, ph*pw) — exactly what the consuming 1x1 conv wants, no transpose.

Two implementations:

* ``correlation_lax``   — unrolled shift-multiply-reduce; XLA fuses it well
                          and it runs on any backend. Ground truth for tests.
* ``correlation1d_pallas`` — Pallas TPU kernel for the hot 1-D case: loads an
                          f1 tile and the W-padded f2 tile into VMEM once and
                          computes all ``pw`` shifts from on-chip memory,
                          avoiding ``pw`` HBM re-reads of f2.
* ``correlation2d_pallas`` — 17x17 patch variant; f2 stays in HBM and each
                          tile's halo slice is staged into VMEM with an
                          explicit async copy, then all 289 shifts read
                          on-chip memory.

``correlation`` dispatches (Pallas on TPU, lax elsewhere) and carries
analytic ``custom_vjp``s so the kernels are the forward path in training
too. Both validated bit-exact against the lax reference on v5e.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


# ---------------------------------------------------------------------------
# lax reference implementation
# ---------------------------------------------------------------------------


def correlation_lax(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    patch: Tuple[int, int],
    normalize: bool = False,
) -> jnp.ndarray:
    """Patch correlation, NHWC in / (B,H,W,ph*pw) out.

    normalize=True divides by the channel count (2-D path of the reference).
    """
    ph, pw = patch
    rh, rw = ph // 2, pw // 2
    b, h, w, c = f1.shape
    f2p = jnp.pad(f2, ((0, 0), (rh, rh), (rw, rw), (0, 0)))
    outs = []
    for i in range(ph):
        for j in range(pw):
            shifted = jax.lax.dynamic_slice(
                f2p, (0, i, j, 0), (b, h, w, c)
            )
            outs.append(jnp.sum(f1 * shifted, axis=-1))
    out = jnp.stack(outs, axis=-1)
    if normalize:
        out = out / jnp.asarray(c, out.dtype)
    return out


# ---------------------------------------------------------------------------
# MXU banded-matmul formulation (TPU-native: ride the systolic array)
# ---------------------------------------------------------------------------


def correlation1d_matmul(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    pw: int,
    tile: int = 128,
) -> jnp.ndarray:
    """1-D correlation as a banded matmul on the MXU.

    The shift-multiply-reduce formulation is VPU/HBM-bound (pw passes over
    f2). Instead, tile W into 128-column blocks and compute each block's
    full local Gram matrix against a (128+pw-1)-column window of f2 with
    ONE contraction over channels — a (128, C) x (C, 128+pw-1) matmul that
    the MXU executes at bf16 peak — then read the pw diagonals out of the
    (128, 128+pw-1) result. ~(128+pw-1)/pw more FLOPs than the VPU path,
    but the MXU:VPU throughput ratio on v5e is far larger, so wall time
    drops (measured in BENCH_NOTES; tools/bench_corr.py).

    Semantics identical to correlation_lax(f1, f2, (1, pw)): zero padding
    outside the image.
    """
    b, h, w, c = f1.shape
    rw = pw // 2
    wp = (-w) % tile
    nt = (w + wp) // tile
    win = tile + pw - 1
    f1p = jnp.pad(f1, ((0, 0), (0, 0), (0, wp), (0, 0)))
    f2p = jnp.pad(f2, ((0, 0), (0, 0), (rw, rw + wp), (0, 0)))
    f1t = f1p.reshape(b, h, nt, tile, c)
    # per-tile f2 windows (nt overlapping slices of width tile+pw-1)
    widx = (jnp.arange(nt) * tile)[:, None] + jnp.arange(win)[None, :]
    f2w = jnp.take(f2p, widx, axis=2)  # (b,h,nt,win,c)
    m = jnp.einsum(
        "bhntc,bhnsc->bhnts", f1t, f2w,
        preferred_element_type=jnp.float32,
    )  # (b,h,nt,tile,win) — the MXU contraction
    band = jnp.arange(tile)[:, None] + jnp.arange(pw)[None, :]  # (tile,pw)
    out = jnp.take_along_axis(
        m, jnp.broadcast_to(band, (b, h, nt, tile, pw)), axis=-1
    )
    out = out.reshape(b, h, w + wp, pw)[:, :, :w, :]
    return out.astype(f1.dtype)


def correlation2d_matmul(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    patch: Tuple[int, int],
    normalize: bool = False,
    tile: int = 128,
) -> jnp.ndarray:
    """2-D patch correlation as ph row-shifted banded matmuls (one
    correlation1d_matmul per vertical displacement)."""
    ph, pw = patch
    rh = ph // 2
    b, h, w, c = f1.shape
    f2p = jnp.pad(f2, ((0, 0), (rh, rh), (0, 0), (0, 0)))
    outs = []
    for i in range(ph):
        f2i = jax.lax.dynamic_slice(f2p, (0, i, 0, 0), (b, h, w, c))
        outs.append(correlation1d_matmul(f1, f2i, pw, tile=tile))
    out = jnp.concatenate(outs, axis=-1)  # (b,h,w,ph*pw), row-major shifts
    if normalize:
        out = out / jnp.asarray(c, out.dtype)
    return out


# ---------------------------------------------------------------------------
# Pallas TPU kernel — 1-D correlation
# ---------------------------------------------------------------------------


def _corr1d_kernel(f1_ref, f2p_ref, out_ref, *, pw: int, w: int):
    """Grid: (B, H_tiles). Blocks: f1 (1,TH,W,C), f2p (1,TH,W+pw-1,C),
    out (1,TH,W,pw). All shifts computed from VMEM."""
    f1 = f1_ref[0]  # (TH, W, C)
    acc_dtype = jnp.float32
    for d in range(pw):
        f2s = f2p_ref[0, :, d : d + w, :]  # static slice (TH, W, C)
        out_ref[0, :, :, d] = jnp.sum(
            (f1 * f2s).astype(acc_dtype), axis=-1
        ).astype(out_ref.dtype)


def correlation1d_pallas(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    pw: int,
    h_tile: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """1-D horizontal correlation via Pallas; NHWC in, (B,H,W,pw) out."""
    b, h, w, c = f1.shape
    rw = pw // 2
    f2p = jnp.pad(f2, ((0, 0), (0, 0), (rw, rw), (0, 0)))
    h_tile = min(h_tile, h)
    while h % h_tile != 0:
        h_tile -= 1
    grid = (b, h // h_tile)

    kernel = functools.partial(_corr1d_kernel, pw=pw, w=w)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        )
        mem = pltpu.VMEM
    else:
        mem = None

    def spec(shape, index_map):
        if mem is None:
            return pl.BlockSpec(shape, index_map)
        return pl.BlockSpec(shape, index_map, memory_space=mem)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, pw), f1.dtype),
        grid=grid,
        in_specs=[
            spec((1, h_tile, w, c), lambda i, j: (i, j, 0, 0)),
            spec((1, h_tile, w + 2 * rw, c), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=spec((1, h_tile, w, pw), lambda i, j: (i, j, 0, 0)),
        interpret=interpret,
        **kwargs,
    )(f1, f2p)


# ---------------------------------------------------------------------------
# Pallas TPU kernel — 2-D correlation (17x17 patch, sdnet/2dcorr models)
# ---------------------------------------------------------------------------


def _corr2d_kernel(f1_ref, f2p_hbm, out_ref, *, ph, pw, h_tile, w, c):
    """Grid (B, H_tiles). f1 block (1,TH,W,C) in VMEM; f2p stays whole in
    HBM (ANY space requires full-array blocks) and the batch + halo slice
    (TH+ph-1, W+pw-1, C) is DMA'd per tile."""
    b_idx = pl.program_id(0)
    j = pl.program_id(1)

    def body(scratch, sem):
        cp = pltpu.make_async_copy(
            f2p_hbm.at[pl.ds(b_idx, 1), pl.ds(j * h_tile, h_tile + ph - 1)],
            scratch, sem,
        )
        cp.start()
        cp.wait()
        f1 = f1_ref[0]  # (TH, W, C)
        for i in range(ph):
            for k in range(pw):
                f2s = scratch[0, i : i + h_tile, k : k + w, :]
                out_ref[0, :, :, i * pw + k] = jnp.sum(
                    (f1 * f2s).astype(jnp.float32), axis=-1
                ).astype(out_ref.dtype)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((1, h_tile + ph - 1, w + pw - 1, c), f1_ref.dtype),
        sem=pltpu.SemaphoreType.DMA,
    )


def correlation2d_pallas(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    patch: Tuple[int, int],
    normalize: bool = True,
    h_tile: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """2-D patch correlation; NHWC in, (B,H,W,ph*pw) out. The f2 halo tile
    is staged HBM->VMEM with an explicit async copy so all ph*pw shifts read
    on-chip memory."""
    b, h, w, c = f1.shape
    c_orig = c
    ph, pw = patch
    rh, rw = ph // 2, pw // 2
    # pad channels to the 128-lane tile (avoids Mosaic HBM-slice issues and
    # wasted lanes); zero channels contribute nothing to the dot products
    c_pad = (-c) % 128
    if c_pad:
        f1 = jnp.pad(f1, ((0, 0), (0, 0), (0, 0), (0, c_pad)))
        f2 = jnp.pad(f2, ((0, 0), (0, 0), (0, 0), (0, c_pad)))
        c = c + c_pad
    f2p = jnp.pad(f2, ((0, 0), (rh, rh), (rw, rw), (0, 0)))
    h_tile = min(h_tile, h)
    while h % h_tile != 0:
        h_tile -= 1
    grid = (b, h // h_tile)
    kernel = functools.partial(
        _corr2d_kernel, ph=ph, pw=pw, h_tile=h_tile, w=w, c=c
    )

    if _HAS_PLTPU and not interpret:
        mem_vmem = pltpu.VMEM
        mem_any = pltpu.ANY
        kwargs = {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100))}
    else:
        mem_vmem = mem_any = None
        kwargs = {}

    def spec(shape, index_map, mem):
        if mem is None:
            return pl.BlockSpec(shape, index_map)
        return pl.BlockSpec(shape, index_map, memory_space=mem)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, ph * pw), f1.dtype),
        grid=grid,
        in_specs=[
            spec((1, h_tile, w, c), lambda i, j: (i, j, 0, 0), mem_vmem),
            # whole padded f2 left in HBM/ANY (full-array block, trivial map)
            spec((b, h + ph - 1, w + pw - 1, c), lambda i, j: (0, 0, 0, 0),
                 mem_any),
        ],
        out_specs=spec((1, h_tile, w, ph * pw), lambda i, j: (i, j, 0, 0),
                       mem_vmem),
        interpret=interpret,
        **kwargs,
    )(f1, f2p)
    if normalize:
        out = out / jnp.asarray(c_orig, out.dtype)
    return out


# ---------------------------------------------------------------------------
# differentiable 1-D correlation: Pallas forward + lax backward
# ---------------------------------------------------------------------------


def _corr1d_bwd_lax(f1, f2, g, pw: int):
    """Analytic VJP of the 1-D correlation.

    out[b,y,x,d] = sum_c f1[b,y,x,c] * f2p[b,y,x+d,c]   (f2p = W-pad by rw)
    df1[b,y,x,c] = sum_d g[b,y,x,d] * f2p[b,y,x+d,c]
    df2[b,y,x',c] = sum_d (g[...,d]*f1)[b,y,x'-(d-rw),c]  (zero outside)
    """
    b, h, w, c = f1.shape
    rw = pw // 2
    f2p = jnp.pad(f2, ((0, 0), (0, 0), (rw, rw), (0, 0)))
    df1 = jnp.zeros_like(f1)
    df2 = jnp.zeros_like(f2)
    for d in range(pw):
        gd = g[..., d : d + 1]
        df1 = df1 + gd * jax.lax.dynamic_slice(f2p, (0, 0, d, 0), (b, h, w, c))
        s = gd * f1  # contribution lands at x + d - rw in f2 coords
        off = d - rw
        # pad+add, NOT .at[slice].add: the latter lowers to scatter-add on
        # TPU (~3.2 ms/step in the flagship train profile, BENCH_NOTES
        # round 3) while a zero-pad fuses into the surrounding loop fusion.
        if off >= 0:
            df2 = df2 + jnp.pad(
                s[:, :, : w - off, :], ((0, 0), (0, 0), (off, 0), (0, 0)))
        else:
            df2 = df2 + jnp.pad(
                s[:, :, -off:, :], ((0, 0), (0, 0), (0, -off), (0, 0)))
    return df1, df2


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _corr1d(f1, f2, pw: int):
    if _HAS_PLTPU and jax.default_backend() == "tpu":
        return correlation1d_pallas(f1, f2, pw)
    return correlation_lax(f1, f2, (1, pw))


def _corr1d_fwd(f1, f2, pw: int):
    return _corr1d(f1, f2, pw), (f1, f2)


def _corr1d_vjp(pw, res, g):
    f1, f2 = res
    return _corr1d_bwd_lax(f1, f2, g, pw)


_corr1d.defvjp(_corr1d_fwd, _corr1d_vjp)


def _corr2d_bwd_lax(f1, f2, g, patch):
    """Analytic VJP of the 2-D correlation (same derivation as 1-D, both
    axes)."""
    ph, pw = patch
    b, h, w, c = f1.shape
    rh, rw = ph // 2, pw // 2
    f2p = jnp.pad(f2, ((0, 0), (rh, rh), (rw, rw), (0, 0)))
    df1 = jnp.zeros_like(f1)
    df2 = jnp.zeros_like(f2)
    for i in range(ph):
        for j in range(pw):
            gd = g[..., i * pw + j : i * pw + j + 1]
            df1 = df1 + gd * jax.lax.dynamic_slice(
                f2p, (0, i, j, 0), (b, h, w, c)
            )
            s = gd * f1  # lands at (y+i-rh, x+j-rw) in f2 coords
            oy, ox = i - rh, j - rw
            ys_src = slice(max(0, -oy), h + min(0, -oy))
            xs_src = slice(max(0, -ox), w + min(0, -ox))
            # pad+add instead of scatter-add (same rationale as the 1-D bwd)
            df2 = df2 + jnp.pad(
                s[:, ys_src, xs_src, :],
                ((0, 0), (max(0, oy), max(0, -oy)),
                 (max(0, ox), max(0, -ox)), (0, 0)))
    return df1, df2


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _corr2d(f1, f2, patch: Tuple[int, int]):
    if _HAS_PLTPU and jax.default_backend() == "tpu":
        return correlation2d_pallas(f1, f2, patch, normalize=False)
    return correlation_lax(f1, f2, patch)


def _corr2d_fwd(f1, f2, patch):
    return _corr2d(f1, f2, patch), (f1, f2)


def _corr2d_vjp(patch, res, g):
    f1, f2 = res
    return _corr2d_bwd_lax(f1, f2, g, patch)


_corr2d.defvjp(_corr2d_fwd, _corr2d_vjp)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def correlation(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    patch: Tuple[int, int],
    normalize: bool = False,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Dispatch: Pallas (with analytic custom_vjp) on TPU, lax otherwise."""
    ph, pw = patch
    if use_pallas and ph == 1:
        out = _corr1d(f1, f2, pw)
        if normalize:
            # channel normalization is a scalar scale — keep the Pallas
            # kernel + analytic vjp (dsnetv2 normalizes its 1-D corr too,
            # dsnet_t2.py:516-518)
            out = out / jnp.asarray(f1.shape[-1], out.dtype)
        return out
    if use_pallas and ph > 1:
        out = _corr2d(f1, f2, patch)
        if normalize:
            out = out / jnp.asarray(f1.shape[-1], out.dtype)
        return out
    return correlation_lax(f1, f2, patch, normalize=normalize)
