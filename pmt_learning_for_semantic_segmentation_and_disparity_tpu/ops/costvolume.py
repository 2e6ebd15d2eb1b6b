"""PSMNet concat cost volume + soft-argmin disparity regression.

The reference builds the volume with a python loop of in-place slice writes
on a zero tensor (stackhourglass.py:110-119): plane d holds (ref, target
shifted right by d), zero for x < d. Here it's a vectorized masked
shift-stack that XLA fuses into the first 3-D conv; a Pallas variant can
materialize tiles on the fly if the volume becomes memory-bound.

Layout is NDHWC: (B, D, H, W, 2C) — disparity is a spatial dim for the 3-D
convs, channels stay last for the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def concat_cost_volume(ref: jnp.ndarray, tgt: jnp.ndarray, maxdisp4: int) -> jnp.ndarray:
    """ref/tgt: (B, H, W, C) quarter-res features -> (B, D, H, W, 2C)."""
    b, h, w, c = ref.shape

    def plane(d):
        if d == 0:
            return jnp.concatenate([ref, tgt], axis=-1)
        mask_cols = jnp.arange(w) >= d
        m = mask_cols[None, None, :, None].astype(ref.dtype)
        shifted = jnp.pad(tgt[:, :, : w - d, :], ((0, 0), (0, 0), (d, 0), (0, 0)))
        return jnp.concatenate([ref * m, shifted * m], axis=-1)

    return jnp.stack([plane(d) for d in range(maxdisp4)], axis=1)


def soft_argmin(cost: jnp.ndarray, maxdisp: int) -> jnp.ndarray:
    """disparityregression (submodule.py:56-64): softmax over D then
    expectation sum(p*d). cost: (B, D, H, W) -> (B, H, W)."""
    p = jax.nn.softmax(cost, axis=1)
    d = jnp.arange(maxdisp, dtype=p.dtype)[None, :, None, None]
    return jnp.sum(p * d, axis=1)


def upsampled_soft_argmin(
    cost: jnp.ndarray, maxdisp: int, out_hw, *, chunk: int = 32
) -> jnp.ndarray:
    """Fused trilinear-upsample + softmax + soft-argmin.

    The reference materializes the FULL-resolution (maxdisp, H, W) volume
    before the softmax (stackhourglass.py:149-151) — 1.4 GB at 512x960/D192
    batch 8. This computes the identical result row-chunk by row-chunk so
    only (B, D, chunk, W) upsampled slices ever exist; under jit the chunks
    run as a ``lax.map`` with no host sync.

    cost: (B, D4, H4, W4) quarter-res logits -> (B, H, W) disparities.
    """
    b, d4, h4, w4 = cost.shape
    oh, ow = out_hw
    d = jnp.arange(maxdisp, dtype=jnp.float32)[None, :, None, None]

    # resize W and D once (cheap relative to full volume: no H blow-up yet)
    cost_dw = jax.image.resize(
        cost, (b, maxdisp, h4, ow), method="linear", antialias=False
    )

    assert oh % chunk == 0, (oh, chunk)
    n_chunks = oh // chunk
    scale = h4 / oh

    def one_chunk(ci):
        rows = ci * chunk + jnp.arange(chunk)
        src = (rows.astype(jnp.float32) + 0.5) * scale - 0.5
        lo = jnp.clip(jnp.floor(src), 0, h4 - 1).astype(jnp.int32)
        hi = jnp.clip(lo + 1, 0, h4 - 1)
        frac = jnp.clip(src - lo.astype(jnp.float32), 0.0, 1.0)
        top = cost_dw[:, :, lo, :]
        bot = cost_dw[:, :, hi, :]
        sl = top + (bot - top) * frac[None, None, :, None]
        p = jax.nn.softmax(sl, axis=1)
        return jnp.sum(p * d, axis=1)  # (B, chunk, W)

    chunks = jax.lax.map(one_chunk, jnp.arange(n_chunks))
    # (n_chunks, B, chunk, W) -> (B, H, W)
    return jnp.moveaxis(chunks, 0, 1).reshape(b, oh, ow)
