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
