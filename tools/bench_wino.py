"""On-chip microbench: dense s2d-domain 3x3 conv vs Winograd F(2x2,3x3).

Shapes are the flagship's s2d decoder-chain convs at 512x960 inference
(s2d tensors at half res, 256 channels after embedding) and the training
crop (256x512). Prints per-conv ms and the speedup.

Run on the TPU:  python tools/bench_wino.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from pmt_learning_for_semantic_segmentation_and_disparity_tpu.ops.winograd import (
    winograd_conv3x3,
)


def dense(x, k):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                        dimension_numbers=dn)


def timeit(fn, *args, iters=8):
    f = jax.jit(fn)
    o = f(*args)
    np.asarray(jax.tree_util.tree_leaves(o)[0][(0,) * 4])  # force
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    np.asarray(jax.tree_util.tree_leaves(o)[0][(0,) * 4])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    cases = [
        # (label, N, H2, W2, Cin, Cout) — s2d-domain tensors (half res, 4x ch)
        ("infer b16 512x960 s2d 256->256", 16, 256, 480, 256, 256),
        ("train b8 256x512 s2d 256->256", 8, 128, 256, 256, 256),
        ("infer b16 s2d 320->256 (concat in)", 16, 256, 480, 320, 256),
    ]
    for label, n, h, w, ci, co in cases:
        x = jnp.asarray(rng.standard_normal((n, h, w, ci)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.05,
                        jnp.bfloat16)
        td = timeit(dense, x, k)
        tw = timeit(winograd_conv3x3, x, k)
        # numeric delta at these shapes (bf16) — reduced ON DEVICE (a full
        # activation transfer is ~0.5 GB over the relay)
        @jax.jit
        def _rel(x, k):
            d = dense(x, k).astype(jnp.float32)
            wv = winograd_conv3x3(x, k).astype(jnp.float32)
            return (jnp.abs(wv - d).max()
                    / jnp.maximum(jnp.abs(d).max(), 1e-6))
        rel = float(_rel(x, k))
        print(f"{label}: dense {td:.2f} ms  wino {tw:.2f} ms  "
              f"speedup {td / tw:.2f}x  bf16 rel delta {rel:.3e}")


if __name__ == "__main__":
    main()
