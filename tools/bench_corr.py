"""Correlation kernel shoot-out on the real chip (round-3 VERDICT #3 /
SURVEY hard-part #6): unrolled-shift lax vs Pallas VMEM kernel vs the MXU
banded-matmul formulation, at the flagship shapes (a_py2/b_py2 = /8 of
512x960, 352 ch — models/sdnet.py corr site).

Prints ms per call for each implementation and dtype. Results recorded in
BENCH_NOTES.md; the dispatch in ops/correlation.py follows the winner.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pmt_learning_for_semantic_segmentation_and_disparity_tpu.ops.correlation import (
    correlation1d_pallas,
    correlation1d_matmul,
    correlation2d_pallas,
    correlation2d_matmul,
    correlation_lax,
)

ITERS = 20


def timeit(fn, *args):
    # axon relay: block_until_ready can return early (BENCH_NOTES round 1);
    # host-transfer one element of the LAST output to force the sequential
    # chain to really finish before reading the clock.
    for _ in range(3):
        np.asarray(fn(*args)[0, 0, 0, :1])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out[0, 0, 0, :1])
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    rng = np.random.default_rng(0)
    for dtype, tag in ((jnp.bfloat16, "bf16"), (jnp.float32, "fp32")):
        b, h, w, c = 16, 64, 120, 352
        f1 = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype)
        f2 = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype)

        lax1 = jax.jit(lambda a, b: correlation_lax(a, b, (1, 17)))
        pal1 = jax.jit(lambda a, b: correlation1d_pallas(a, b, 17))
        mm1 = jax.jit(lambda a, b: correlation1d_matmul(a, b, 17))
        t_lax = timeit(lax1, f1, f2)
        t_pal = timeit(pal1, f1, f2)
        t_mm = timeit(mm1, f1, f2)
        err = float(jnp.abs(
            mm1(f1, f2).astype(jnp.float32)
            - lax1(f1, f2).astype(jnp.float32)).max())
        print(f"1dcorr {tag} ({b},{h},{w},{c}) pw=17: "
              f"lax {t_lax:.3f} ms | pallas {t_pal:.3f} ms | "
              f"matmul {t_mm:.3f} ms (err {err:.2e}) | "
              f"speedup vs lax {t_lax / t_mm:.2f}x")

        b2 = 4
        f1s = f1[:b2]
        f2s = f2[:b2]
        lax2 = jax.jit(lambda a, b: correlation_lax(a, b, (17, 17), True))
        pal2 = jax.jit(
            lambda a, b: correlation2d_pallas(a, b, (17, 17), True))
        mm2 = jax.jit(
            lambda a, b: correlation2d_matmul(a, b, (17, 17), True))
        t_lax = timeit(lax2, f1s, f2s)
        t_pal = timeit(pal2, f1s, f2s)
        t_mm = timeit(mm2, f1s, f2s)
        err = float(jnp.abs(
            mm2(f1s, f2s).astype(jnp.float32)
            - lax2(f1s, f2s).astype(jnp.float32)).max())
        print(f"2dcorr {tag} ({b2},{h},{w},{c}) 17x17: "
              f"lax {t_lax:.3f} ms | pallas {t_pal:.3f} ms | "
              f"matmul {t_mm:.3f} ms (err {err:.2e}) | "
              f"speedup vs lax {t_lax / t_mm:.2f}x")


if __name__ == "__main__":
    main()
