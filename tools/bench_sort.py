"""Micro-bench the Lovász sort variants at flagship shape (C=2, N=1M).

The round-3 train-step profile put the batched kv-sort at ~15 ms/step
(9% of device time). Variants measured (all exact for the loss value —
for tied keys the Lovász dot telescopes, so tie ORDER never changes the
result; payload 0/1 is exact in bf16):

  stable_f32   — current: stable, keys f32, payload f32
  unstable_f32 — is_stable=False
  stable_bf16p — stable, payload bf16
  unstable_bf16p
  unstable_u32 — keys bitcast to monotone uint32, payload bf16

Run on TPU: python tools/bench_sort.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

C, N = 2, 8 * 256 * 512


def timeit(fn, *args, n=20, warmup=3):
    # Over the axon relay block_until_ready can return early (BENCH_NOTES
    # round 1 caveat); a host transfer of one element of the LAST result
    # forces the whole sequential chain to really finish.
    for _ in range(warmup):
        np.asarray(fn(*args)[0][0, :1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out[0][0, :1])
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    errors = jnp.asarray(rng.random((C, N), dtype=np.float32))
    fg = jnp.asarray((rng.random((C, N)) < 0.3).astype(np.float32))

    @jax.jit
    def stable_f32(e, f):
        return jax.lax.sort((-e, f), dimension=1, is_stable=True, num_keys=1)

    @jax.jit
    def unstable_f32(e, f):
        return jax.lax.sort((-e, f), dimension=1, is_stable=False, num_keys=1)

    @jax.jit
    def stable_bf16p(e, f):
        s, fb = jax.lax.sort((-e, f.astype(jnp.bfloat16)), dimension=1,
                             is_stable=True, num_keys=1)
        return s, fb.astype(jnp.float32)

    @jax.jit
    def unstable_bf16p(e, f):
        s, fb = jax.lax.sort((-e, f.astype(jnp.bfloat16)), dimension=1,
                             is_stable=False, num_keys=1)
        return s, fb.astype(jnp.float32)

    @jax.jit
    def unstable_u32(e, f):
        bits = jax.lax.bitcast_convert_type(-e, jnp.uint32)
        sign = jnp.uint32(0x80000000)
        key = jnp.where(bits & sign != 0, ~bits, bits | sign)
        k, fb = jax.lax.sort((key, f.astype(jnp.bfloat16)), dimension=1,
                             is_stable=False, num_keys=1)
        back = jnp.where(k & sign != 0, k ^ sign, ~k)
        return (jax.lax.bitcast_convert_type(back, jnp.float32),
                fb.astype(jnp.float32))

    ref_s, ref_f = jax.block_until_ready(stable_f32(errors, fg))
    for name, fn in [("stable_f32", stable_f32), ("unstable_f32", unstable_f32),
                     ("stable_bf16p", stable_bf16p),
                     ("unstable_bf16p", unstable_bf16p),
                     ("unstable_u32", unstable_u32)]:
        t = timeit(fn, errors, fg)
        s, f = fn(errors, fg)
        keys_ok = bool(jnp.all(s == ref_s))
        # the loss only sees sum(err*grad(cumsum fg)) — compare via that
        pay_ok = bool(jnp.allclose(jnp.cumsum(f, axis=1)[:, -1],
                                   jnp.cumsum(ref_f, axis=1)[:, -1]))
        print(f"{name:15s} {t * 1e3:7.3f} ms  keys_sorted_eq={keys_ok} "
              f"fg_total_eq={pay_ok}")


if __name__ == "__main__":
    main()
