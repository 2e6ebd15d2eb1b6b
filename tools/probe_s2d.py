"""Microbenchmark: small-channel full-res conv vs its space-to-depth rewrite.

Hypothesis (BENCH_NOTES round-1 profile): 64-ch 5x5 convs at 512x960 run at
~25% MXU utilization because both the lane (C_out=64) and contraction
(C_in=64) dims pad to 128. Space-to-depth by 2 turns the same function into
a 3x3 conv at 256 channels (1.44x FLOPs, full tiles) — predicted ~2-4x
faster wall time.

Run on the real chip: python tools/probe_s2d.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C = 16, 512, 960, 64
K = 5  # original kernel


def s2d(x):
    """NHWC space-to-depth, block 2. Channel order: (ph, pw, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def d2s(x):
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * 2, w * 2, c)


def embed_kernel(w):
    """(K,K,Cin,Cout) -> (3,3,4Cin,4Cout) computing the same conv in the
    s2d(2) domain. Output phase (po,qo), input phase (pi,qi), s2d tap
    (ti,tj) in {-1,0,1} maps to original tap (di,dj) = (2ti+pi-po, 2tj+qj'-qo)
    when |di|,|dj| <= K//2."""
    kh, kw, cin, cout = w.shape
    r = kh // 2
    out = np.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for po in range(2):
        for qo in range(2):
            for pi in range(2):
                for qi in range(2):
                    for ti in (-1, 0, 1):
                        for tj in (-1, 0, 1):
                            di = 2 * ti + pi - po
                            dj = 2 * tj + qi - qo
                            if abs(di) <= r and abs(dj) <= r:
                                out[ti + 1, tj + 1,
                                    (pi * 2 + qi) * cin:(pi * 2 + qi + 1) * cin,
                                    (po * 2 + qo) * cout:(po * 2 + qo + 1) * cout] = \
                                    w[di + r, dj + r]
    return jnp.asarray(out)


def timeit(fn, *args, iters=20):
    o = fn(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    w = jax.random.normal(key, (K, K, C, C), jnp.bfloat16) * 0.05

    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def plain(x, w):
        return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                            dimension_numbers=dn)

    ws = embed_kernel(np.asarray(w, np.float32).astype(np.float32)).astype(jnp.bfloat16)
    xs = s2d(x)
    dn2 = jax.lax.conv_dimension_numbers(xs.shape, ws.shape,
                                         ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def s2d_conv(xs, ws):
        return jax.lax.conv_general_dilated(xs, ws, (1, 1), "SAME",
                                            dimension_numbers=dn2)

    @jax.jit
    def s2d_full(x, ws):
        return d2s(s2d_conv.__wrapped__(s2d(x), ws))

    # correctness (fp32 check on small shapes)
    xsm = jax.random.normal(key, (1, 32, 48, C), jnp.float32)
    wf = jax.random.normal(key, (K, K, C, C), jnp.float32) * 0.05
    ref = jax.lax.conv_general_dilated(
        xsm, wf, (1, 1), "SAME",
        dimension_numbers=jax.lax.conv_dimension_numbers(
            xsm.shape, wf.shape, ("NHWC", "HWIO", "NHWC")))
    got = d2s(jax.lax.conv_general_dilated(
        s2d(xsm), embed_kernel(np.asarray(wf)), (1, 1), "SAME",
        dimension_numbers=jax.lax.conv_dimension_numbers(
            s2d(xsm).shape, (3, 3, 4 * C, 4 * C), ("NHWC", "HWIO", "NHWC"))))
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"max |plain - s2d| fp32: {err:.2e}")

    t_plain = timeit(plain, x, w)
    t_s2d = timeit(s2d_conv, xs, ws)
    t_full = timeit(s2d_full, x, ws)
    gflop = B * H * W * C * C * K * K * 2 / 1e9
    print(f"plain {K}x{K} {C}ch @ {H}x{W}x{B}: {t_plain:.2f} ms "
          f"({gflop/t_plain:.0f} GF/s)")
    print(f"s2d   3x3 {4*C}ch (pre-transformed input): {t_s2d:.2f} ms")
    print(f"s2d   incl s2d/d2s transforms: {t_full:.2f} ms")

    # chain of 5 convs (the cdu5 shape) amortizing the transforms
    @jax.jit
    def chain_plain(x, w):
        for _ in range(5):
            x = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                             dimension_numbers=dn)
        return x

    @jax.jit
    def chain_s2d(x, ws):
        x = s2d(x)
        for _ in range(5):
            x = jax.lax.conv_general_dilated(x, ws, (1, 1), "SAME",
                                             dimension_numbers=dn2)
        return d2s(x)

    print(f"chain x5 plain: {timeit(chain_plain, x, w):.2f} ms")
    print(f"chain x5 s2d:   {timeit(chain_s2d, x, ws):.2f} ms")

    # 32-ch 3x3 case (cdu11/cdu2 shape)
    C2 = 32
    x2 = jax.random.normal(key, (B, H, W, C2), jnp.bfloat16)
    w2 = jax.random.normal(key, (3, 3, C2, C2), jnp.bfloat16) * 0.05
    ws2 = embed_kernel(np.asarray(w2, np.float32).astype(np.float32)).astype(jnp.bfloat16)
    dn3 = jax.lax.conv_dimension_numbers(x2.shape, w2.shape,
                                         ("NHWC", "HWIO", "NHWC"))
    dn4 = jax.lax.conv_dimension_numbers(s2d(x2).shape, ws2.shape,
                                         ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def chain32_plain(x, w):
        for _ in range(5):
            x = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                             dimension_numbers=dn3)
        return x

    @jax.jit
    def chain32_s2d(x, ws):
        x = s2d(x)
        for _ in range(5):
            x = jax.lax.conv_general_dilated(x, ws, (1, 1), "SAME",
                                             dimension_numbers=dn4)
        return d2s(x)

    print(f"32ch 3x3 chain x5 plain: {timeit(chain32_plain, x2, w2):.2f} ms")
    print(f"32ch 3x3 chain x5 s2d:   {timeit(chain32_s2d, x2, ws2):.2f} ms")


if __name__ == "__main__":
    main()
