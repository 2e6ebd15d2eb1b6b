"""PSMNet on-chip eval bench (VERDICT round-1 #5; BASELINE.md config #4).

192-disparity stereo eval at 512x960 on the real TPU chip, exercising
``upsampled_soft_argmin``'s chunked fused regression (ops/costvolume.py)
under real HBM limits — the reference materializes the full-resolution
(192,512,960) volume (models_psm/stackhourglass.py:110-151), ~1.4 GB fp32
per image, which the fused kernel never builds.

Prints one JSON line: pairs/sec/chip + peak HBM.

Usage:  python tools/bench_psmnet.py            # bf16, batch 2
        PSM_BATCH=4 PSM_DTYPE=fp32 python tools/bench_psmnet.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 512, 960
BATCH = int(os.environ.get("PSM_BATCH", "2"))
ITERS = int(os.environ.get("PSM_ITERS", "6"))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pmt_learning_for_semantic_segmentation_and_disparity_tpu import models
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import (
        PMTConfig,
    )

    cfg = PMTConfig()
    cfg.model.net = "pspnet"
    cfg.model.max_disp_psm = 192
    model = models.get_network(cfg)

    key = jax.random.PRNGKey(0)
    left = jax.random.normal(key, (BATCH, H, W, 3), jnp.float32)
    right = jax.random.normal(key, (BATCH, H, W, 3), jnp.float32)
    variables = jax.jit(
        lambda k, l, r: model.init({"params": k}, l, r, train=False)
    )(key, left[:1], right[:1])

    if os.environ.get("PSM_DTYPE", "bf16") == "bf16":
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, t)
        variables = cast(variables)
        left = left.astype(jnp.bfloat16)
        right = right.astype(jnp.bfloat16)

    # round-5 timer discipline (BENCH_NOTES): variables as jit args,
    # host-transfer sync, RTT-cancelling delta window
    import numpy as np

    @jax.jit
    def fwd(variables, left, right):
        return model.apply(variables, left, right, train=False)["disp1"]

    for _ in range(2):
        np.asarray(fwd(variables, left, right)[0, 0, 0, :1])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        d = fwd(variables, left, right)
    np.asarray(d[0, 0, 0, :1])
    dt1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5 * ITERS):
        d = fwd(variables, left, right)
    np.asarray(d[0, 0, 0, :1])
    dt5 = time.perf_counter() - t0
    dt = (dt5 - dt1) / 4 if dt5 > 1.2 * dt1 else dt5 / 5

    stats = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        pass
    print(json.dumps({
        "metric": "psmnet_pairs_per_sec_per_chip_512x960_d192",
        "value": round(BATCH * ITERS / dt, 3),
        "unit": "pairs/sec/chip",
        "batch": BATCH,
        "dtype": os.environ.get("PSM_DTYPE", "bf16"),
        "peak_hbm_gb": round(
            stats.get("peak_bytes_in_use", 0) / 2**30, 3),
    }))


if __name__ == "__main__":
    main()
