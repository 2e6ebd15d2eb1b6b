"""Throughput benchmark — stereo pairs/sec/chip at 512x960 (north star,
BASELINE.md).

Measures flagship (sdnet_mini_ext / MiniDSNetExt, densenet121, 1dcorr)
inference throughput on the available accelerator and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "pairs/sec/chip", "vs_baseline": N}

vs_baseline anchoring: the reference publishes no throughput (SURVEY.md §6)
and this environment has no CUDA, so the torch reference can only be
measured on CPU. We therefore report vs_baseline against a measured
torch-reference-CPU number when available (cached in
BASELINE_MEASURED.json), else 0.0. The honest GPU comparison will be
documented separately once a reference GPU figure exists.
"""
import json
import os
import sys
import time

H, W, BATCH = 512, 960, int(os.environ.get("PMT_BENCH_BATCH", "16"))
WARMUP, ITERS = 2, 8


def measure_tpu() -> float:
    import jax
    import jax.numpy as jnp

    # executable cache: skips the (remote) compile on repeat runs
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu import models
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import (
        PMTConfig,
    )

    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg.model.backbone = "densenet"
    cfg.model.corr_type = "1dcorr"
    cfg.model.s2d_heads = os.environ.get("PMT_S2D", "1") != "0"
    model = models.get_network(cfg)

    key = jax.random.PRNGKey(0)
    left = jax.random.normal(key, (BATCH, H, W, 3), jnp.float32)
    right = jax.random.normal(key, (BATCH, H, W, 3), jnp.float32)
    variables = model.init({"params": key}, left[:1], right[:1], train=False)

    if os.environ.get("PMT_BENCH_DTYPE", "bf16") == "bf16":
        # bf16 inference: params + activations in bfloat16 (MXU native);
        # module dtypes are inferred so the whole graph stays bf16.
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, t
        )
        variables = cast(variables)
        left = left.astype(jnp.bfloat16)
        right = right.astype(jnp.bfloat16)

    @jax.jit
    def fwd(left, right):
        out = model.apply(variables, left, right, train=False)
        return out["seg2"], out["disp1"]

    import numpy as np

    # warmup / compile. Timer: host-transfer one element of the LAST output
    # instead of trusting block_until_ready — over the axon relay the latter
    # can return early (BENCH_NOTES round 1/3), inflating throughput.
    for _ in range(WARMUP):
        s, d = fwd(left, right)
        np.asarray(d[0, 0, 0, :1])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        s, d = fwd(left, right)
    np.asarray(d[0, 0, 0, :1])
    dt = time.perf_counter() - t0
    return BATCH * ITERS / dt


def measure_train() -> dict:
    """Training-step throughput at the reference's training crop (256x512,
    batch 8, MultiTversky+OHEM stack — BASELINE.md config #3).

    Primary figure: SUSTAINED — K steps chained in one jit via lax.scan
    (batch rolled along dim 0 per iteration so nothing batch-dependent is
    loop-invariant), one host transfer at the end forcing the whole chain.
    That is both honest under the axon relay (block_until_ready returns
    early there) and what a loader-fed production loop dispatches; it
    matches the profiler's device time within 4% (BENCH_NOTES round 3b).
    Secondary: per-step host sync, which pays a full relay RTT every step.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pmt_learning_for_semantic_segmentation_and_disparity_tpu import (
        models,
    )
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import (
        PMTConfig,
    )
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.training import (
        TrainState, build_optimizer, make_train_step,
    )

    th, tw, tb, iters = 256, 512, 8, 8
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg.model.s2d_heads = os.environ.get("PMT_S2D", "1") != "0"
    cfg.loss.losses = ("cross_entropy", "lovasz_loss", "tversky_loss",
                       "ohm_loss")
    cfg.parallel.bf16 = os.environ.get("PMT_TRAIN_DTYPE", "bf16") == "bf16"
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, (tb, th, tw))
    batch = {
        "left": jnp.asarray(rng.standard_normal((tb, th, tw, 3),
                                                dtype=np.float32)),
        "right": jnp.asarray(rng.standard_normal((tb, th, tw, 3),
                                                 dtype=np.float32)),
        "seg": jnp.asarray(np.eye(2, dtype=np.float32)[labels]),
        "disp": jnp.asarray(rng.random((tb, th, tw, 1), dtype=np.float32)),
        "edges": jnp.zeros((tb, th, tw, 1), jnp.float32),
    }
    model = models.get_network(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["left"][:1], batch["left"][:1], train=False,
    )
    tx = build_optimizer(cfg.optim, cfg.model.net, len(cfg.loss.losses), 100)
    state = TrainState.create(model.apply, variables["params"],
                              variables.get("batch_stats", {}), tx)
    step = make_train_step(cfg, model, mesh=None)
    key = jax.random.PRNGKey(0)
    state, m = step(state, batch, key)  # compile
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.fold_in(key, i))
        float(m["loss"])  # per-step host sync (axon early-return workaround)
    dt = time.perf_counter() - t0
    stepsync = tb * iters / dt

    k_chain = 16
    def chain(st, b, k):
        def body(s, i):
            bi = {n: jnp.roll(v, i, axis=0) for n, v in b.items()}
            s, mm = step(s, bi, jax.random.fold_in(k, i))
            return s, mm["loss"]
        return jax.lax.scan(body, st, jnp.arange(k_chain))
    chain_j = jax.jit(chain, donate_argnums=(0,))
    state, losses = chain_j(state, batch, key)  # compile + warm run
    float(losses[-1])
    t0 = time.perf_counter()
    state, losses = chain_j(state, batch, jax.random.fold_in(key, 1))
    lv = float(losses[-1])
    dt = time.perf_counter() - t0
    return {"train_pairs_per_sec_per_chip_256x512": round(tb * k_chain / dt, 3),
            "train_stepsync_pairs_per_sec": round(stepsync, 3),
            "train_loss_finite": bool(np.isfinite(lv))}


def load_baseline() -> float:
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BASELINE_MEASURED.json")
    if os.path.exists(p):
        with open(p) as f:
            return float(json.load(f).get("torch_cpu_pairs_per_sec", 0.0))
    return 0.0


def main():
    value = measure_tpu()
    base = load_baseline()
    vs = value / base if base > 0 else 0.0
    out = {
        "metric": "stereo_pairs_per_sec_per_chip_512x960",
        "value": round(value, 3),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(vs, 2),
    }
    if os.environ.get("PMT_BENCH_TRAIN", "1") != "0":
        try:
            out.update(measure_train())
        except Exception as e:  # keep the headline metric robust
            out["train_error"] = repr(e)[:200]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
