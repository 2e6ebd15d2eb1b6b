#!/usr/bin/env python
"""Training-step throughput: flagship joint training with the
MultiTversky+OHEM loss stack (BASELINE.md config #3) on one TPU chip."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import PMTConfig
from pmt_learning_for_semantic_segmentation_and_disparity_tpu import models
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.training import (
    TrainState, build_optimizer, make_train_step,
)

H, W, BATCH = 256, 512, 8  # the flagship TRAINING crop (trainTorchImpl.sh)
ITERS = 8


def main():
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg.loss.losses = ("cross_entropy", "lovasz_loss", "tversky_loss",
                       "ohm_loss")
    cfg.parallel.bf16 = os.environ.get("PMT_TRAIN_DTYPE", "bf16") == "bf16"
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, (BATCH, H, W))
    batch = {
        "left": jnp.asarray(rng.standard_normal((BATCH, H, W, 3), dtype=np.float32)),
        "right": jnp.asarray(rng.standard_normal((BATCH, H, W, 3), dtype=np.float32)),
        "seg": jnp.asarray(np.eye(2, dtype=np.float32)[labels]),
        "disp": jnp.asarray(rng.random((BATCH, H, W, 1), dtype=np.float32)),
        "edges": jnp.zeros((BATCH, H, W, 1), jnp.float32),
    }
    model = models.get_network(cfg)
    # jitted init: one program, not one tiny relay compile per
    # initializer (BENCH_NOTES round 5)
    variables = jax.jit(
        lambda k1, k2, l: model.init({"params": k1, "dropout": k2},
                                     l, l, train=False)
    )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), batch["left"][:1])
    tx = build_optimizer(cfg.optim, cfg.model.net, len(cfg.loss.losses), 100)
    state = TrainState.create(model.apply, variables["params"],
                              variables.get("batch_stats", {}), tx)
    step = make_train_step(cfg, model, mesh=None)
    key = jax.random.PRNGKey(0)
    state, m = step(state, batch, key)  # compile
    float(m["loss"])

    # latency-bound figure: host transfer per step. Over the axon relay
    # block_until_ready on a chain of donated steps returns early, so this
    # is the honest SYNCHRONOUS timer — but it pays a full relay RTT per
    # step (~60 ms, BENCH_NOTES round 3), which production training never
    # does.
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, m = step(state, batch, jax.random.fold_in(key, i))
        float(m["loss"])
    dt = time.perf_counter() - t0
    stepsync = BATCH * ITERS / dt

    # sustained figure: K steps chained in ONE jit via lax.scan — no host
    # round-trip between steps, exactly how a loader-fed training loop
    # dispatches. The batch is rolled along dim 0 every iteration so no
    # batch-dependent computation is loop-invariant (XLA cannot hoist work
    # a real loader would re-trigger). One host transfer at the end forces
    # the whole chain, which stays honest under the relay.
    K = 16
    def chain(st, b, k):
        def body(s, i):
            bi = {n: jnp.roll(v, i, axis=0) for n, v in b.items()}
            s, mm = step(s, bi, jax.random.fold_in(k, i))
            return s, mm["loss"]
        return jax.lax.scan(body, st, jnp.arange(K))
    # RTT-cancelling delta (BENCH_NOTES round 5): 1-chain vs 12-chain
    # windows, each ending in one transfer; the constant relay RTT cancels
    # in the difference and its variance is a few % of ~20 s of compute.
    chain_j = jax.jit(chain, donate_argnums=(0,))
    state, losses = chain_j(state, batch, key)  # compile + warm run
    float(losses[-1])
    t0 = time.perf_counter()
    state, losses = chain_j(state, batch, jax.random.fold_in(key, 1))
    lv = float(losses[-1])
    dt1 = time.perf_counter() - t0
    n_wide = 12
    t0 = time.perf_counter()
    for i in range(2, 2 + n_wide):
        state, losses = chain_j(state, batch, jax.random.fold_in(key, i))
    lv = float(losses[-1])
    dtw = time.perf_counter() - t0
    if dtw > 1.2 * dt1 * n_wide / 4:
        sustained = BATCH * K * (n_wide - 1) / (dtw - dt1)
    else:
        sustained = BATCH * K * n_wide / dtw

    print(json.dumps({
        "metric": "train_pairs_per_sec_per_chip_256x512_multitversky_ohem",
        "value": round(sustained, 3),
        "unit": "pairs/sec/chip",
        "stepsync_value": round(stepsync, 3),
        "loss": lv,
    }))


if __name__ == "__main__":
    main()
