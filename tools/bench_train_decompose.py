"""Decompose the flagship training-step time (item 4 support).

Times four jitted programs at 256x512 b8 bf16 on the current backend:

  fwd        — inference forward (train=False)
  fwd_bn     — training-mode forward (batch stats + dropout rng)
  fwd_bwd    — value_and_grad of a plain L2 head loss (no reference losses)
  full_step  — the real train step (CE+Lovász+Tversky+OHEM + opt + metrics)

The deltas bracket the cost of (a) the bwd pass proper, (b) the loss stack
+ metrics + optimizer. Run on TPU: python tools/bench_train_decompose.py
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

from pmt_learning_for_semantic_segmentation_and_disparity_tpu import models
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import PMTConfig
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.training import (
    TrainState, build_optimizer, make_train_step,
)


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    th, tw, tb = 256, 512, 8
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg.loss.losses = ("cross_entropy", "lovasz_loss", "tversky_loss",
                       "ohm_loss")
    cfg.parallel.bf16 = True
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
    params, stats = variables["params"], variables.get("batch_stats", {})
    bf16 = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def fwd(p, s, l, r):
        return model.apply({"params": bf16(p), "batch_stats": s},
                           l.astype(jnp.bfloat16), r.astype(jnp.bfloat16),
                           train=False)["seg2"]

    @jax.jit
    def fwd_bn(p, s, l, r, k):
        out, upd = model.apply(
            {"params": bf16(p), "batch_stats": s},
            l.astype(jnp.bfloat16), r.astype(jnp.bfloat16), train=True,
            mutable=["batch_stats"], rngs={"dropout": k})
        return out["seg2"], upd

    @jax.jit
    def fwd_bwd(p, s, l, r, k):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": bf16(p), "batch_stats": s},
                l.astype(jnp.bfloat16), r.astype(jnp.bfloat16), train=True,
                mutable=["batch_stats"], rngs={"dropout": k})
            loss = (jnp.mean(jnp.square(out["seg2"].astype(jnp.float32)))
                    + jnp.mean(jnp.square(out["disp1"].astype(jnp.float32)))
                    + jnp.mean(jnp.square(out["seg1"].astype(jnp.float32))))
            return loss, upd
        (l_, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        return l_, g

    tx = build_optimizer(cfg.optim, cfg.model.net, len(cfg.loss.losses), 100)
    state = TrainState.create(model.apply, params, stats, tx)
    step = make_train_step(cfg, model, mesh=None)

    t_fwd = timeit(fwd, params, stats, batch["left"], batch["right"])
    t_fbn = timeit(fwd_bn, params, stats, batch["left"], batch["right"], key)
    t_fb = timeit(fwd_bwd, params, stats, batch["left"], batch["right"], key)

    def run_step(st, b, k):
        return step(st, b, k)
    st2, m = step(state, batch, key)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    n = 10
    st = st2
    for i in range(n):
        st, m = step(st, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(m["loss"])
    t_full = (time.perf_counter() - t0) / n

    print(f"fwd eval   : {t_fwd * 1e3:8.2f} ms  ({tb / t_fwd:6.1f} pairs/s)")
    print(f"fwd train  : {t_fbn * 1e3:8.2f} ms  ({tb / t_fbn:6.1f} pairs/s)")
    print(f"fwd+bwd L2 : {t_fb * 1e3:8.2f} ms  ({tb / t_fb:6.1f} pairs/s)")
    print(f"full step  : {t_full * 1e3:8.2f} ms  ({tb / t_full:6.1f} pairs/s)")
    print(f"-> bwd cost        : {(t_fb - t_fbn) * 1e3:8.2f} ms")
    print(f"-> loss+opt+metrics: {(t_full - t_fb) * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
