"""Capture a TPU trace of the flagship TRAINING step (fwd+loss+bwd+opt).

Complements tools/profile_flagship.py (inference). Dump op stats with the
xplane parser pattern from BENCH_NOTES (tensorboard converter is broken in
this image).
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

from pmt_learning_for_semantic_segmentation_and_disparity_tpu import models
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import PMTConfig
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.training import (
    TrainState, build_optimizer, make_train_step,
)

LOG = "/tmp/tb_train"


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
    variables = jax.jit(
        lambda k1, k2, l: model.init({"params": k1, "dropout": k2},
                                     l, l, train=False)
    )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), batch["left"][:1])
    tx = build_optimizer(cfg.optim, cfg.model.net, len(cfg.loss.losses), 100)
    state = TrainState.create(model.apply, variables["params"],
                              variables.get("batch_stats", {}), tx)
    step = make_train_step(cfg, model, mesh=None)
    key = jax.random.PRNGKey(0)
    state, m = step(state, batch, key)
    float(m["loss"])
    with jax.profiler.trace(LOG):
        for i in range(3):
            state, m = step(state, batch, jax.random.fold_in(key, i))
            float(m["loss"])
    print("trace done", LOG)


if __name__ == "__main__":
    main()
