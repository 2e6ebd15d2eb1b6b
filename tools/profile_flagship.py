#!/usr/bin/env python
"""Capture a TPU profiler trace of the flagship forward and dump the op
breakdown (framework op stats via tensorboard_plugin_profile)."""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pmt_learning_for_semantic_segmentation_and_disparity_tpu import models
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import PMTConfig

H, W, BATCH = 512, 960, 8
LOG = "/tmp/tb_profile"


def main():
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    model = models.get_network(cfg)
    key = jax.random.PRNGKey(0)
    left = jax.random.normal(key, (BATCH, H, W, 3), jnp.float32)
    variables = jax.jit(
        lambda k, l: model.init({"params": k}, l, l, train=False)
    )(key, left[:1])
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    variables = cast(variables)
    left = left.astype(jnp.bfloat16)

    @jax.jit
    def fwd(l, r):
        out = model.apply(variables, l, r, train=False)
        return out["seg2"], out["disp1"]

    for _ in range(2):
        jax.block_until_ready(fwd(left, left))
    t0 = time.perf_counter()
    with jax.profiler.trace(LOG):
        for _ in range(3):
            o = fwd(left, left)
        jax.block_until_ready(o)
    print("3 iters:", time.perf_counter() - t0, "s")

    # find xplane file and dump op stats
    planes = glob.glob(os.path.join(LOG, "**", "*.xplane.pb"), recursive=True)
    print("planes:", planes)
    if planes:
        try:
            from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t

            data, _ = r2t.xspace_to_tool_data(planes, "framework_op_stats", {})
            out_path = "/tmp/op_stats.csv"
            if isinstance(data, bytes):
                data = data.decode("utf-8", "ignore")
            with open(out_path, "w") as f:
                f.write(data)
            print("wrote", out_path)
        except Exception as e:
            print("op stats failed:", e)


if __name__ == "__main__":
    main()
