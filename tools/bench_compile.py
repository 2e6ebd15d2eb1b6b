"""Measure COLD XLA compile time of the flagship inference graph per batch
size (round-3 VERDICT weak #2 / item 5: name the b32 'compile blowup').

Uses a throwaway compilation-cache dir so every run is a true cold compile,
and times jit(...).lower(...).compile() alone (no data transfer, no
execute). Optionally dumps HLO pass timing via --xla_dump if the axon
relay compiles locally.

    python tools/bench_compile.py [batch ...]    # default: 8 16 32
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# throwaway cache: force cold compiles
jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp())

from pmt_learning_for_semantic_segmentation_and_disparity_tpu import models
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import (
    PMTConfig,
)

H, W = 512, 960


def time_compile(batch: int) -> float:
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg.model.backbone = "densenet"
    cfg.model.corr_type = "1dcorr"
    model = models.get_network(cfg)
    key = jax.random.PRNGKey(0)
    left = jnp.zeros((batch, H, W, 3), jnp.bfloat16)
    variables = jax.jit(
        lambda k, l: model.init({"params": k}, l, l, train=False)
    )(key, left[:1])
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)

    def fwd(left, right):
        out = model.apply(variables, left, right, train=False)
        return out["seg2"], out["disp1"]

    t0 = time.perf_counter()
    lowered = jax.jit(fwd).lower(left, left)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    return t_lower, t_compile


def main():
    batches = [int(b) for b in sys.argv[1:]] or [8, 16, 32]
    out = {}
    for b in batches:
        tl, tc = time_compile(b)
        out[f"b{b}"] = {"lower_s": round(tl, 1), "compile_s": round(tc, 1)}
        print(json.dumps({f"cold_compile_b{b}": out[f"b{b}"]}), flush=True)
    print(json.dumps({"metric": "flagship_cold_compile", **out}))


if __name__ == "__main__":
    main()
