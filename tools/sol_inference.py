"""Speed-of-light analysis of the flagship INFERENCE pass (bench.py
headline: sdnet_mini_ext / densenet / 1dcorr at 512x960 batch 16, bf16).

Same method as tools/sol_analysis.py (training): XLA cost_analysis on the
CPU backend gives exact FLOPs; the v5e bf16 MXU peak converts that to a
flops floor. 'bytes accessed' is pre-fusion and reported only as a
diagnostic, not a bound.

Run: python tools/sol_inference.py   (CPU-safe; forces cpu backend)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from pmt_learning_for_semantic_segmentation_and_disparity_tpu import models
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import PMTConfig

V5E_BF16_TFLOPS = 197e12
V5E_HBM_BW = 0.82e12  # bytes/s

H, W, BATCH = 512, 960, 16


def main():
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg.model.backbone = "densenet"
    cfg.model.corr_type = "1dcorr"
    model = models.get_network(cfg)
    key = jax.random.PRNGKey(0)
    left = jax.random.normal(key, (BATCH, H, W, 3), jnp.bfloat16)
    variables = jax.jit(
        lambda k, l: model.init({"params": k}, l, l, train=False)
    )(key, left[:1])
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables,
    )

    def fwd(l, r):
        out = model.apply(variables, l, r, train=False)
        return out["seg2"], out["disp1"]

    compiled = jax.jit(fwd).lower(left, left).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    bytes_ = ca.get("bytes accessed", float("nan"))
    t_flops = flops / V5E_BF16_TFLOPS
    print(f"inference flops (b{BATCH})   : {flops / 1e12:.3f} TF")
    print(f"per-pair flops               : {flops / BATCH / 1e12:.4f} TF")
    print(f"bytes accessed (pre-fusion)  : {bytes_ / 1e9:.2f} GB (diagnostic)")
    print(f"MXU SOL batch time           : {t_flops * 1e3:.2f} ms "
          f"-> {BATCH / t_flops:.1f} pairs/s/chip ceiling")


if __name__ == "__main__":
    main()
