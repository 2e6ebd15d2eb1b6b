"""Speed-of-light analysis of the flagship TRAINING step (item 4 support).

Counts the exact FLOPs and bytes of the jitted fwd+loss+bwd+opt step via
XLA's cost analysis (platform-independent — runs on the CPU backend), then
converts to a v5e ceiling:

    SOL step time = max(flops / peak_flops, bytes / peak_hbm_bw)

v5e peaks: ~197 TF/s bf16 MXU, ~0.82 TB/s HBM. The measured pairs/s over
SOL pairs/s is the achieved fraction of speed-of-light; if the profile
shows the residual spread across HBM-bound concat grads at MXU-idle times,
the step is architecture-bound, not implementation-bound.

Run: python tools/sol_analysis.py   (CPU-safe; forces cpu backend)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from pmt_learning_for_semantic_segmentation_and_disparity_tpu import models
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import PMTConfig
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.training import (
    TrainState, build_optimizer, make_train_step,
)

V5E_BF16_TFLOPS = 197e12
V5E_HBM_BW = 0.82e12  # bytes/s


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

    lowered = jax.jit(step).lower(state, batch, key)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    bytes_ = ca.get("bytes accessed", float("nan"))
    t_flops = flops / V5E_BF16_TFLOPS
    t_hbm = bytes_ / V5E_HBM_BW
    sol = max(t_flops, t_hbm)
    print(f"step flops            : {flops / 1e12:.3f} TF")
    print(f"step bytes accessed   : {bytes_ / 1e9:.3f} GB")
    print(f"MXU-bound time (bf16) : {t_flops * 1e3:.2f} ms")
    # NOTE: cost_analysis 'bytes accessed' is PRE-fusion HLO traffic — it
    # counts every intermediate XLA later fuses away. Measured round-3
    # throughput (73 pairs/s) EXCEEDS the bytes-derived "bound" (24.7),
    # proving it is not a bound at all post-fusion. The only honest SOL
    # from this tool is the MXU (flops) floor; memory-boundedness must
    # come from the profiler's per-category device times instead.
    print(f"HBM-bound time        : {t_hbm * 1e3:.2f} ms  "
          f"(pre-fusion bytes — NOT a real bound, see note)")
    print(f"MXU SOL step time     : {t_flops * 1e3:.2f} ms "
          f"-> {tb / t_flops:.1f} pairs/s/chip ceiling")
    for k in sorted(ca):
        if k.endswith("flops") or "bytes" in k:
            print(f"  {k}: {ca[k]:.3e}")


if __name__ == "__main__":
    main()
