"""On-chip numbers for the remaining BASELINE.md benchmark configs.

BASELINE.md lists five configs of increasing cost; bench.py covers the
flagship joint train step (#3) and tools/bench_psmnet.py covers PSMNet
(#4). This tool measures the rest on the real chip:

  #2 disparity path: sdnet_mini (1-D correlation disp head) inference at
     512x960.
  #5 deeplab family with TTA: HANet-enabled mono DeepLabV3+ (xception65)
     hflip-TTA eval at 512x960, plus the multi-scale variant
     (scales 0.75/1.25 — the reference's SegmentatorTTA takes scales from
     the caller, models_deeplab/tta.py:28-42). (The "8-replica
     data-parallel" half of #5 is exercised by the driver's
     dryrun_multichip and the 8-device CPU DP-invariance test — one real
     chip is available here.)

Timers follow bench.py round-5 practice: jitted init (one program, not
one tiny compile per initializer), variables as jit ARGUMENTS (closure
params inline as MLIR constants: minutes of lowering + value-poisoned
cache keys), host-transfer of one output element instead of
block_until_ready (which returns early over the axon relay), and an
RTT-cancelling delta window (1x vs 5x ITERS; the constant relay
round-trip cancels in the difference).

    python tools/bench_configs.py          # bf16, prints one JSON line
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 512, 960
ITERS = 6


def _bf16(tree):
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        tree)


def bench_model(cfg, batch, fwd_builder):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pmt_learning_for_semantic_segmentation_and_disparity_tpu import models

    model = models.get_network(cfg)
    key = jax.random.PRNGKey(0)
    left = jax.random.normal(key, (batch, H, W, 3), jnp.float32)
    variables = jax.jit(
        lambda k, l: model.init({"params": k}, l, l, train=False)
    )(key, left[:1])
    variables = _bf16(variables)
    left = left.astype(jnp.bfloat16)
    fwd = fwd_builder(model)

    def sync(o):
        leaf = jax.tree_util.tree_leaves(o)[-1]
        np.asarray(leaf.reshape(-1)[:1])

    for _ in range(2):
        sync(fwd(variables, left, left))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        o = fwd(variables, left, left)
    sync(o)
    dt1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5 * ITERS):
        o = fwd(variables, left, left)
    sync(o)
    dt5 = time.perf_counter() - t0
    if dt5 > 1.2 * dt1:
        return batch * 4 * ITERS / (dt5 - dt1)
    return batch * 5 * ITERS / dt5


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import (
        PMTConfig,
    )
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.evaluation.tta import (
        tta,
    )

    out = {}

    # config #2: minimal joint net, disparity via 1-D correlation
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini"
    cfg.model.backbone = "densenet"
    cfg.model.corr_type = "1dcorr"

    def plain(model):
        return jax.jit(
            lambda v, l, r: model.apply(v, l, r, train=False)["disp1"])

    out["sdnet_mini_disp_pairs_per_sec"] = round(
        bench_model(cfg, 16, plain), 2)

    # config #5a: HANet-enabled flagship (the -hanet 1 head attention,
    # dsnet_t2.py:1290-1296) inference
    cfgh = PMTConfig()
    cfgh.model.net = "sdnet_mini_ext"
    cfgh.model.hanet = True

    def both_heads(model):
        # consume BOTH heads like bench.py — returning seg2 alone lets XLA
        # dead-code-eliminate the whole disparity branch
        def f(v, l, r):
            o = model.apply(v, l, r, train=False)
            return o["seg2"], o["disp1"]

        return jax.jit(f)

    out["flagship_hanet_pairs_per_sec"] = round(
        bench_model(cfgh, 16, both_heads), 2)

    # config #5b: mono DeepLabV3+ (xception65 — the factory default) with
    # hflip TTA; #5c adds the multi-scale averaging (0.75x/1.25x, i.e. 6
    # forwards per image)
    cfg5 = PMTConfig()
    cfg5.model.net = "deeplab"
    cfg5.data.dataset_name = "cityscapes"

    def with_tta(scales):
        def build(model):
            from pmt_learning_for_semantic_segmentation_and_disparity_tpu.models.deeplab import (
                deeplab_preprocess,
            )

            def fwd(v, l, r):
                def seg_forward(x):
                    return model.apply(v, x, x, train=False)["seg1"]

                lp, _, _ = deeplab_preprocess(l)
                return tta(seg_forward, lp, scales=scales)

            return jax.jit(fwd)

        return build

    out["deeplab_hanet_tta_imgs_per_sec"] = round(
        bench_model(cfg5, 8, with_tta(None)), 2)
    out["deeplab_multiscale_tta_imgs_per_sec"] = round(
        bench_model(cfg5, 8, with_tta((0.75, 1.25))), 2)

    out["hw"] = f"{H}x{W}"
    out["dtype"] = "bf16"
    out["timer"] = "rtt-cancelling-delta"
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
