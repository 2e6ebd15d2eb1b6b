"""On-chip numbers for the remaining BASELINE.md benchmark configs.

BASELINE.md lists five configs of increasing cost; bench.py covers the
flagship joint train step (#3) and tools/bench_psmnet.py covers PSMNet
(#4). This tool measures the rest on the real chip:

  #2 disparity path: sdnet_mini (1-D correlation disp head) inference at
     512x960.
  #5 deeplab family with TTA: HANet-enabled mono DeepLabV3+ (xception65)
     hflip-TTA eval at 512x960. (The "8-replica data-parallel" half of #5
     is exercised by the driver's dryrun_multichip and the 8-device CPU
     DP-invariance test — one real chip is available here.)

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

    from pmt_learning_for_semantic_segmentation_and_disparity_tpu import models

    model = models.get_network(cfg)
    key = jax.random.PRNGKey(0)
    left = jax.random.normal(key, (batch, H, W, 3), jnp.float32)
    variables = model.init({"params": key}, left[:1], left[:1], train=False)
    variables = _bf16(variables)
    left = left.astype(jnp.bfloat16)
    fwd = fwd_builder(model, variables)
    for _ in range(2):
        jax.block_until_ready(fwd(left, left))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        o = fwd(left, left)
    jax.block_until_ready(o)
    return batch * ITERS / (time.perf_counter() - t0)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

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

    def plain(model, variables):
        return jax.jit(
            lambda l, r: model.apply(variables, l, r, train=False)["disp1"])

    out["sdnet_mini_disp_pairs_per_sec"] = round(
        bench_model(cfg, 16, plain), 2)

    # config #5a: HANet-enabled flagship (the -hanet 1 head attention,
    # dsnet_t2.py:1290-1296) inference
    cfgh = PMTConfig()
    cfgh.model.net = "sdnet_mini_ext"
    cfgh.model.hanet = True

    def both_heads(model, variables):
        # consume BOTH heads like bench.py — returning seg2 alone lets XLA
        # dead-code-eliminate the whole disparity branch
        def f(l, r):
            o = model.apply(variables, l, r, train=False)
            return o["seg2"], o["disp1"]

        return jax.jit(f)

    out["flagship_hanet_pairs_per_sec"] = round(
        bench_model(cfgh, 16, both_heads), 2)

    # config #5b: mono DeepLabV3+ (xception65 — the factory default) with
    # hflip TTA
    cfg5 = PMTConfig()
    cfg5.model.net = "deeplab"
    cfg5.data.dataset_name = "cityscapes"

    def with_tta(model, variables):
        from pmt_learning_for_semantic_segmentation_and_disparity_tpu.models.deeplab import (
            deeplab_preprocess,
        )

        def seg_forward(x):
            return model.apply(variables, x, x, train=False)["seg1"]

        def fwd(l, r):
            lp, _, _ = deeplab_preprocess(l)
            return tta(seg_forward, lp)

        return jax.jit(fwd)

    out["deeplab_hanet_tta_imgs_per_sec"] = round(
        bench_model(cfg5, 8, with_tta), 2)

    out["hw"] = f"{H}x{W}"
    out["dtype"] = "bf16"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
