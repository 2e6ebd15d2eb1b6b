"""Overfit-to-convergence smoke: prove the training stack LEARNS.

Trains the sdnet_mini net on the synthetic ROSeS fixture until it
memorizes the train set, then evaluates ON THE TRAIN IMAGES (fixture test
split = same distribution): expect mIoU(head2) > 0.9 and a collapsing
disparity loss. This is the quality counterpart of the throughput bench —
a wiring bug in losses/optimizer/label plumbing fails it even when every
unit test passes.

Runs on whatever backend jax picks (real TPU chip under axon; CPU mesh
with JAX_PLATFORMS=cpu). ~40 steps of 64x128 crops, batch 8.

    python tools/overfit_smoke.py            # prints one JSON line
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import (
        PMTConfig,
    )
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu import data as D
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.training import (
        Session,
    )

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    tmp = tempfile.mkdtemp(prefix="overfit_")
    epochs = int(os.environ.get("OVERFIT_EPOCHS", "40"))
    manifests = D.make_roses_fixture(os.path.join(tmp, "ds"), n_train=8,
                                     n_test=2, hw=(96, 160))
    cfg = PMTConfig()
    D.apply_fixture_to_config(cfg, manifests)
    # memorization check: evaluate ON the train images
    for k_test, k_train in (("color_l_test", "color_l"),
                            ("color_r_test", "color_r"),
                            ("disp_test", "disp"), ("seg_test", "seg"),
                            ("inst_test", "inst")):
        setattr(cfg.data, k_test, getattr(cfg.data, k_train))
    cfg.model.net = "sdnet_mini"
    cfg.model.output_activation = "linear"
    cfg.loss.losses = ("cross_entropy",)
    cfg.data.crop = (64, 128)
    cfg.data.eval_shape = (96, 160)
    cfg.data.num_workers = 2
    cfg.run.batch = 8
    cfg.run.epochs = epochs
    cfg.run.eval_every = epochs  # single final eval
    cfg.run.save_path = os.path.join(tmp, "results")
    cfg.optim.learning_rate = 5e-3  # overfit fast on 8 images
    # OVERFIT_BF16=1: the -f16 mixed-precision policy (fp32 master params,
    # bf16 compute) — convergence-quality probe vs the fp32 default
    cfg.parallel.bf16 = os.environ.get("OVERFIT_BF16", "0") == "1"

    session = Session(cfg)
    history = session.fit(log=lambda *a, **k: None)
    ev = history[-1]
    print(json.dumps({
        "metric": "overfit_smoke_miou2",
        "value": round(float(ev["miou2"]), 4),
        "loss": round(float(ev["loss"]), 4),
        "epochs": epochs,
        "pass": bool(ev["miou2"] > 0.9),
    }))


if __name__ == "__main__":
    main()
