"""Train-step grad tests across loss stacks and outputTypes — every config
must be end-to-end differentiable (guards against non-autodiff ops like raw
pallas calls sneaking into the training path)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import PMTConfig
from pmt_learning_for_semantic_segmentation_and_disparity_tpu import models
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.training import (
    TrainState,
    build_optimizer,
    make_train_step,
)


def _toy_batch(rng, b=1, h=32, w=64, c=2):
    labels = rng.integers(0, c, (b, h, w))
    return {
        "left": jnp.asarray(rng.standard_normal((b, h, w, 3), dtype=np.float32)),
        "right": jnp.asarray(rng.standard_normal((b, h, w, 3), dtype=np.float32)),
        "seg": jnp.asarray(np.eye(c, dtype=np.float32)[labels]),
        "disp": jnp.asarray(rng.random((b, h, w, 1), dtype=np.float32)),
        "edges": jnp.asarray(
            (rng.random((b, h, w, 1)) > 0.9).astype(np.float32)
        ),
    }


def _one_step(cfg, rng, h=32, w=64, init_kwargs=None):
    model = models.get_network(cfg)
    batch = _toy_batch(rng, h=h, w=w)
    left = batch["left"]
    if cfg.model.edges:
        left = jnp.concatenate([left, batch["edges"]], axis=-1)
    kwargs = dict(init_kwargs or {})
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        left, left, train=False, **kwargs,
    )
    tx = build_optimizer(cfg.optim, cfg.model.net, len(cfg.loss.losses), 5)
    state = TrainState.create(
        model.apply, variables["params"], variables.get("batch_stats", {}), tx
    )
    step = make_train_step(cfg, model, mesh=None)
    # snapshot before the step — the step donates its input state
    l0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    state2, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"])), metrics["loss"]
    l1 = np.asarray(jax.tree_util.tree_leaves(state2.params)[0])
    assert not np.allclose(l0, l1)  # parameters actually moved
    return metrics


def test_full_multi_loss_stack(rng):
    """CE + lovasz + tversky(custom_vjp) + tversky2 + ohm + dice on the
    flagship — the 'sdnet_mini_ext with MultiTversky+OHEM' bench config."""
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini"  # small model, same loss path
    cfg.loss.losses = ("cross_entropy", "lovasz_loss", "tversky_loss",
                       "tversky_loss2", "ohm_loss", "dice_loss")
    cfg.loss.seg_weight = True
    _one_step(cfg, rng)


def test_flagship_trains_with_pallas_corr_dispatch(rng):
    """sdnet_mini_ext includes ops.correlation, whose training path must be
    differentiable on every backend (custom_vjp regression test)."""
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg.loss.losses = ("cross_entropy", "lovasz_loss")
    _one_step(cfg, rng)


def test_area_and_smoothness_losses(rng):
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini"
    cfg.loss.losses = ("cross_entropy", "area_ce", "area_hinge", "smooth_grad")
    _one_step(cfg, rng)


def test_warp_photo_consistency_step(rng):
    cfg = PMTConfig()
    cfg.model.net = "dsnet_warp_disp_consist"  # ThreeOutPutsDispConsist
    cfg.loss.losses = ("cross_entropy",)
    _one_step(cfg, rng, h=64, w=64)


def test_multitask_kendall_step(rng):
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg.model.multaskloss = 1
    cfg.loss.losses = ("cross_entropy",)
    _one_step(
        cfg, rng,
        init_kwargs=dict(
            disp_gt=jnp.zeros((1, 32, 64, 1)),
            seg_labels=jnp.zeros((1, 32, 64), jnp.int32),
        ),
    )


def test_step_timer():
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.profiling import (
        StepTimer,
    )

    t = StepTimer(warmup=0)
    t.tick()
    t.tick()
    assert t.mean > 0
    assert t.throughput(8) > 0


def test_edge_out_step(rng):
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext_small_edge"  # outputType edgeOut
    cfg.loss.losses = ("cross_entropy",)
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.ops.edges import (
        compute_grad_mag,
    )

    left_e = compute_grad_mag(jnp.zeros((1, 32, 64, 3)), normalize=False)
    _one_step(cfg, rng, init_kwargs=dict(left_e=left_e))


def test_bf16_mixed_precision_step(rng):
    """-f16 equivalent: bf16 compute, fp32 master params + grads."""
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini"
    cfg.loss.losses = ("cross_entropy",)
    cfg.parallel.bf16 = True
    m = _one_step(cfg, rng)
    assert np.isfinite(float(m["loss"]))


def test_freeze_bn_zeroes_bn_grads_and_stats(rng):
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini"
    cfg.loss.losses = ("cross_entropy",)
    cfg.optim.freeze_bn = True
    model = models.get_network(cfg)
    batch = _toy_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["left"], batch["left"], train=False,
    )
    tx = build_optimizer(cfg.optim, cfg.model.net, 1, 5)
    state = TrainState.create(model.apply, variables["params"],
                              variables.get("batch_stats", {}), tx)
    stats_before = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    # find a BN scale leaf to compare
    flat_before = {jax.tree_util.keystr(p): np.asarray(v)
                   for p, v in jax.tree_util.tree_flatten_with_path(
                       state.params)[0]}
    step = make_train_step(cfg, model, mesh=None)
    state2, m = step(state, batch, jax.random.PRNGKey(2))
    flat_after = {jax.tree_util.keystr(p): np.asarray(v)
                  for p, v in jax.tree_util.tree_flatten_with_path(
                      state2.params)[0]}
    bn_keys = [k for k in flat_before
               if ("bn" in k.lower() or "norm" in k.lower())
               and ("scale" in k or "bias" in k)]
    assert bn_keys
    for k in bn_keys:
        np.testing.assert_array_equal(flat_before[k], flat_after[k])
    conv_keys = [k for k in flat_before if "kernel" in k]
    assert any(not np.allclose(flat_before[k], flat_after[k])
               for k in conv_keys)
    # batch stats frozen too
    sa = jax.tree_util.tree_map(np.asarray, state2.batch_stats)
    for a, b in zip(jax.tree_util.tree_leaves(stats_before),
                    jax.tree_util.tree_leaves(sa)):
        np.testing.assert_array_equal(a, b)


def test_deeplab_train_step(rng):
    cfg = PMTConfig()
    cfg.model.net = "deeplab"
    cfg.data.dataset_name = "cityscapes"
    cfg.loss.losses = ("cross_entropy",)
    model = models.get_network(cfg)
    b, h, w, c = 1, 32, 64, 19
    labels = rng.integers(0, c + 1, (b, h, w))
    batch = {
        "left": jnp.asarray(rng.standard_normal((b, h, w, 3), dtype=np.float32)),
        "right": jnp.asarray(rng.standard_normal((b, h, w, 3), dtype=np.float32)),
        "seg": jnp.asarray(np.eye(c + 1, dtype=np.float32)[labels]),
        "disp": jnp.asarray(rng.random((b, h, w, 1), dtype=np.float32)),
        "edges": jnp.zeros((b, h, w, 1), jnp.float32),
    }
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.models.deeplab import (
        deeplab_preprocess,
    )

    lp, _, _ = deeplab_preprocess(batch["left"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        lp, lp, train=False,
    )
    tx = build_optimizer(cfg.optim, cfg.model.net, 1, 5)
    state = TrainState.create(model.apply, variables["params"],
                              variables.get("batch_stats", {}), tx)
    step = make_train_step(cfg, model, mesh=None)
    state2, m = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
    # disparity faked with GT -> zero disp loss (torch_implementation.py:159-162)
    assert abs(float(m["loss_disp"])) < 1e-6


def test_pspnet_train_step(rng):
    cfg = PMTConfig()
    cfg.model.net = "pspnet"
    cfg.model.max_disp_psm = 16
    cfg.loss.losses = ("cross_entropy",)
    model = models.get_network(cfg)
    b, h, w = 1, 16, 32
    labels = rng.integers(0, 2, (b, h, w))
    batch = {
        "left": jnp.asarray(rng.standard_normal((b, h, w, 3), dtype=np.float32)),
        "right": jnp.asarray(rng.standard_normal((b, h, w, 3), dtype=np.float32)),
        "seg": jnp.asarray(np.eye(2, dtype=np.float32)[labels]),
        "disp": jnp.asarray(rng.random((b, h, w, 1), dtype=np.float32)),
        "edges": jnp.zeros((b, h, w, 1), jnp.float32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["left"], batch["left"], train=False,
    )
    tx = build_optimizer(cfg.optim, cfg.model.net, 1, 5)
    state = TrainState.create(model.apply, variables["params"],
                              variables.get("batch_stats", {}), tx)
    step = make_train_step(cfg, model, mesh=None)
    state2, m = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
