"""End-to-end training tests on the 8-device CPU mesh + synthetic fixtures."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import PMTConfig
from pmt_learning_for_semantic_segmentation_and_disparity_tpu import models
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.parallel import (
    make_mesh,
    shard_batch,
    replicate,
)
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.training import (
    TrainState,
    build_optimizer,
    make_train_step,
    make_eval_step,
)


def _toy_batch(rng, b=8, h=32, w=64, c=2):
    labels = rng.integers(0, c, (b, h, w))
    return {
        "left": rng.standard_normal((b, h, w, 3), dtype=np.float32),
        "right": rng.standard_normal((b, h, w, 3), dtype=np.float32),
        "seg": np.eye(c, dtype=np.float32)[labels],
        "disp": rng.random((b, h, w, 1), dtype=np.float32),
        "edges": np.zeros((b, h, w, 1), np.float32),
    }


def _make_state(cfg, model, batch, mesh=None):
    left = jnp.asarray(batch["left"][:1])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        left, left, train=False,
    )
    tx = build_optimizer(cfg.optim, cfg.model.net, len(cfg.loss.losses), 10)
    state = TrainState.create(
        model.apply, variables["params"], variables.get("batch_stats", {}), tx
    )
    if mesh is not None:
        state = replicate(mesh, state)
    return state


def test_single_device_train_step_decreases_loss(rng):
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini"
    cfg.loss.losses = ("cross_entropy",)
    model = models.get_network(cfg)
    batch = {k: jnp.asarray(v) for k, v in _toy_batch(rng, b=2).items()}
    state = _make_state(cfg, model, batch)
    step = make_train_step(cfg, model, mesh=None)
    key = jax.random.PRNGKey(0)
    state, m0 = step(state, batch, key)
    losses = [float(m0["loss"])]
    for i in range(8):
        state, m = step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses  # overfits a fixed batch
    assert np.isfinite(losses).all()


def test_spmd_train_step_8dev_mesh(rng):
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini"
    cfg.loss.losses = ("cross_entropy",)
    mesh = make_mesh()
    model = models.get_network(cfg, axis_name="data")
    batch_np = _toy_batch(rng, b=8)
    batch = shard_batch(mesh, batch_np)
    state = _make_state(cfg, model, batch_np, mesh)
    step = make_train_step(cfg, model, mesh)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # confusion matrices summed over shards: total count == all pixels
    conf = np.asarray(metrics["conf2"])
    assert conf.sum() == 8 * 32 * 64


def test_spmd_matches_single_device_grads(rng):
    """DP invariance: one SPMD step over 8 shards == one big-batch step."""
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini"
    cfg.loss.losses = ("cross_entropy",)
    cfg.model.dropout = 0.0
    batch_np = _toy_batch(rng, b=8)

    # single device
    model1 = models.get_network(cfg, axis_name=None)
    b1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    s1 = _make_state(cfg, model1, batch_np)
    step1 = make_train_step(cfg, model1, mesh=None)
    s1b, m1 = step1(s1, b1, jax.random.PRNGKey(9))

    # 8-way mesh (sync BN so batch stats match the global batch)
    mesh = make_mesh()
    model8 = models.get_network(cfg, axis_name="data")
    s8 = _make_state(cfg, model8, batch_np, mesh)
    step8 = make_train_step(cfg, model8, mesh)
    s8b, m8 = step8(s8, shard_batch(mesh, batch_np), jax.random.PRNGKey(9))

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=2e-4
    )
    # parameters after one step agree (same init seeds -> same params)
    p1 = jax.tree_util.tree_leaves(s1b.params)[0]
    p8 = jax.tree_util.tree_leaves(s8b.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-4)


def test_eval_step_per_row_metrics(rng):
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini"
    model = models.get_network(cfg)
    batch = {k: jnp.asarray(v) for k, v in _toy_batch(rng, b=2).items()}
    state = _make_state(cfg, model, batch)
    ev = make_eval_step(cfg, model, mesh=None)
    out, metrics = ev(state.params, state.batch_stats, batch, jax.random.PRNGKey(0))
    assert out["seg2"].shape == (2, 32, 64, 2)
    # per-ROW metrics: scalars (B,), confusion (B,n,n)
    assert metrics["disp_rmse"].shape == (2,)
    assert metrics["conf2"].shape == (2, 2, 2)
    assert metrics["loss"].shape == (2,)
    assert np.isfinite(np.asarray(metrics["disp_rmse"])).all()
    # head-1 max-of-heads inputs present (test_model :497-506)
    assert "prec1" in metrics and "bf1_1" in metrics


def test_eval_row_equals_single_row_batch(rng):
    """Row r of a batched eval == evaluating that sample alone (the padded
    rows of a sharded eval batch can therefore be dropped exactly)."""
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini"
    model = models.get_network(cfg)
    batch_np = _toy_batch(rng, b=2)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state = _make_state(cfg, model, batch)
    ev = make_eval_step(cfg, model, mesh=None)
    _, m2 = ev(state.params, state.batch_stats, batch, jax.random.PRNGKey(0))
    one = {k: jnp.asarray(v[:1]) for k, v in batch_np.items()}
    _, m1 = ev(state.params, state.batch_stats, one, jax.random.PRNGKey(0))
    for k in ("loss", "pixel_acc2", "disp_rmse", "f1_2"):
        np.testing.assert_allclose(
            np.asarray(m2[k])[0], np.asarray(m1[k])[0], rtol=2e-5, atol=1e-6,
            err_msg=k,
        )


def test_poly_schedule():
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.training import (
        poly_schedule,
    )

    sched = poly_schedule(0.005, steps_per_epoch=10, epoch_horizon=2400)
    assert abs(float(sched(0)) - 0.005) < 1e-9
    # halfway through the horizon: lr halves (torch_implementation.py:599-608)
    assert abs(float(sched(12000)) - 0.0025) < 1e-6


def test_checkpoint_roundtrip(tmp_path, rng):
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.training import (
        CheckpointManager,
    )

    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini"
    model = models.get_network(cfg)
    batch = {k: jnp.asarray(v) for k, v in _toy_batch(rng, b=1).items()}
    state = _make_state(cfg, model, batch)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, state, extra={"note": "test"}, val_iou=0.5)

    # perturb then restore
    state2 = state.replace(
        params=jax.tree_util.tree_map(lambda x: x * 0, state.params)
    )
    restored = mgr.restore(state2)
    l0 = jax.tree_util.tree_leaves(state.params)[0]
    l1 = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1))
