"""Round-2 integrity tests: padded-eval invariance, training resume,
best-checkpoint naming, HANet position injection, grad accumulation, hdf5.

These are the VERDICT.md round-1 'Next round' done-criteria.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import PMTConfig
from pmt_learning_for_semantic_segmentation_and_disparity_tpu import data as D
from pmt_learning_for_semantic_segmentation_and_disparity_tpu import models
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.data.datasets import (
    build_datasets,
    normalization_for,
)
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.data.pipeline import (
    DataLoader,
)
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.training import (
    CheckpointManager,
    Session,
    TrainState,
    build_optimizer,
    make_train_step,
)


def _noop(*a, **k):
    pass


def _fixture_cfg(tmp_path, hw=(96, 160), n_train=4, n_test=2):
    manifests = D.make_roses_fixture(str(tmp_path / "ds"), n_train=n_train,
                                     n_test=n_test, hw=hw)
    cfg = PMTConfig()
    D.apply_fixture_to_config(cfg, manifests)
    cfg.model.net = "sdnet_mini"
    cfg.model.output_activation = "linear"
    cfg.loss.losses = ("cross_entropy",)
    cfg.data.crop = (32, 64)
    cfg.data.eval_shape = hw
    cfg.data.num_workers = 1
    cfg.run.batch = 4
    cfg.run.epochs = 1
    cfg.run.eval_every = 1
    cfg.run.save_path = str(tmp_path / "results")
    return cfg


def test_eval_padding_invariance(tmp_path):
    """VERDICT #2 done-criterion: evaluating 2 test images over an 8-device
    mesh (batch padded 2->8) yields the same metrics as a single-device
    batch-1 eval."""
    cfg = _fixture_cfg(tmp_path)
    norm = normalization_for(cfg.model.backbone, cfg.model.net)
    _, testset = build_datasets(
        cfg.data, cfg.model.output_activation, cfg.model.max_disp, norm,
        train=False,
    )
    loader8 = DataLoader(testset, 8, shuffle=False, drop_last=False,
                         bucket_hw=cfg.data.eval_shape, pad_batch=True,
                         num_workers=1)
    first = next(iter(loader8))

    s_mesh = Session(cfg)
    s_mesh.init_state(first)
    ev8 = s_mesh.evaluate(loader8, log=_noop)

    s_one = Session(cfg, use_mesh=False)
    s_one.init_state(first)
    loader1 = DataLoader(testset, 1, shuffle=False, drop_last=False,
                         bucket_hw=cfg.data.eval_shape, num_workers=1)
    ev1 = s_one.evaluate(loader1, log=_noop)

    for k in ("loss", "pixel_acc2", "disp_rmse", "f1_2", "miou2",
              "av_iou", "derr"):
        assert k in ev8, k
        np.testing.assert_allclose(ev8[k], ev1[k], rtol=5e-4, atol=1e-5,
                                   err_msg=k)


def test_eval_spatial_pad_invariance(rng):
    """Bucket padding (pad_to_bucket) must be metrically invisible: the same
    predictions scored at native size == zero-padded to a larger bucket with
    the pad_mask applied. (The model forward itself is not pad-invariant —
    conv receptive fields at the border see the pad — so this tests the
    metric masking on identical outputs.)"""
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.data.pipeline import (
        pad_to_bucket,
    )
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.training.step import (
        _eval_metrics_full,
    )

    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini"
    b, h, w, c = 1, 32, 64, 2
    labels = rng.integers(0, c, (b, h, w))
    out_np = {
        "seg1": rng.standard_normal((b, h, w, c), dtype=np.float32),
        "seg2": rng.standard_normal((b, h, w, c), dtype=np.float32),
        "disp1": rng.random((b, h, w, 1), dtype=np.float32) + 0.1,
    }
    batch_np = {
        "left": rng.standard_normal((b, h, w, 3), dtype=np.float32),
        "right": rng.standard_normal((b, h, w, 3), dtype=np.float32),
        "seg": np.eye(c, dtype=np.float32)[labels],
        "disp": rng.random((b, h, w, 1), dtype=np.float32) + 0.1,
        "edges": np.zeros((b, h, w, 1), np.float32),
    }
    to_j = lambda d: {k: jnp.asarray(v) for k, v in d.items()}
    m_native = jax.tree_util.tree_map(
        np.asarray, _eval_metrics_full(cfg, to_j(out_np), to_j(batch_np))
    )
    pad_out = pad_to_bucket(dict(out_np), (64, 96))
    pad_out.pop("pad_mask")
    pad_batch = pad_to_bucket(dict(batch_np), (64, 96))
    assert pad_batch["pad_mask"].shape == (1, 64, 96, 1)
    m_pad = jax.tree_util.tree_map(
        np.asarray, _eval_metrics_full(cfg, to_j(pad_out), to_j(pad_batch))
    )
    for k in ("pixel_acc1", "pixel_acc2", "prec2", "recall2", "f1_2",
              "bf1_2", "prec1", "disp_rmse", "disp_sqrel", "disp_err3px",
              "disp_valid"):
        np.testing.assert_allclose(m_pad[k], m_native[k],
                                   rtol=1e-5, atol=1e-7, err_msg=k)
    np.testing.assert_allclose(m_pad["conf2"], m_native["conf2"])


def test_fit_resume_matches_uninterrupted(tmp_path):
    """VERDICT #3 done-criterion: kill-and-resume continues from epoch N
    with the same trajectory as an uninterrupted run."""
    cfg = _fixture_cfg(tmp_path, hw=(64, 96))
    cfg.data.eval_shape = (64, 96)
    cfg.run.epochs = 4
    cfg.run.eval_every = 2

    # uninterrupted run
    cfg.run.save_path = str(tmp_path / "full")
    full = Session(cfg, use_mesh=False)
    hist_full = full.fit(log=_noop)

    # phase 1: stop after 2 epochs
    cfg.run.epochs = 2
    cfg.run.save_path = str(tmp_path / "p1")
    s1 = Session(cfg, use_mesh=False)
    s1.fit(log=_noop)
    p1_ckpt = os.path.join(str(tmp_path / "p1"), cfg.model_id())

    # phase 2: resume from phase-1 checkpoints for the remaining epochs
    cfg.run.epochs = 4
    cfg.run.save_path = str(tmp_path / "p2")
    cfg.run.load_weights = p1_ckpt
    s2 = Session(cfg, use_mesh=False)
    hist_resumed = s2.fit(log=_noop)

    # history carries over the restored evals
    assert len(hist_resumed) == len(hist_full)
    # identical final parameters => identical trajectory
    for a, b in zip(jax.tree_util.tree_leaves(full.state.params),
                    jax.tree_util.tree_leaves(s2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(hist_resumed[-1]["loss"],
                               hist_full[-1]["loss"], rtol=1e-4)


def test_best_checkpoint_naming(tmp_path, rng):
    """Reference save_checkpoint keeps exactly one
    `*_model_best_IOU{x}_Derr{y}` artifact, deleting the previous best
    (torch_implementation.py:52-66)."""
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini"
    model = models.get_network(cfg)
    left = jnp.asarray(rng.standard_normal((1, 32, 64, 3), dtype=np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        left, left, train=False,
    )
    tx = build_optimizer(cfg.optim, cfg.model.net, 1, 5)
    state = TrainState.create(model.apply, variables["params"],
                              variables.get("batch_stats", {}), tx)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(0, state, extra={"epoch": 0}, val_iou=0.5, val_derr=0.02)
    mgr.save(1, state, extra={"epoch": 1}, val_iou=0.75, val_derr=0.01)
    mgr.save(2, state, extra={"epoch": 2}, val_iou=0.6, val_derr=0.5)  # worse
    bests = [d for d in os.listdir(tmp_path / "ck") if "model_best" in d]
    assert bests == ["model_best_IOU0.75_Derr0.01"], bests
    # resume metadata readable
    meta = mgr.load_meta()
    assert meta["epoch"] == 2


def test_hanet_pos_injection_changes_output(rng):
    """VERDICT #6 done-criterion: pos-injection measurably changes the
    HANet-gated head (previously the pos grids were never built)."""
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.models.hanet import (
        HANetConv,
        build_pos_grid,
    )

    x = jnp.asarray(rng.standard_normal((1, 32, 64, 64), dtype=np.float32))
    out = jnp.asarray(rng.standard_normal((1, 32, 64, 2), dtype=np.float32))
    pos = build_pos_grid(32, 64)
    m = HANetConv(out_channels=2, pooling="max", pos_rfactor=2)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, out, pos, train=False)
    gated_pos, _ = m.apply(v, x, out, pos, train=False)
    gated_nopos, _ = m.apply(v, x, out, None, train=False)
    assert not np.allclose(np.asarray(gated_pos), np.asarray(gated_nopos))

    # learned-embedding variant creates a pos_emb1d_2nd table
    m2 = HANetConv(out_channels=2, pooling="max", pos_rfactor=2,
                   is_encoding=0)
    v2 = m2.init({"params": jax.random.PRNGKey(0)}, x, out, pos, train=False)
    assert "pos_emb1d_2nd" in v2["params"]

    # pos_noise jitters the row index during training only
    m3 = HANetConv(out_channels=2, pooling="max", pos_rfactor=2,
                   pos_noise=2.0)
    v3 = m3.init({"params": jax.random.PRNGKey(0)}, x, out, pos, train=False)
    a, _ = m3.apply(v3, x, out, pos, train=True,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    b, _ = m3.apply(v3, x, out, pos, train=True,
                    rngs={"dropout": jax.random.PRNGKey(7)})
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_hanet_step_builds_pos(rng):
    """-hanet 1 end-to-end: the train step feeds pos grids to the model
    (netForward 'hanet' branch, torch_implementation.py:138-144)."""
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.models.hanet import (
        build_pos_grid,
    )

    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg.model.hanet = True
    cfg.loss.losses = ("cross_entropy",)
    assert cfg.model.output_type == "hanet"
    model = models.get_network(cfg)
    b, h, w, c = 1, 32, 64, 2
    labels = rng.integers(0, c, (b, h, w))
    batch = {
        "left": jnp.asarray(rng.standard_normal((b, h, w, 3), dtype=np.float32)),
        "right": jnp.asarray(rng.standard_normal((b, h, w, 3), dtype=np.float32)),
        "seg": jnp.asarray(np.eye(c, dtype=np.float32)[labels]),
        "disp": jnp.asarray(rng.random((b, h, w, 1), dtype=np.float32)),
        "edges": jnp.zeros((b, h, w, 1), jnp.float32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["left"], batch["right"], pos=build_pos_grid(h, w), train=False,
    )
    tx = build_optimizer(cfg.optim, cfg.model.net, 1, 5)
    state = TrainState.create(model.apply, variables["params"],
                              variables.get("batch_stats", {}), tx)
    step = make_train_step(cfg, model, mesh=None)
    state2, m = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))


def test_grad_accumulation_matches_big_batch(rng):
    """-acmt_grad 2: two accumulated half-batches == one big-batch step
    (under frozen BN so the forward is batch-composition independent)."""
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini"
    cfg.loss.losses = ("cross_entropy",)
    cfg.optim.freeze_bn = True
    model = models.get_network(cfg)
    b, h, w, c = 4, 32, 64, 2
    labels = rng.integers(0, c, (b, h, w))
    batch = {
        "left": rng.standard_normal((b, h, w, 3), dtype=np.float32),
        "right": rng.standard_normal((b, h, w, 3), dtype=np.float32),
        "seg": np.eye(c, dtype=np.float32)[labels],
        "disp": rng.random((b, h, w, 1), dtype=np.float32),
        "edges": np.zeros((b, h, w, 1), np.float32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    left = batch["left"][:1]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        left, left, train=False,
    )

    def mk_state(acc):
        cfg.optim.accumulate_grad = acc
        tx = build_optimizer(cfg.optim, cfg.model.net, 1, 5)
        # fresh buffer copies: the train step donates its input state
        params = jax.tree_util.tree_map(jnp.array, variables["params"])
        stats = jax.tree_util.tree_map(jnp.array,
                                       variables.get("batch_stats", {}))
        return TrainState.create(model.apply, params, stats, tx), tx

    key = jax.random.PRNGKey(3)
    # big batch, no accumulation
    s_big, _ = mk_state(1)
    step_big = make_train_step(cfg, model, mesh=None)
    s_big, _ = step_big(s_big, batch, key)

    # two half batches with accumulate_grad=2 (same dropout rng both times —
    # irrelevant here, dropout_prob=0)
    s_acc, _ = mk_state(2)
    p0 = jax.tree_util.tree_map(np.asarray, s_acc.params)
    step_acc = make_train_step(cfg, model, mesh=None)
    half1 = {k: v[:2] for k, v in batch.items()}
    half2 = {k: v[2:] for k, v in batch.items()}
    s_acc, _ = step_acc(s_acc, half1, key)
    # params must NOT move after the first micro-step
    for a, b_ in zip(jax.tree_util.tree_leaves(p0),
                     jax.tree_util.tree_leaves(s_acc.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    s_acc, _ = step_acc(s_acc, half2, key)

    # fp reassociation (mean-of-half-means vs full mean) amplified by adam's
    # grad normalization can flip the sign of isolated near-zero grads — a
    # systematic error (e.g. sum-instead-of-mean) would move MOST elements
    # by ~lr=1.5e-3, so bound the spread tightly for >99.9% of elements and
    # allow lr-scale outliers on the rest.
    for a, b_ in zip(jax.tree_util.tree_leaves(s_big.params),
                     jax.tree_util.tree_leaves(s_acc.params)):
        a, b_ = np.asarray(a), np.asarray(b_)
        close = np.isclose(a, b_, rtol=2e-4, atol=3e-4)
        assert close.mean() > 0.999, f"{1 - close.mean():.2%} mismatched"
        # a localized systematic bug would concentrate many lr-scale
        # outliers in one leaf — cap the absolute count per leaf, not just
        # the global fraction
        n_out = int((~close).sum())
        assert n_out <= max(2, a.size // 2000), (
            f"{n_out} lr-scale outliers in a leaf of {a.size} elements"
        )
        np.testing.assert_allclose(a, b_, rtol=1.0, atol=4e-3)
    cfg.optim.accumulate_grad = 1


def test_hdf5_source_single_normalization(tmp_path):
    """hdf5 source normalizes images exactly once (fixes the reference's
    double-/255, utilTorchDataLoader.py:140 vs :256)."""
    h5py = pytest.importorskip("h5py")
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.data.datasets import (
        StereoSegDataset,
    )

    h, w = 16, 24
    rng = np.random.default_rng(0)
    left = rng.integers(0, 255, (2, h, w, 3), np.uint8)
    seg = np.eye(2, dtype=np.float32)[rng.integers(0, 2, (2, h, w))]
    disp = rng.random((2, h, w)).astype(np.float32)
    path = str(tmp_path / "tiny.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("left", data=left)
        f.create_dataset("right", data=left)
        f.create_dataset("seg", data=seg)
        f.create_dataset("disp", data=disp)

    ds = StereoSegDataset(
        x_files=[], y_files=[], dataset_name="roses", n_labels=2,
        output_activation="linear", max_d=100.0,
        normalize=(np.zeros(3, np.float32), np.ones(3, np.float32)),
        hdf5=path,
    )
    assert len(ds) == 2
    s = ds[0]
    np.testing.assert_allclose(
        s["left"], left[0].astype(np.float32) / 255.0, atol=1e-6
    )
    assert s["disp"].shape == (h, w, 1)
    # edges mirror the disp dataset (reference quirk, :144)
    np.testing.assert_allclose(s["edges"][..., 0], disp[0])


def test_eval_step_slide_window_wiring(rng):
    """-slide_window reaches the eval step (VERDICT #10): tiled forward
    feeds the same per-row metric pack."""
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.training import (
        make_eval_step,
    )

    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini"
    cfg.run.slide_window = 1
    model = models.get_network(cfg)
    b, h, w, c = 1, 32, 64, 2
    labels = rng.integers(0, c, (b, h, w))
    batch = {
        "left": jnp.asarray(rng.standard_normal((b, h, w, 3), dtype=np.float32)),
        "right": jnp.asarray(rng.standard_normal((b, h, w, 3), dtype=np.float32)),
        "seg": jnp.asarray(np.eye(c, dtype=np.float32)[labels]),
        "disp": jnp.asarray(rng.random((b, h, w, 1), dtype=np.float32)),
        "edges": jnp.zeros((b, h, w, 1), jnp.float32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["left"], batch["right"], train=False,
    )
    ev = make_eval_step(cfg, model, mesh=None)
    out, m = ev(variables["params"], variables.get("batch_stats", {}),
                batch, jax.random.PRNGKey(0))
    assert out["seg1"].shape == (b, h, w, c)
    assert np.isfinite(np.asarray(m["loss"])).all()


def test_eval_step_tta_wiring(rng):
    """-tta 1 reaches the eval step for the mono deeplab net."""
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.training import (
        make_eval_step,
    )

    cfg = PMTConfig()
    cfg.model.net = "deeplab"
    cfg.data.dataset_name = "cityscapes"
    cfg.run.tta = True
    model = models.get_network(cfg)
    b, h, w, n = 1, 32, 64, 19
    labels = rng.integers(0, n, (b, h, w))
    batch = {
        "left": jnp.asarray(rng.standard_normal((b, h, w, 3), dtype=np.float32)),
        "right": jnp.asarray(rng.standard_normal((b, h, w, 3), dtype=np.float32)),
        "seg": jnp.asarray(np.eye(n + 1, dtype=np.float32)[labels]),
        "disp": jnp.asarray(rng.random((b, h, w, 1), dtype=np.float32)),
        "edges": jnp.zeros((b, h, w, 1), jnp.float32),
    }
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.models.deeplab import (
        deeplab_preprocess,
    )

    lp, rp, _ = deeplab_preprocess(batch["left"], batch["right"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        lp, rp, train=False,
    )
    ev = make_eval_step(cfg, model, mesh=None)
    out, m = ev(variables["params"], variables.get("batch_stats", {}),
                batch, jax.random.PRNGKey(0))
    assert out["seg1"].shape == (b, h, w, n)
    assert np.isfinite(np.asarray(m["pixel_acc1"])).all()
