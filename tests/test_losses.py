"""Loss parity tests vs the torch reference (used as a CPU oracle)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pmt_learning_for_semantic_segmentation_and_disparity_tpu import losses

from reference_oracle import load_reference

load_reference()


def _to_torch_nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def _rand_case(rng, b=2, h=8, w=12, c=3):
    logits = rng.standard_normal((b, h, w, c), dtype=np.float32)
    labels = rng.integers(0, c, (b, h, w))
    gt = np.eye(c, dtype=np.float32)[labels]
    return logits, labels, gt


def test_categorical_cross_entropy_parity(rng):
    from util.utilTorchLoss import categoricalCrossEntropy

    logits, _, gt = _rand_case(rng)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    ref = categoricalCrossEntropy(_to_torch_nchw(logp), _to_torch_nchw(gt)).item()
    got = float(losses.categorical_cross_entropy(jnp.asarray(logp), jnp.asarray(gt)))
    assert abs(got - ref) < 1e-5

    w = np.array([1.0, 2.0, 0.5], np.float32)
    ref_w = categoricalCrossEntropy(
        _to_torch_nchw(logp), _to_torch_nchw(gt), torch.from_numpy(w.reshape(1, 3, 1, 1))
    ).item()
    got_w = float(
        losses.categorical_cross_entropy(jnp.asarray(logp), jnp.asarray(gt), jnp.asarray(w))
    )
    assert abs(got_w - ref_w) < 1e-5


def test_tversky_loss2_parity(rng):
    from util.utilTorchLoss import tversky_loss2

    logits, _, gt = _rand_case(rng)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    w = np.ones((3,), np.float32)
    ref = tversky_loss2(
        _to_torch_nchw(probs), _to_torch_nchw(gt), torch.from_numpy(w.reshape(1, 3, 1, 1))
    ).item()
    got = float(losses.tversky_loss2(jnp.asarray(probs), jnp.asarray(gt), jnp.asarray(w)))
    assert abs(got - ref) < 1e-5


def test_dice_loss_parity(rng):
    from util.utilTorchLoss import dice_loss

    logits, _, gt = _rand_case(rng)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    ref = dice_loss(_to_torch_nchw(logp), _to_torch_nchw(gt)).item()
    got = float(losses.dice_loss(jnp.asarray(logp), jnp.asarray(gt)))
    assert abs(got - ref) < 1e-5


def test_dice_entropy_parity(rng):
    from util.utilTorchLoss import diceEntropy

    logits, _, gt = _rand_case(rng)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    ref = diceEntropy(_to_torch_nchw(logp), _to_torch_nchw(gt)).item()
    got = float(losses.dice_entropy(jnp.asarray(logp), jnp.asarray(gt)))
    assert abs(got - ref) < 1e-4


def test_area_ce_loss_parity(rng):
    from util.utilTorchLoss import area_ce_loss

    logits, _, gt = _rand_case(rng, h=12, w=12)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    for dim in (5, 7):
        ref = area_ce_loss(_to_torch_nchw(logp), _to_torch_nchw(gt), area_dim=dim).item()
        got = float(losses.area_ce_loss(jnp.asarray(logp), jnp.asarray(gt), area_dim=dim))
        assert abs(got - ref) < 1e-4, dim


def test_area_hinge_loss_parity(rng):
    from util.utilTorchLoss import area_hinge_loss

    logits, _, gt = _rand_case(rng, h=12, w=12)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    ref = area_hinge_loss(_to_torch_nchw(logp), _to_torch_nchw(gt)).item()
    got = float(losses.area_hinge_loss(jnp.asarray(logp), jnp.asarray(gt)))
    assert abs(got - ref) < 1e-5


def test_binary_ce_parity(rng):
    from util.utilTorchLoss import binaryCE

    logits, _, gt = _rand_case(rng)
    probs = 1.0 / (1.0 + np.exp(-logits))
    ref = binaryCE(_to_torch_nchw(probs), _to_torch_nchw(gt)).item()
    got = float(losses.binary_ce(jnp.asarray(probs), jnp.asarray(gt)))
    assert abs(got - ref) < 1e-5


def test_lovasz_softmax_parity(rng):
    from util.lovasz_losses import lovasz_softmax as ref_lovasz

    logits, labels, _ = _rand_case(rng, c=4)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    ref = ref_lovasz(
        _to_torch_nchw(probs), torch.from_numpy(labels.astype(np.int64))
    ).item()
    got = float(losses.lovasz_softmax(jnp.asarray(probs), jnp.asarray(labels)))
    assert abs(got - ref) < 1e-5


def test_lovasz_softmax_with_ignore_parity(rng):
    from util.lovasz_losses import lovasz_softmax as ref_lovasz

    b, h, w, c = 2, 8, 10, 4
    logits = rng.standard_normal((b, h, w, c), dtype=np.float32)
    labels = rng.integers(0, c + 1, (b, h, w))  # c == ignore sometimes
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    ref = ref_lovasz(
        _to_torch_nchw(probs), torch.from_numpy(labels.astype(np.int64)), ignore=c
    ).item()
    got = float(losses.lovasz_softmax(jnp.asarray(probs), jnp.asarray(labels), ignore=c))
    assert abs(got - ref) < 1e-5


def test_lovasz_absent_class_parity(rng):
    from util.lovasz_losses import lovasz_softmax as ref_lovasz

    b, h, w, c = 1, 6, 6, 3
    logits = rng.standard_normal((b, h, w, c), dtype=np.float32)
    labels = np.zeros((b, h, w), np.int64)  # classes 1,2 absent
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    ref = ref_lovasz(_to_torch_nchw(probs), torch.from_numpy(labels)).item()
    got = float(losses.lovasz_softmax(jnp.asarray(probs), jnp.asarray(labels)))
    assert abs(got - ref) < 1e-5


def test_ohem_parity(rng):
    from losses.ohm_loss import OhemCrossEntropy2d

    b, h, w, c = 2, 8, 10, 5
    logits = rng.standard_normal((b, h, w, c), dtype=np.float32) * 3
    labels = rng.integers(0, c, (b, h, w))
    # sprinkle ignore pixels (index 19 used by reference; use c-1 < 19 here is
    # wrong — the reference hardcodes 19, so only test without real ignores
    # plus a separate case with ignore_index == 4)
    ref_mod = OhemCrossEntropy2d(ignore_index=4)
    ref = ref_mod(
        _to_torch_nchw(logits), torch.from_numpy(labels.astype(np.int64))
    ).item()
    got = float(
        losses.ohem_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), ignore_index=4
        )
    )
    assert abs(got - ref) < 1e-4


def test_multi_tversky_forward_parity(rng):
    from TverskyLoss.multitverskyloss import MultiTverskyLoss

    b, h, w, c = 2, 8, 8, 3
    logits = rng.standard_normal((b, h, w, c), dtype=np.float32)
    labels = rng.integers(0, c, (b, h, w))
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    ref_mod = MultiTverskyLoss(alpha=0.7, beta=0.3, gamma=3 / 4)
    ref = ref_mod(
        _to_torch_nchw(probs), torch.from_numpy(labels.astype(np.int64))
    ).item()
    got = float(losses.multi_tversky_loss(jnp.asarray(probs), jnp.asarray(labels)))
    assert abs(got - ref) < 1e-5


def test_multi_tversky_backward_parity(rng):
    from TverskyLoss.multitverskyloss import MultiTverskyLoss

    b, h, w, c = 1, 6, 6, 2
    logits = rng.standard_normal((b, h, w, c), dtype=np.float32)
    labels = rng.integers(0, c, (b, h, w))
    probs_t = torch.from_numpy(
        np.transpose(
            np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1)), (0, 3, 1, 2)
        )
    ).requires_grad_(True)
    ref_mod = MultiTverskyLoss(alpha=0.7, beta=0.3, gamma=3 / 4)
    ref_loss = ref_mod(probs_t, torch.from_numpy(labels.astype(np.int64)))
    ref_loss.backward()
    ref_grad = probs_t.grad.numpy().transpose(0, 2, 3, 1)

    probs_j = jnp.asarray(np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1)))
    got_grad = np.asarray(
        jax.grad(lambda p: losses.multi_tversky_loss(p, jnp.asarray(labels)))(probs_j)
    )
    np.testing.assert_allclose(got_grad, ref_grad, rtol=1e-4, atol=1e-6)


def test_smoothing_gradients_parity(rng):
    from util.utilTorchLoss import smoothing_gradients as ref_smooth

    b, h, w, c = 1, 10, 12, 3
    left = rng.random((b, h, w, 3)).astype(np.float32)
    disp = rng.random((b, h, w, 1)).astype(np.float32) * 50
    labels = rng.integers(0, c, (b, h, w))
    seg = np.eye(c, dtype=np.float32)[labels]
    ref = ref_smooth(
        _to_torch_nchw(left), _to_torch_nchw(disp), _to_torch_nchw(seg)
    ).item()
    got = float(
        losses.smoothing_gradients(jnp.asarray(left), jnp.asarray(disp), jnp.asarray(seg))
    )
    assert abs(got - ref) < 1e-4


def test_balanced_edge_bce_parity(rng):
    # literal torch transcription of lossEdge_fn (multiLosses.py:166-182);
    # importing the module itself needs torchvision, absent in this image.
    import torch.nn.functional as F

    b, h, w = 2, 8, 8
    edges = (rng.random((b, 1, h, w)) > 0.8).astype(np.float32)
    pred = rng.standard_normal((b, 1, h, w)).astype(np.float32)
    e_t, p_t = torch.from_numpy(edges), torch.from_numpy(pred)
    pos = (e_t == 1).sum().item()
    neg = (e_t == 0).sum().item()
    weight = torch.where(
        e_t == 1, torch.tensor(neg / (pos + neg)), torch.tensor(pos / (pos + neg))
    )
    ref = F.binary_cross_entropy_with_logits(p_t, e_t, weight).item()
    got = float(
        losses.balanced_edge_bce(
            jnp.asarray(np.transpose(pred, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(edges, (0, 2, 3, 1))),
        )
    )
    assert abs(got - ref) < 1e-5


def test_masked_l1():
    p = jnp.asarray(np.array([[1.0, 2.0], [3.0, 4.0]], np.float32))
    g = jnp.asarray(np.array([[1.5, 0.0], [2.0, 4.0]], np.float32))
    assert abs(float(losses.masked_l1(p, g)) - np.mean([0.5, 2.0, 1.0, 0.0])) < 1e-6
    got = float(losses.masked_l1(p, g, mask=g > 0))
    assert abs(got - np.mean([0.5, 0.0, 1.0, 0.0])) < 1e-6


def test_composed_flagship_loss_runs(rng):
    """The canonical config: cross_entropy + lovasz on roses (2 classes)."""
    fn = losses.compose_seg_loss(
        ["cross_entropy", "lovasz_loss"], "roses", 2, seg_weight=True
    )
    logits = jnp.asarray(rng.standard_normal((2, 16, 16, 2), dtype=np.float32))
    labels = rng.integers(0, 2, (2, 16, 16))
    gt = jnp.asarray(np.eye(2, dtype=np.float32)[labels])
    val = jax.jit(fn)(logits, gt)
    assert np.isfinite(float(val))

    # parity with the reference composition for this config
    from util.utilTorchLoss import categoricalCrossEntropy
    from util.lovasz_losses import lovasz_softmax as ref_lovasz

    logp = jax.nn.log_softmax(logits, axis=-1)
    w = torch.ones(1, 2, 1, 1)
    ref = (
        categoricalCrossEntropy(
            _to_torch_nchw(np.asarray(logp)), _to_torch_nchw(np.asarray(gt)), w
        )
        + ref_lovasz(
            _to_torch_nchw(np.asarray(jax.nn.softmax(logits, -1))),
            torch.from_numpy(labels.astype(np.int64)),
        )
    ).item()
    assert abs(float(val) - ref) < 1e-4


def test_multitask_loss_matches_torch(rng):
    b, h, w, c = 1, 6, 6, 4
    disp = rng.standard_normal((b, h, w, 1), dtype=np.float32)
    disp_gt = rng.standard_normal((b, h, w, 1), dtype=np.float32)
    seg_logits = rng.standard_normal((b, h, w, c), dtype=np.float32)
    labels = rng.integers(0, c, (b, h, w))
    lvd, lv1, lv2 = 0.3, -0.2, 0.1

    ld, l1, l2 = losses.multitask_loss(
        jnp.asarray(lvd), jnp.asarray(lv1), jnp.asarray(lv2),
        jnp.asarray(disp), jnp.asarray(disp_gt),
        jnp.asarray(seg_logits), jnp.asarray(seg_logits), jnp.asarray(labels),
        ignore_index=19,
    )
    import torch.nn.functional as F

    t_ld = (
        torch.exp(torch.tensor(-lvd))
        * F.l1_loss(
            torch.from_numpy(disp), torch.from_numpy(disp_gt), reduction="none"
        )
        + lvd
    )
    t_l1 = (
        torch.exp(torch.tensor(-lv1))
        * F.cross_entropy(
            _to_torch_nchw(seg_logits),
            torch.from_numpy(labels.astype(np.int64)),
            ignore_index=19,
            reduction="none",
        )
        + lv1
    )
    assert abs(float(jnp.mean(ld)) - t_ld.mean().item()) < 1e-5
    assert abs(float(jnp.mean(l1)) - t_l1.mean().item()) < 1e-5


def test_all_loss_compositions_differentiable(rng):
    """Every -loss keyword composes into a finite, differentiable loss."""
    import itertools

    configs = [
        ("cross_entropy",), ("lovasz_loss",), ("binary_ce",),
        ("cross_entropy", "area_ce"), ("area_hinge",), ("dice_loss",),
        ("diceEntropy",), ("tversky_loss2",),
        ("tversky_loss",), ("ohm_loss", "cross_entropy"),
        ("dual_edge_reg", "cross_entropy"),
    ]
    b, h, w, c = 1, 16, 16, 4
    logits = jnp.asarray(rng.standard_normal((b, h, w, c), dtype=np.float32))
    labels = rng.integers(0, c + 1, (b, h, w))  # includes ignore channel
    gt_full = jnp.asarray(np.eye(c + 1, dtype=np.float32)[labels])
    key = jax.random.PRNGKey(0)
    for losses_cfg in configs:
        fn = losses.compose_seg_loss(losses_cfg, "cityscapes", c,
                                     seg_weight=False)
        val, grad = jax.value_and_grad(
            lambda lg: fn(lg, gt_full, key)
        )(logits)
        assert np.isfinite(float(val)), losses_cfg
        assert np.isfinite(np.asarray(grad)).all(), losses_cfg


def test_categorical_nll_composition_19class(rng):
    # categoricalNlll hardcodes ignore_index=19 (utilTorchLoss.py:393-404) —
    # only meaningful for the 19-class datasets
    c = 19
    logits = jnp.asarray(rng.standard_normal((1, 8, 8, c), dtype=np.float32))
    labels = rng.integers(0, c + 1, (1, 8, 8))
    gt_full = jnp.asarray(np.eye(c + 1, dtype=np.float32)[labels])
    fn = losses.compose_seg_loss(("categoricalNlll",), "cityscapes", c)
    val, grad = jax.value_and_grad(lambda lg: fn(lg, gt_full))(logits)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()


def test_ohem_min_kept_parity(rng):
    from losses.ohm_loss import OhemCrossEntropy2d

    b, h, w, c = 1, 8, 8, 5
    logits = rng.standard_normal((b, h, w, c), dtype=np.float32) * 5
    labels = rng.integers(0, c, (b, h, w))
    ref_mod = OhemCrossEntropy2d(ignore_index=4, min_kept=30)
    ref = ref_mod(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels.astype(np.int64)),
    ).item()
    got = float(
        losses.ohem_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), min_kept=30,
            ignore_index=4,
        )
    )
    assert abs(got - ref) < 1e-4


def test_kth_smallest_radix_select_matches_sort():
    """kth_smallest must return exactly jnp.sort(x)[k-1] — incl. negatives,
    zeros, inf padding and duplicate values (the OHEM min_kept path)."""
    import jax.numpy as jnp
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.losses.ohem import (
        kth_smallest,
    )

    rng = np.random.default_rng(0)
    x = rng.standard_normal(10_000).astype(np.float32)
    x[:100] = np.inf
    x[100:200] = 0.0
    x[200:300] = -0.0
    x[300:400] = x[400:500]  # duplicates
    xs = np.sort(x)
    xj = jnp.asarray(x)
    for k in (1, 2, 99, 100, 150, 5000, 9999, 10_000):
        got = float(kth_smallest(xj, k))
        want = float(xs[k - 1])
        assert got == want or (np.isinf(got) and np.isinf(want)), (k, got, want)


def test_lovasz_custom_vjp_grad_matches_native_sort_ad():
    """_sorted_errors' unsort-by-second-sort backward must equal jax's
    native sort AD (scatter-based) exactly — C=2 fast path, general C>2
    path and the hinge all route through it."""
    import jax
    import jax.numpy as jnp
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.losses import (
        lovasz,
    )

    rng = np.random.default_rng(7)

    def native(err, pay, dim):
        return jax.lax.sort((-err, pay), dimension=dim, is_stable=False,
                            num_keys=1)

    # 1-D (the C=2 / hinge shape) with duplicate keys
    err = jnp.asarray(rng.random(4096).astype(np.float32))
    err = err.at[:512].set(err[512:1024])  # ties
    pay = jnp.asarray((rng.random(4096) < 0.3).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(4096).astype(np.float32))

    f_new = lambda e: jnp.sum(lovasz._sorted_errors(e, pay)[0] * w)
    f_ref = lambda e: jnp.sum(native(e, pay, 0)[0] * w)
    v_new, g_new = jax.value_and_grad(f_new)(err)
    v_ref, g_ref = jax.value_and_grad(f_ref)(err)
    assert float(v_new) == float(v_ref)
    # ties make the PERMUTATION ambiguous but the weighted-sum gradient of
    # tied keys is interchangeable only if w treats them alike — compare
    # sums over tied groups instead of elementwise there; untied elements
    # must match exactly. Simplest exact check: sort both grads.
    np.testing.assert_allclose(np.sort(np.asarray(g_new)),
                               np.sort(np.asarray(g_ref)), rtol=0, atol=0)
    # and the actual loss gradients agree end-to-end where keys are unique
    err_u = jnp.asarray(np.linspace(0, 1, 2048).astype(np.float32))
    err_u = err_u[jnp.asarray(rng.permutation(2048))]
    g1 = jax.grad(lambda e: jnp.sum(lovasz._sorted_errors(e, pay[:2048])[0]
                                    * w[:2048]))(err_u)
    g2 = jax.grad(lambda e: jnp.sum(native(e, pay[:2048], 0)[0]
                                    * w[:2048]))(err_u)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))

    # batched (C,N) general path through the full loss
    probs = rng.random((2, 8, 10, 5)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    labels = rng.integers(0, 5, (2, 8, 10))
    g = jax.grad(lambda p: lovasz.lovasz_softmax(p, jnp.asarray(labels)))(
        jnp.asarray(probs))
    assert np.all(np.isfinite(np.asarray(g)))
