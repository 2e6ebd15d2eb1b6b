"""SPMD train/eval step functions.

TPU-native replacement for the reference's per-batch host loop
(networkOutput, torch_implementation.py:235-330 + train_model :333-401):
one jitted step containing forward, the full configured loss stack,
backward, the gradient all-reduce, optimizer update AND on-device metrics —
zero host synchronization per step.

Data parallelism: the step is wrapped in ``shard_map`` over the mesh's
``data`` axis. The batch arrives sharded on dim 0; gradients and metric
sums are reduced with ``lax.pmean``/``psum`` over ICI — the SPMD equivalent
of DDP's NCCL allreduce (torch_implementation.py:741). Cross-replica
BatchNorm falls out of passing ``axis_name='data'`` to the model's BN
layers (replaces sync_batchnorm/ entirely).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.config import PMTConfig
from ..losses.dispatch import compose_disp_loss, compose_seg_loss
from ..losses.disp import photo_consistency
from ..losses.edge import balanced_edge_bce
from ..metrics.dispmetrics import disp_metrics
from ..metrics.segmetrics import seg_batch_metrics
from ..parallel.mesh import DATA_AXIS
from .state import TrainState

# outputTypes whose head-2 metrics/losses just mirror head 1
_SINGLE_HEAD = ("smallOutPair", "deeplab", "edgeOut", "pspnet")


def _model_inputs(cfg: PMTConfig, batch: Dict[str, jnp.ndarray]):
    """Assemble model inputs per outputType (netForward,
    torch_implementation.py:118-152)."""
    left = batch["left"]
    right = batch["right"]
    kwargs: Dict[str, Any] = {}
    if cfg.model.edges:
        left = jnp.concatenate([left, batch["edges"]], axis=-1)
        right = jnp.concatenate([right, batch["edges"]], axis=-1)
    ot = cfg.model.output_type
    if ot == "multitask":
        kwargs["disp_gt"] = batch["disp"]
        kwargs["seg_labels"] = jnp.argmax(batch["seg"], axis=-1)
    if ot == "ThreeOutPutsDisp":
        kwargs["disp_gt"] = batch["disp"]
    if ot == "edgeOut":
        # the grad-mag edge map is a model input for the edge nets
        # (netForward, torch_implementation.py:135-137; normalize=False)
        from ..ops.edges import compute_grad_mag

        kwargs["left_e"] = compute_grad_mag(batch["left"], normalize=False)
    if ot in ("deeplab", "deeplab_mod"):
        # scale to [-1,1] and pad by 1 (netForward,
        # torch_implementation.py:123-131)
        from ..models.deeplab import deeplab_preprocess

        left, right, _ = deeplab_preprocess(left, right)
    return left, right, kwargs


def _postprocess_outputs(cfg: PMTConfig, out, batch):
    """The head fix-ups netForward applies after the model
    (torch_implementation.py:157-179)."""
    ot = cfg.model.output_type
    if ot in ("deeplab", "deeplab_mod"):
        from ..models.deeplab import deeplab_postprocess

        hw = (batch["left"].shape[1], batch["left"].shape[2])
        out = dict(out)
        for k in ("seg1", "seg2", "disp1", "disp2"):
            if out.get(k) is not None:
                out[k] = deeplab_postprocess(out[k], hw)
    if ot == "deeplab":
        out = dict(out)
        # mono net: disparity faked with GT (torch_implementation.py:159-162)
        out["disp1"] = out["disp2"] = jax.lax.stop_gradient(batch["disp"])
        out["seg2"] = out["seg1"]
    if ot == "pspnet":
        out = dict(out)
        # disp-only net: seg heads faked with GT (:167-169)
        n_fg = cfg.data.n_labels
        out["seg1"] = out["seg2"] = jax.lax.stop_gradient(
            batch["seg"][..., :n_fg]
        )
    return out


def make_loss_fn(cfg: PMTConfig, model):
    """Returns loss_fn(params, batch_stats, batch, rng, train) ->
    (loss, (new_batch_stats, outputs, logs))."""
    d = cfg.data
    ot = cfg.model.output_type
    head1_loss = compose_seg_loss(["cross_entropy"], d.dataset_name, d.n_labels,
                                  cfg.loss.seg_weight)
    head2_loss = compose_seg_loss(cfg.loss.losses, d.dataset_name, d.n_labels,
                                  cfg.loss.seg_weight)
    dsp_loss = compose_disp_loss(cfg.loss.losses, d.dataset_name, ot)

    bf16 = cfg.parallel.bf16

    def _cast_bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree
        )

    def _cast_f32(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x, tree
        )

    def loss_fn(params, batch_stats, batch, rng, train: bool = True):
        left, right, kwargs = _model_inputs(cfg, batch)
        if bf16:
            # mixed precision: fp32 master params, bf16 compute (the apex/amp
            # replacement, torch_implementation.py:726-736 — no loss scaler
            # needed, bf16 has fp32's exponent range). Gradients come back
            # fp32 through the cast's transpose.
            left, right = _cast_bf16(left), _cast_bf16(right)
            kwargs = _cast_bf16(kwargs)
            apply_params = _cast_bf16(params)
            apply_stats = _cast_bf16(batch_stats)
        else:
            apply_params, apply_stats = params, batch_stats
        variables = {"params": apply_params, "batch_stats": apply_stats}
        rngs = {"dropout": rng}
        # -freeze_bn, and the deeplab rule: train with BatchNorm in eval
        # mode (torch_implementation.py:236-241, 337-340)
        if cfg.optim.freeze_bn or ot == "deeplab":
            train = False
        if train:
            out, mut = model.apply(
                variables, left, right, train=True,
                mutable=["batch_stats"], rngs=rngs, **kwargs,
            )
            new_stats = mut["batch_stats"]
            if bf16:
                new_stats = _cast_f32(new_stats)
        else:
            out = model.apply(variables, left, right, train=False,
                              rngs=rngs, **kwargs)
            new_stats = batch_stats
        if bf16:
            out = _cast_f32(out)  # losses + metrics stay fp32
        out = _postprocess_outputs(cfg, out, batch)
        seg_full = batch["seg"]
        disp_gt = batch["disp"]
        logs: Dict[str, jnp.ndarray] = {}

        if ot == "multitask":
            mt_d, mt_s1, mt_s2 = out["mt"]
            loss_seg = jnp.mean(mt_s1) + jnp.mean(mt_s2)
            loss_disp = jnp.mean(mt_d)
        else:
            key1, key2 = jax.random.split(rng)
            l1 = head1_loss(out["seg1"], seg_full, key1)
            loss_seg = l1
            if ot not in _SINGLE_HEAD:
                l2 = head2_loss(out["seg2"], seg_full, key2)
                loss_seg = loss_seg + l2
            if ot in ("ThreeOutPuts", "ThreeOutPutsDisp",
                      "ThreeOutPutsDispConsist") and out.get("seg3") is not None:
                loss_seg = loss_seg + head1_loss(out["seg3"], seg_full, key2)
            loss_disp = dsp_loss(batch["left"], seg_full, disp_gt, out["disp1"])
            if ot in ("smallOutWarp", "ThreeOutPutsDispConsist"):
                # L1 zeroed, photo-consistency instead
                # (torch_implementation.py:314-317)
                loss_disp = loss_disp * 0.0 + photo_consistency(
                    out["warped_right"], batch["left"]
                )

        loss = loss_seg + loss_disp
        if ot == "edgeOut" and out.get("edge") is not None:
            loss = loss + balanced_edge_bce(out["edge"], batch["edges"])
        logs["loss"] = loss
        logs["loss_seg"] = loss_seg
        logs["loss_disp"] = loss_disp
        return loss, (new_stats, out, logs)

    return loss_fn


def compute_metrics(cfg: PMTConfig, out, batch) -> Dict[str, jnp.ndarray]:
    """On-device metric pack for both heads + disparity (replaces the
    numpy/sklearn round trips in multiLosses.py:119-154)."""
    n = cfg.data.n_labels
    m1 = seg_batch_metrics(out["seg1"], batch["seg"], n)
    m2 = seg_batch_metrics(out["seg2"], batch["seg"], n)
    use_mask = cfg.data.dataset_name not in ("garden", "roses")
    dm = disp_metrics(out["disp1"], batch["disp"], batch["seg"],
                      cfg.model.max_disp, mask_invalid=use_mask)
    return {
        "pixel_acc1": m1.pixel_acc, "pixel_acc2": m2.pixel_acc,
        "conf1": m1.confusion, "conf2": m2.confusion,
        "prec2": m2.precision, "recall2": m2.recall,
        "f1_2": m2.f1, "bf1_2": m2.branch_f1,
        "disp_err3px": dm.err_gt3px, "disp_valid": dm.valid_px,
        "disp_rmse": dm.rmse, "disp_sqrel": dm.sq_rel,
        "disp_brmse": dm.branch_rmse, "disp_bsqrel": dm.branch_sq_rel,
    }


_SUM_METRICS = ("conf1", "conf2", "disp_err3px", "disp_valid")


def make_train_step(cfg: PMTConfig, model, mesh: Optional[Mesh] = None):
    """Build the jitted SPMD train step.

    With a mesh: shard_map over ('data',) — batch sharded, state replicated,
    grads pmean'd. Without: plain jit (single device)."""
    loss_fn = make_loss_fn(cfg, model)

    def _step(state: TrainState, batch, rng):
        if mesh is not None:
            # per-shard dropout/augment streams
            rng = jax.random.fold_in(rng, lax.axis_index(DATA_AXIS))
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (new_stats, out, logs)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng, True
        )
        if cfg.optim.freeze_bn:
            # the reference also stops BN affine gradients
            # (networkOutput, torch_implementation.py:236-241)
            grads = jax.tree_util.tree_map_with_path(
                lambda path, g: jnp.zeros_like(g)
                if any("bn" in str(k).lower() or "norm" in str(k).lower()
                       for k in path)
                else g,
                grads,
            )
        metrics = compute_metrics(cfg, out, batch)
        metrics.update(logs)
        if mesh is not None:
            grads = lax.pmean(grads, DATA_AXIS)
            new_stats = lax.pmean(new_stats, DATA_AXIS)
            metrics = {
                k: (lax.psum(v, DATA_AXIS) if k in _SUM_METRICS
                    else lax.pmean(v, DATA_AXIS))
                for k, v in metrics.items()
            }
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=new_stats)
        return state, metrics

    if mesh is None:
        return jax.jit(_step, donate_argnums=(0,))

    state_spec = P()  # replicated
    step = shard_map(
        _step,
        mesh=mesh,
        in_specs=(state_spec, P(DATA_AXIS), state_spec),
        out_specs=(state_spec, state_spec),
        check_rep=False,
    )
    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(cfg: PMTConfig, model, mesh: Optional[Mesh] = None):
    loss_fn = make_loss_fn(cfg, model)

    def _step(params, batch_stats, batch, rng):
        loss, (_, out, logs) = loss_fn(params, batch_stats, batch, rng, False)
        metrics = compute_metrics(cfg, out, batch)
        metrics.update(logs)
        if mesh is not None:
            metrics = {
                k: (lax.psum(v, DATA_AXIS) if k in _SUM_METRICS
                    else lax.pmean(v, DATA_AXIS))
                for k, v in metrics.items()
            }
        return out, metrics

    if mesh is None:
        return jax.jit(_step)

    step = shard_map(
        _step,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P()),
        out_specs=(P(DATA_AXIS), P()),
        check_rep=False,
    )
    return jax.jit(step)
