"""Optimizers and LR schedules.

Mirrors torch_implementation.py:715-724 (SGD lr .005 / momentum .9 / wd 1e-4,
Adam eps 1e-7 with the net/loss-count-dependent lr rule) and the SGD poly
schedule (adjust_learning_rate, :599-609: lr = base * (1 - T/N), horizon
2400 epochs).
"""
from __future__ import annotations

from typing import Optional

import optax

from ..core.config import OptimConfig


def poly_schedule(base_lr: float, steps_per_epoch: int, epoch_horizon: int = 2400):
    """lr(step) = base_lr * (1 - step / (horizon*steps_per_epoch)), clamped
    at the final step like the reference (torch_implementation.py:605-606)."""
    total = max(1, epoch_horizon * steps_per_epoch)

    def sched(step):
        t = optax.safe_int32_increment(step) - 1
        import jax.numpy as jnp

        t = jnp.minimum(t, total - 1)
        return base_lr * (1.0 - t / float(total))

    return sched


def build_optimizer(
    cfg: OptimConfig,
    net: str,
    n_losses: int,
    steps_per_epoch: int = 1,
) -> optax.GradientTransformation:
    if cfg.optim_type == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(cfg.sgd_weight_decay),
            optax.sgd(
                learning_rate=poly_schedule(
                    cfg.poly_base_lr, steps_per_epoch, cfg.poly_epoch_horizon
                ),
                momentum=cfg.sgd_momentum,
            ),
        )
    else:
        lr = cfg.resolve_lr(net, n_losses)
        tx = optax.adam(lr, eps=cfg.adam_eps)
    if cfg.accumulate_grad > 1:
        # replaces the reference's loss/acmt_grad + step-every-N logic
        # (torch_implementation.py:362, 390-397)
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulate_grad)
    return tx
