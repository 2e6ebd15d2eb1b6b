"""Checkpointing via orbax.

Replaces the reference's pickled .pth.tar monoliths + by-name partial
restore (save_checkpoint torch_implementation.py:52-66,
utilTorch_loadweight.py:6-115) with an orbax CheckpointManager over the
train-state pytree plus a JSON sidecar of config + metric histories.
Best-checkpoint selection keys on head-2 val IoU like the reference
(torch_implementation.py:915-934).
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self.best_iou = -1.0
        self._best_artifact = None
        best_json = os.path.join(self.directory, "best.json")
        if os.path.exists(best_json):
            with open(best_json) as f:
                best = json.load(f)
            self.best_iou = float(best.get("iou", -1.0))
            self._best_artifact = best.get("artifact")

    def save(self, step: int, state: TrainState,
             extra: Optional[Dict[str, Any]] = None,
             val_iou: Optional[float] = None,
             val_derr: Optional[float] = None):
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        if extra is not None:
            with open(os.path.join(self.directory, f"meta_{step}.json"), "w") as f:
                json.dump(extra, f, default=_np_default)
        self._mgr.wait_until_finished()
        if val_iou is not None and val_iou > self.best_iou:
            self.best_iou = val_iou
            self._save_best_artifact(step, val_iou, val_derr or 0.0)

    def _save_best_artifact(self, step: int, iou: float, derr: float):
        """Keep exactly ONE `*_model_best_IOU{x}_Derr{y}` copy of the best
        checkpoint, deleting the previous best — the reference's
        save_checkpoint naming scheme (torch_implementation.py:52-66),
        rounded to 4 decimals like the reference."""
        name = f"model_best_IOU{round(float(iou), 4)}_Derr{round(float(derr), 4)}"
        path = os.path.join(self.directory, name)
        if self._best_artifact:
            old = os.path.join(self.directory, self._best_artifact)
            if os.path.isdir(old):
                shutil.rmtree(old)
        src = os.path.join(self.directory, str(step))
        if os.path.isdir(src):
            shutil.copytree(src, path, dirs_exist_ok=True)
        self._best_artifact = name
        with open(os.path.join(self.directory, "best.json"), "w") as f:
            json.dump({"step": step, "iou": float(iou),
                       "derr": float(derr), "artifact": name}, f)

    def load_meta(self, step: Optional[int] = None) -> Dict[str, Any]:
        """Metric-history / epoch sidecar of a step (latest by default) —
        the resume metadata the reference keeps inside its .pth.tar
        (torch_implementation.py:908-932)."""
        if step is None:
            step = self._mgr.latest_step()
        path = os.path.join(self.directory, f"meta_{step}.json")
        if step is None or not os.path.exists(path):
            return {}
        with open(path) as f:
            return json.load(f)

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        if step is None:
            step = self._mgr.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoint in {self.directory}")
        target = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(target)
        )
        return state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )

    # head-rename aliases for by-name restore: a checkpoint trained with the
    # plain seg head (cdu11_out) loads into the convDeconvOut=2 deconv head
    # (convOutput) — the reference remaps module.Conv2DownUp11.1.ct2d.weight
    # -> module.convOutput.ct2d.weight (utilTorch_loadweight.py:34-38).
    _HEAD_ALIASES = {"convOutput": "cdu11_out"}

    def restore_params_partial(self, state: TrainState,
                               step: Optional[int] = None) -> TrainState:
        """By-name partial restore: load every leaf whose path exists and
        whose shape matches, with head-rename aliasing; skip the rest — the
        jax equivalent of the reference's head-remapping loader
        (utilTorch_loadweight.py:30-46)."""
        if step is None:
            step = self._mgr.latest_step()
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore())
        flat_new, tree = jax.tree_util.tree_flatten_with_path(state.params)
        flat_old = dict(
            jax.tree_util.tree_flatten_with_path(restored["params"])[0]
        ) if "params" in restored else {}
        old_by_str = {jax.tree_util.keystr(p): v for p, v in flat_old.items()}
        out = []
        for path, leaf in flat_new:
            old = flat_old.get(path)
            if old is None:
                key = jax.tree_util.keystr(path)
                for new_name, old_name in self._HEAD_ALIASES.items():
                    if f"['{new_name}']" in key:
                        old = old_by_str.get(
                            key.replace(f"['{new_name}']", f"['{old_name}']")
                        )
                        break
            if old is not None and np.shape(old) == np.shape(leaf):
                out.append(old)
            else:
                out.append(leaf)
        return state.replace(
            params=jax.tree_util.tree_unflatten(tree, out)
        )


def _np_default(o):
    if isinstance(o, (np.ndarray, np.generic)):
        return o.tolist()
    raise TypeError(type(o))
