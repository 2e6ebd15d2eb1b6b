"""Result visualization — showResults / plotBatchData equivalents
(util/utilTorchPlot.py:18, :216): batch grids of left image, seg colormaps
(decode_segmap 21-color table), disparity jet maps and error panels, saved
as pngs (headless Agg)."""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from ..data.labels import decode_segmap


def show_results(
    out_dir: str,
    tag: str,
    left: np.ndarray,
    seg_pred_logits: np.ndarray,
    seg_gt_onehot: np.ndarray,
    disp_pred: np.ndarray,
    disp_gt: np.ndarray,
):
    """Panel figure per sample: image / GT seg / pred seg / GT disp /
    pred disp / |disp error|."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # pragma: no cover
        return
    os.makedirs(out_dir, exist_ok=True)
    b = left.shape[0]
    for i in range(b):
        fig, axes = plt.subplots(2, 3, figsize=(12, 6))
        img = left[i]
        img = (img - img.min()) / max(img.max() - img.min(), 1e-8)
        axes[0, 0].imshow(img)
        axes[0, 0].set_title("left")
        axes[0, 1].imshow(decode_segmap(seg_gt_onehot[i].argmax(-1)))
        axes[0, 1].set_title("seg GT")
        axes[0, 2].imshow(decode_segmap(seg_pred_logits[i].argmax(-1)))
        axes[0, 2].set_title("seg pred")
        axes[1, 0].imshow(disp_gt[i, ..., 0], cmap="jet")
        axes[1, 0].set_title("disp GT")
        axes[1, 1].imshow(disp_pred[i, ..., 0], cmap="jet")
        axes[1, 1].set_title("disp pred")
        axes[1, 2].imshow(
            np.abs(disp_pred[i, ..., 0] - disp_gt[i, ..., 0]), cmap="magma"
        )
        axes[1, 2].set_title("|error|")
        for ax in axes.ravel():
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"{tag}_{i}.png"), dpi=110)
        plt.close(fig)
