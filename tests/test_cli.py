"""CLI end-to-end smoke: the reference-compatible flag surface drives a
real (tiny) training run on the synthetic fixture."""
import numpy as np
import pytest

from pmt_learning_for_semantic_segmentation_and_disparity_tpu import data as D
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.cli import train as cli


def test_cli_train_smoke(tmp_path, monkeypatch):
    manifests = D.make_roses_fixture(str(tmp_path / "ds"), n_train=8,
                                     n_test=2, hw=(288, 544))
    argv = [
        "-net", "sdnet_mini", "-backbone", "densenet", "-corrType", "1dcorr",
        "-crop", "64", "128", "-b", "8", "-e", "1",
        "-loss", "cross_entropy",
        "-output_activation", "linear", "-datasetName", "roses", "-train", "1",
        "-colorL", manifests["left"], "-colorR", manifests["right"],
        "-seg", manifests["seg"], "-disp", manifests["disp"],
        "-inst", manifests["inst"],
        "-colorL_test", manifests["left_t"], "-colorR_test", manifests["right_t"],
        "-seg_test", manifests["seg_t"], "-disp_test", manifests["disp_t"],
        "-inst_test", manifests["inst_t"],
        "-w_savePath", str(tmp_path / "results"),
    ]
    # shrink eval bucket so the tiny CPU run stays fast
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import config

    orig = config.config_from_args

    def patched(args=None):
        cfg = orig(args)
        cfg.data.eval_shape = (288, 544)
        cfg.run.eval_every = 1
        return cfg

    monkeypatch.setattr(config, "config_from_args", patched)
    monkeypatch.setattr(cli, "config_from_args", patched)
    cli.main(argv)
