import pytest

from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import (
    PMTConfig,
    config_from_args,
    output_type_for,
)


def test_reference_flagship_cli_roundtrip():
    # canonical flagship config from scripts/trainTorchImpl.sh:30-44
    argv = (
        "-net sdnet_mini_ext -backbone densenet -corrType 1dcorr "
        "-crop 256 512 -b 8 -e 100 -optimType adam "
        "-loss cross_entropy lovasz_loss -segWeight 1 "
        "-output_activation linear -datasetName roses -train 1"
    ).split()
    cfg = config_from_args(argv)
    assert cfg.model.net == "sdnet_mini_ext"
    assert cfg.model.output_type == "smallOutSeg"
    assert cfg.data.crop == (256, 512)
    assert cfg.data.n_labels == 2
    assert cfg.model.max_disp == 1.0  # linear activation
    assert cfg.loss.losses == ("cross_entropy", "lovasz_loss")
    assert cfg.optim.resolve_lr(cfg.model.net, len(cfg.loss.losses)) == 0.0015


def test_output_type_dispatch_matches_reference():
    # util/utilLoadNetwork.py:28-53
    assert output_type_for("sdnet_mini") == "smallOutPair"
    assert output_type_for("sdnet_mini_ext") == "smallOutSeg"
    assert output_type_for("sdnet_mini_ext_dlab") == "smallOutSeg"
    assert output_type_for("sdnet_seg") == "smallOutWarp"
    assert output_type_for("dsnet_warp") == "ThreeOutPuts"
    assert output_type_for("dsnet_warp_disp") == "ThreeOutPutsDisp"
    assert output_type_for("dsnet_warp_disp_consist") == "ThreeOutPutsDispConsist"
    assert output_type_for("sdnet_mini_ext_small_edge") == "edgeOut"
    assert output_type_for("sdnet_mini_ext", hanet=True) == "hanet"
    assert output_type_for("sdnet_mini_ext", multaskloss=1) == "multitask"
    assert output_type_for("deeplab") == "deeplab"
    assert output_type_for("deeplab_mod") == "deeplab_mod"
    assert output_type_for("pspnet") == "pspnet"


def test_validation_rejects_bad_values():
    cfg = PMTConfig()
    cfg.model.net = "nonexistent"
    with pytest.raises(ValueError):
        cfg.validate()


def test_json_roundtrip():
    cfg = PMTConfig()
    cfg2 = PMTConfig.from_json(cfg.to_json())
    assert cfg2.model.net == cfg.model.net
    assert cfg2.data.crop == cfg.data.crop


def test_optimizer_lr_rules():
    # torch_implementation.py:715-724
    cfg = PMTConfig()
    assert cfg.optim.resolve_lr("deeplab", 1) == 5e-6
    assert cfg.optim.resolve_lr("sdnet_mini_ext", 3) == 5e-4
    assert cfg.optim.resolve_lr("sdnet_mini_ext", 2) == 1.5e-3
    cfg.optim.optim_type = "sgd"
    assert cfg.optim.resolve_lr("sdnet_mini_ext", 1) == 0.005
