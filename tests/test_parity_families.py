"""Per-family activation parity vs the torch reference (round-3 VERDICT #1).

Weight-transport oracle tests for the model families the flagship tests
don't cover: the DeepLabV3+ pair, PSMNet, the ext_small RCU family and
the warp family. Each test instantiates the reference net on CPU with
shimmed CUDA deps, transports its randomly-initialized weights into our
flax model, and checks the heads agree to fp32 tolerance on identical
inputs — proving every conv/BN/skip/gate/resize wiring at family
granularity.
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
from reference_oracle import load_reference_models  # noqa: E402


def _tree_keys(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(p): np.shape(v) for p, v in flat}


def assert_tree_match(variables, params, stats):
    init_keys = _tree_keys(variables["params"])
    imp_keys = _tree_keys(params)
    assert init_keys == imp_keys, (
        f"param tree mismatch:\n only in init: "
        f"{sorted(set(init_keys) - set(imp_keys))[:10]}\n only in import: "
        f"{sorted(set(imp_keys) - set(init_keys))[:10]}\n shape diffs: "
        f"{[(k, init_keys[k], imp_keys[k]) for k in init_keys if k in imp_keys and init_keys[k] != imp_keys[k]][:10]}"
    )
    init_stats = _tree_keys(variables.get("batch_stats", {}))
    imp_stats = _tree_keys(stats)
    assert init_stats == imp_stats, (
        f"batch_stats mismatch: only init "
        f"{sorted(set(init_stats) - set(imp_stats))[:10]} / only import "
        f"{sorted(set(imp_stats) - set(init_stats))[:10]}"
    )


def assert_heads_close(pairs, tol=1e-4):
    for name, ours, theirs in pairs:
        ours = np.asarray(ours)
        scale = max(1.0, float(np.abs(theirs).max()))
        diff = np.abs(ours - theirs).max()
        assert diff / scale < tol, (
            f"{name}: max|d|={diff:.3e} (scale {scale:.3e}), "
            f"ours range [{ours.min():.3f},{ours.max():.3f}] vs torch "
            f"[{theirs.min():.3f},{theirs.max():.3f}]"
        )


def t2j(x):
    return x.numpy().transpose(0, 2, 3, 1)


@pytest.fixture(scope="module")
def ref():
    load_reference_models()
    return True


def test_deeplab_mono_weight_transport(ref):
    """'deeplab' = mono SPPNet xception65+aspp (models_deeplab/net.py:82-135,
    os=8, update_bn_eps -> encoder eps 1e-3 per utilLoadNetwork.py:49-51)."""
    from models_deeplab.net import SPPNet
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import_families import (
        import_sppnet_mono,
    )

    torch.manual_seed(13)
    net = SPPNet(output_channels=19)
    net.update_bn_eps()
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_sppnet_mono(sd)

    cfg = PMTConfig()
    cfg.model.net = "deeplab"
    cfg.data.dataset_name = "cityscapes"
    model = models.get_network(cfg)

    rng = np.random.default_rng(3)
    left = rng.standard_normal((1, 64, 96, 3), dtype=np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), None, train=False,
    )
    assert_tree_match(variables, params, stats)

    with torch.no_grad():
        t_out = net(torch.from_numpy(left).permute(0, 3, 1, 2))
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(left), None, train=False,
                      rngs={"dropout": jax.random.PRNGKey(0)})
    assert_heads_close([("seg1", out["seg1"], t2j(t_out))])


def test_deeplab_mobilenetv2_weight_transport(ref):
    """'deeplab' with enc_type='mobilenetv2' (models_deeplab/net.py:89-104:
    MobileNetV2 encoder, create_mspp('aspp') = full separable ASPP(320,256,8)
    per spp.py:147-148, no decoder): proves the second encoder option of the
    mono SPPNet — stem + 17 ExpandedConv blocks (ReLU6, depthwise groups,
    dilation 2/4 tail)."""
    from models_deeplab.net import SPPNet
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import_families import (
        import_sppnet_mono,
    )

    torch.manual_seed(17)
    net = SPPNet(output_channels=19, enc_type="mobilenetv2")
    net.update_bn_eps()
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_sppnet_mono(sd, enc_type="mobilenetv2")

    cfg = PMTConfig()
    cfg.model.net = "deeplab"
    cfg.model.backbone = "mobilenetv2"
    cfg.data.dataset_name = "cityscapes"
    model = models.get_network(cfg)

    rng = np.random.default_rng(5)
    left = rng.standard_normal((1, 64, 96, 3), dtype=np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), None, train=False,
    )
    assert_tree_match(variables, params, stats)

    with torch.no_grad():
        t_out = net(torch.from_numpy(left).permute(0, 3, 1, 2))
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(left), None, train=False,
                      rngs={"dropout": jax.random.PRNGKey(0)})
    assert_heads_close([("seg1", out["seg1"], t2j(t_out))])


def test_deeplab_mobilenetv2_maspp_weight_transport(ref):
    """'deeplab' mobilenetv2 with dec_type='maspp' (spp.py:80-108,153-154):
    the 2-branch MobileASPP head (gap + 1x1, concat, 512->256 proj)."""
    from models_deeplab.net import SPPNet
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.models.deeplab import (
        SPPNetMono,
    )
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import_families import (
        import_sppnet_mono,
    )

    torch.manual_seed(19)
    net = SPPNet(output_channels=19, enc_type="mobilenetv2",
                 dec_type="maspp")
    net.update_bn_eps()
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_sppnet_mono(sd, enc_type="mobilenetv2",
                                       dec_type="maspp")

    model = SPPNetMono(labels=19, enc_type="mobilenetv2", dec_type="maspp")

    rng = np.random.default_rng(7)
    left = rng.standard_normal((1, 64, 96, 3), dtype=np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), None, train=False,
    )
    assert_tree_match(variables, params, stats)

    with torch.no_grad():
        t_out = net(torch.from_numpy(left).permute(0, 3, 1, 2))
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(left), None, train=False,
                      rngs={"dropout": jax.random.PRNGKey(0)})
    assert_heads_close([("seg1", out["seg1"], t2j(t_out))])


def test_deeplab_mod_weight_transport(ref):
    """'deeplab_mod' = stereo SPPNet (models_deeplab_mod/net.py:82-169):
    shared xception65 with block-8/14 taps, unnormalized 1-D correlation,
    three chained SPPDecoders (seg -> disp -> seg2)."""
    from models_deeplab_mod.net import SPPNet as SPPNetDS
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import_families import (
        import_sppnet_stereo,
    )

    torch.manual_seed(17)
    net = SPPNetDS(output_channels=19)
    net.update_bn_eps()
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_sppnet_stereo(sd)

    cfg = PMTConfig()
    cfg.model.net = "deeplab_mod"
    cfg.data.dataset_name = "cityscapes"
    model = models.get_network(cfg)

    rng = np.random.default_rng(5)
    left = rng.standard_normal((1, 64, 96, 3), dtype=np.float32)
    right = rng.standard_normal((1, 64, 96, 3), dtype=np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), jnp.asarray(right), train=False,
    )
    assert_tree_match(variables, params, stats)

    with torch.no_grad():
        t_seg, t_disp, t_seg2 = net(
            torch.from_numpy(left).permute(0, 3, 1, 2),
            torch.from_numpy(right).permute(0, 3, 1, 2),
        )
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(left), jnp.asarray(right), train=False,
                      rngs={"dropout": jax.random.PRNGKey(0)})
    assert_heads_close([
        ("seg1", out["seg1"], t2j(t_seg)),
        ("disp1", out["disp1"], t2j(t_disp)),
        ("seg2", out["seg2"], t2j(t_seg2)),
    ])


def test_psmnet_weight_transport(ref):
    """'pspnet' = PSMNet stacked hourglass (stackhourglass.py:53-160):
    SPP feature extractor, concat cost volume, 3x 3-D hourglass with
    cascaded classifiers, trilinear upsample + soft-argmin. maxdisp=48
    keeps the CPU volume small; the wiring is disparity-count agnostic."""
    # models_psmnet/__init__.py exports the class AS `stackhourglass`
    # (utilLoadNetwork.py:57 calls net_arch(192) on it directly)
    from models_psmnet import stackhourglass
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import_families import (
        import_psmnet,
    )

    torch.manual_seed(23)
    net = stackhourglass(48)
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_psmnet(sd)

    cfg = PMTConfig()
    cfg.model.net = "pspnet"
    cfg.model.max_disp_psm = 48
    model = models.get_network(cfg)

    rng = np.random.default_rng(7)
    H, W = 256, 320  # /4 height 64 so the AvgPool(64) branch is non-degenerate
    left = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    right = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), jnp.asarray(right), train=False,
    )
    assert_tree_match(variables, params, stats)

    # fp32 soft-argmin amplifies conv-stack rounding by ~Var_p(d) (sum of
    # p*d over 48 levels), so run BOTH frameworks in fp64: any wiring slip
    # (cost-volume shift, align_corners, residual wiring) would show up at
    # O(1) disparity; fp64 agreement to 1e-8 proves exact equivalence.
    net.double()
    # the reference hardcodes torch.FloatTensor for its cost volume
    # (stackhourglass.py:112) — alias it to DoubleTensor for the fp64 run
    orig_ft = torch.FloatTensor
    torch.FloatTensor = torch.DoubleTensor
    try:
        with torch.no_grad():
            t_pred = net(torch.from_numpy(left).permute(0, 3, 1, 2).double(),
                         torch.from_numpy(right).permute(0, 3, 1, 2).double())
    finally:
        torch.FloatTensor = orig_ft
    with jax.enable_x64(True):
        p64 = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64),
                                     params)
        s64 = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64),
                                     stats)
        out = model.apply({"params": p64, "batch_stats": s64},
                          jnp.asarray(left, jnp.float64),
                          jnp.asarray(right, jnp.float64), train=False,
                          rngs={"dropout": jax.random.PRNGKey(0)})
        disp = np.asarray(out["disp1"][..., 0])
    assert_heads_close([("disp", disp, t_pred.numpy())], tol=1e-8)


def _ext_small_pair(variant, net_key, torch_cls_name, seed,
                    backbone="densenet"):
    """Instantiate the reference Ext_small* net + our ExtSmall, transport
    weights, return (torch_net, model, variables, inputs)."""
    from types import SimpleNamespace

    import models.dsnet_t2_ext_small as ref_es
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import_families import (
        import_ext_small,
    )

    torch.manual_seed(seed)
    tcfg = SimpleNamespace(aspp=0)
    cls = getattr(ref_es, torch_cls_name)
    net = cls(tcfg, labels=2, pretrained=False, patch_type="1dcorr",
              include_edges=False, backbone=backbone)
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_ext_small(sd, variant=variant, backbone=backbone)

    cfg = PMTConfig()
    cfg.model.net = net_key
    cfg.model.backbone = backbone
    cfg.model.corr_type = "1dcorr"
    model = models.get_network(cfg)

    rng = np.random.default_rng(seed + 1)
    H, W = 256, 256  # AvgPool2d(128) pyramid branch needs tap0 >= 128
    left = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    right = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    # left_e = compute_grad_mag(left) keeps the 3 RGB channels
    # (utilTorchGate.py:198-204; aux_img_channel=3 at :219-222)
    edge = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    kw = {"left_e": jnp.asarray(edge)} if variant != "v0" else {}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), jnp.asarray(right), train=False, **kw,
    )
    assert_tree_match(variables, params, stats)
    return net, model, {"params": params, "batch_stats": stats}, \
        (left, right, edge)


def test_ext_small_edge_weight_transport(ref):
    """'sdnet_mini_ext_small_edge' = Ext_small (dsnet_t2_ext_small.py:
    130-381): ALL RCUs use_deconv=False, segNet(fc=1, labels=1) whose head
    is the edge logit map, edge-conv skips, attention gate from s2."""
    net, model, variables, (left, right, edge) = _ext_small_pair(
        "edge", "sdnet_mini_ext_small_edge", "Ext_small", 29)
    with torch.no_grad():
        t_out = net(torch.from_numpy(left).permute(0, 3, 1, 2),
                    torch.from_numpy(right).permute(0, 3, 1, 2),
                    torch.from_numpy(edge).permute(0, 3, 1, 2))
    t_edge, t_disp, t_seg2, _ = [o.numpy().transpose(0, 2, 3, 1)
                                 for o in t_out]
    out = model.apply(variables, jnp.asarray(left), jnp.asarray(right),
                      train=False, left_e=jnp.asarray(edge),
                      rngs={"dropout": jax.random.PRNGKey(0)})
    assert_heads_close([
        ("edge", out["edge"], t_edge),
        ("disp1", out["disp1"], t_disp),
        ("seg1", out["seg1"], t_seg2),
    ])


def test_ext_small_v0_weight_transport(ref):
    """'sdnet_mini_ext_small' = Ext_smallv0 (:639-894): use_deconv=True
    RCUs, segNet(fc=64, labels), backbone-tap skips (a_0, a_pyramidB_0)."""
    net, model, variables, (left, right, _) = _ext_small_pair(
        "v0", "sdnet_mini_ext_small", "Ext_smallv0", 31)
    with torch.no_grad():
        t_out = net(torch.from_numpy(left).permute(0, 3, 1, 2),
                    torch.from_numpy(right).permute(0, 3, 1, 2))
    t_seg1, t_disp, t_seg2, _ = [o.numpy().transpose(0, 2, 3, 1)
                                 for o in t_out]
    out = model.apply(variables, jnp.asarray(left), jnp.asarray(right),
                      train=False, rngs={"dropout": jax.random.PRNGKey(0)})
    assert_heads_close([
        ("seg1", out["seg1"], t_seg1),
        ("disp1", out["disp1"], t_disp),
        ("seg2", out["seg2"], t_seg2),
    ])


def test_ext_small_v0_efficientnet_divergence(ref):
    """Documented divergence: Ext_smallv0 'supports' efficientnet-b4 in its
    constructor (dsnet_t2_ext_small.py:185-191 sets segnet_input 1792*2)
    but its forward is BROKEN for every efficientnet backbone — the disp
    skip concatenates a_0 (tap0: 24 ch for b4) into conv1d_2 which is
    hardcoded conv2dSame(64+64, 64) (:763, :829-835), so the torch forward
    raises a channel-mismatch RuntimeError. Our ExtSmall infers skip
    channels and runs; this test pins both facts so the divergence is
    deliberate, not a wiring slip."""
    from types import SimpleNamespace

    import models.dsnet_t2_ext_small as ref_es

    torch.manual_seed(37)
    tcfg = SimpleNamespace(aspp=0)
    net = ref_es.Ext_smallv0(tcfg, labels=2, pretrained=False,
                             patch_type="1dcorr", include_edges=False,
                             backbone="efficientnet-b4")
    net.eval()
    left = torch.randn(1, 3, 256, 256)
    with pytest.raises(RuntimeError):
        with torch.no_grad():
            net(left, left)

    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext_small"
    cfg.model.backbone = "efficientnet-b4"
    cfg.model.corr_type = "1dcorr"
    model = models.get_network(cfg)
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, x, train=False,
    )
    out = model.apply(variables, x, x, train=False,
                      rngs={"dropout": jax.random.PRNGKey(0)})
    assert out["seg1"].shape == (1, 256, 256, 2)
    assert out["disp1"].shape == (1, 256, 256, 1)


def test_ext_small_v2_weight_transport(ref):
    """'sdnet_mini_ext_small_edgev2' = Ext_smallv2 (:382-638): v0 wiring
    (use_deconv=True, a_0/a_pyramidB_0 skips, edge-conv skips commented
    out) but segNet labels=1 like the edge variant; forward takes left_e
    and ignores it in the skips."""
    net, model, variables, (left, right, edge) = _ext_small_pair(
        "v2", "sdnet_mini_ext_small_edgev2", "Ext_smallv2", 41)
    with torch.no_grad():
        t_out = net(torch.from_numpy(left).permute(0, 3, 1, 2),
                    torch.from_numpy(right).permute(0, 3, 1, 2),
                    torch.from_numpy(edge).permute(0, 3, 1, 2))
    t_edge, t_disp, t_seg2, _ = [o.numpy().transpose(0, 2, 3, 1)
                                 for o in t_out]
    out = model.apply(variables, jnp.asarray(left), jnp.asarray(right),
                      train=False, left_e=jnp.asarray(edge),
                      rngs={"dropout": jax.random.PRNGKey(0)})
    assert_heads_close([
        ("edge", out["edge"], t_edge),
        ("disp1", out["disp1"], t_disp),
        ("seg1", out["seg1"], t_seg2),
    ])


def test_mobilenetv3_pretrained_backbone_transport(ref):
    """-pretrained_path for mobilenet: a cuevhv-layout MobileNetV3-Large
    checkpoint (models/mobilenetv3.py:91-230) transports into our backbone
    and the five feature taps agree (the reference blindly zips checkpoint
    keys by order, :223-229 — we map by name)."""
    from models.mobilenetv3 import MobileNetV3
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.models.mobilenetv3 import (
        MobileNetV3LargeFeatures,
    )
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import_families import (
        _MBV3_LARGE_CFG,
        import_mobilenetv3_backbone,
    )

    torch.manual_seed(43)
    cfgs = [list(c) for c in _MBV3_LARGE_CFG]
    net = MobileNetV3(cfgs, mode="large")
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_mobilenetv3_backbone(sd)

    model = MobileNetV3LargeFeatures()
    rng = np.random.default_rng(19)
    x = rng.standard_normal((1, 64, 96, 3), dtype=np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x), train=False)
    assert_tree_match(variables, params, stats)

    with torch.no_grad():
        t_taps = net(torch.from_numpy(x).permute(0, 3, 1, 2))
    taps = model.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), train=False)
    assert len(taps) == len(t_taps) == 5
    assert_heads_close([
        (f"tap{i}", taps[i], t2j(t)) for i, t in enumerate(t_taps)
    ])


def test_xception65_pretrained_backbone_import(ref):
    """-pretrained_path for the deeplab nets: an unprefixed Xception65
    checkpoint grafts onto params['encoder'] of our SPPNetMono with an
    identical tree (forward parity is proven by
    test_deeplab_mono_weight_transport)."""
    from models_deeplab.net import SPPNet
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import import (
        apply_backbone_params,
    )
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import_families import (
        import_xception65_backbone,
    )

    torch.manual_seed(47)
    net = SPPNet(output_channels=19)
    sd = {k[len("encoder."):]: v.detach().numpy()
          for k, v in net.state_dict().items() if k.startswith("encoder.")}
    bp, bs = import_xception65_backbone(sd)

    cfg = PMTConfig()
    cfg.model.net = "deeplab"
    cfg.data.dataset_name = "cityscapes"
    model = models.get_network(cfg)
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, None, train=False,
    )
    grafted = apply_backbone_params(dict(variables), bp, bs,
                                    path=("encoder",))
    assert (_tree_keys(grafted["params"]["encoder"])
            == _tree_keys(variables["params"]["encoder"]))
    enc0 = np.asarray(grafted["params"]["encoder"]["conv1"]["kernel"])
    assert np.allclose(enc0, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))


def test_warp_divide_weight_transport(ref):
    """'dsnet_warp' = minidsnetDivide (dsnet_t2_warp.py:577-703): 9-tap warp
    piramidNet2 (4th pyramid level), shared SmallsegNet on left/right, corr
    disp decoder, sigmoid attention blend of left seg with the
    disparity-warped right seg (apply_disparity gather)."""
    from types import SimpleNamespace

    import models.dsnet_t2_warp as ref_warp
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import_families import (
        import_minidsnet_divide,
    )

    torch.manual_seed(37)
    net = ref_warp.minidsnetDivide(
        SimpleNamespace(aspp=0), labels=2, pretrained=False,
        patch_type="1dcorr", include_edges=False, backbone="densenet")
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_minidsnet_divide(sd)

    cfg = PMTConfig()
    cfg.model.net = "dsnet_warp"
    cfg.model.backbone = "densenet"
    cfg.model.corr_type = "1dcorr"
    model = models.get_network(cfg)

    rng = np.random.default_rng(11)
    H, W = 256, 256
    left = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    right = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), jnp.asarray(right), train=False,
    )
    assert_tree_match(variables, params, stats)

    with torch.no_grad():
        t_out = net(torch.from_numpy(left).permute(0, 3, 1, 2),
                    torch.from_numpy(right).permute(0, 3, 1, 2))
    t_both, t_disp, t_left, _, t_right_w, t_at = [
        o.numpy().transpose(0, 2, 3, 1) for o in t_out
    ]
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(left), jnp.asarray(right), train=False,
                      rngs={"dropout": jax.random.PRNGKey(0)})
    assert_heads_close([
        ("disp1", out["disp1"], t_disp),
        ("seg_left", out["seg2"], t_left),
        ("at_d", out["warped_right"], t_at),
    ])
    # The warped heads can only be compared where both frameworks sample
    # the SAME coordinate: random-init weights predict |disp| up to ~4e4,
    # so fp32 conv divergence — within the disp1 tolerance above — still
    # moves the sample point by whole pixels there, and apply_disparity is
    # additionally discontinuous at the W-1 clamp (torch_dsnet.py:52-81
    # zeroes the output when x1 clamps). tests/test_ops.py proves the warp
    # op itself bit-exact; here mask to pixels whose torch/jax coordinates
    # agree to 1e-3 px and sit below the cliff, and require that the mask
    # still covers a solid majority of the image.
    grid = np.arange(W, dtype=np.float32)[None, None, :]
    t_xs = np.clip(grid - t_disp[..., 0], 0.0, W - 1.0)
    o_xs = np.clip(grid - np.asarray(out["disp1"])[..., 0], 0.0, W - 1.0)
    safe = ((np.abs(t_xs - o_xs) < 1e-3)
            & (t_xs < W - 1 - 1e-3))[..., None]
    frac = float(safe.mean())
    assert frac > 0.5, frac
    for name, ours_h, theirs_h in (("seg_right_warped", out["seg3"], t_right_w),
                                   ("seg_both", out["seg1"], t_both)):
        ours_h = np.asarray(ours_h)
        scale = max(1.0, float(np.abs(theirs_h).max()))
        diff = float((np.abs(ours_h - theirs_h) * safe).max())
        assert diff / scale < 1e-3, (name, diff, scale, frac)


def _warp_variant_fp64(ref_cls_name, net_key, variant, seed,
                       torch_extra=None, jax_extra=None):
    """Instantiate a warp-family reference net and ours, transport weights,
    run BOTH in fp64 and return (torch_outs, our_out_dict).

    fp64 on both sides shrinks the predicted-disparity rounding below any
    sampling-coordinate shift, so the heads that pass through
    apply_disparity(pred_disp) — discontinuous in the disparity — can be
    compared tightly without the coordinate masking the fp32 divide test
    needs (same trick as the PSMNet soft-argmin test above)."""
    from types import SimpleNamespace

    import models.dsnet_t2_warp as ref_warp
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import_families import (
        import_minidsnet_divide,
    )

    torch.manual_seed(seed)
    net = getattr(ref_warp, ref_cls_name)(
        SimpleNamespace(aspp=0), labels=2, pretrained=False,
        patch_type="1dcorr", include_edges=False, backbone="densenet")
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_minidsnet_divide(sd, variant=variant)

    cfg = PMTConfig()
    cfg.model.net = net_key
    cfg.model.backbone = "densenet"
    cfg.model.corr_type = "1dcorr"
    model = models.get_network(cfg)

    rng = np.random.default_rng(seed + 1)
    H, W = 256, 256
    left = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    right = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    j_extra = dict(jax_extra or {})
    j_extra32 = {k: jnp.asarray(np.asarray(v, np.float32))
                 for k, v in j_extra.items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), jnp.asarray(right), train=False, **j_extra32,
    )
    assert_tree_match(variables, params, stats)

    net.double()
    t_args = [torch.from_numpy(left).permute(0, 3, 1, 2).double(),
              torch.from_numpy(right).permute(0, 3, 1, 2).double()]
    if torch_extra is not None:
        t_args.append(torch_extra)
    with torch.no_grad():
        t_out = net(*t_args)
    with jax.enable_x64(True):
        p64 = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64),
                                     params)
        s64 = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64),
                                     stats)
        j_extra64 = {k: jnp.asarray(np.asarray(v), jnp.float64)
                     for k, v in j_extra.items()}
        out = model.apply({"params": p64, "batch_stats": s64},
                          jnp.asarray(left, jnp.float64),
                          jnp.asarray(right, jnp.float64), train=False,
                          rngs={"dropout": jax.random.PRNGKey(0)},
                          **j_extra64)
    t_out = [o.numpy().transpose(0, 2, 3, 1) for o in t_out]
    return t_out, out


def test_minidsnet_weight_transport(ref):
    """'sdnet_mini' = minidsnet (dsnet_t2.py:825-912): the ORIGINAL
    piramidNet (:324-397) with b2 feeding the correlation, segNet over
    cat(a4,b4) with the 1-ch ba0 image-conv skip, corr disp decoder.
    (The reference's getNetwork would crash for this key — minidsnet
    takes no `backbone` kwarg, utilLoadNetwork.py:58 — so we construct
    it directly like its train scripts did.)"""
    from types import SimpleNamespace

    ref_mod = load_reference_models()
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import import (
        import_minidsnet,
    )

    torch.manual_seed(71)
    net = ref_mod.minidsnet(SimpleNamespace(), labels=2, pretrained=False,
                            patch_type="1dcorr", include_edges=False)
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_minidsnet(sd)

    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini"
    cfg.model.corr_type = "1dcorr"
    model = models.get_network(cfg)

    rng = np.random.default_rng(73)
    H, W = 256, 256
    left = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    right = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), jnp.asarray(right), train=False,
    )
    assert_tree_match(variables, params, stats)

    with torch.no_grad():
        t_seg, t_disp, _, _ = net(torch.from_numpy(left).permute(0, 3, 1, 2),
                                  torch.from_numpy(right).permute(0, 3, 1, 2))
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(left), jnp.asarray(right), train=False,
                      rngs={"dropout": jax.random.PRNGKey(0)})
    assert_heads_close([
        ("seg1", out["seg1"], t2j(t_seg)),
        ("disp1", out["disp1"], t2j(t_disp)),
    ])


def test_minidsnet_ext2_weight_transport(ref):
    """'sdnet_mini_ext_v2' = minidsnetExt2 (dsnet_t2.py:1632-1890):
    flagship trunk with a SINGLE self-gate (sigmoid conv1d_at on s2,
    :1861-1866) blending the disp-guided and seg-guided branches, and the
    head-2 output left at the full-res xleft1 skip resolution (no final
    interpolate, :1884-1885)."""
    from types import SimpleNamespace

    ref_mod = load_reference_models()
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import import (
        import_minidsnet_ext,
    )

    torch.manual_seed(89)
    net = ref_mod.minidsnetExt2(SimpleNamespace(aspp=0), labels=2,
                                pretrained=False, patch_type="1dcorr",
                                include_edges=False, backbone="densenet")
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_minidsnet_ext(sd, variant="v2")

    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext_v2"
    cfg.model.backbone = "densenet"
    cfg.model.corr_type = "1dcorr"
    model = models.get_network(cfg)

    rng = np.random.default_rng(97)
    H, W = 256, 256
    left = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    right = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), jnp.asarray(right), train=False,
    )
    assert_tree_match(variables, params, stats)

    with torch.no_grad():
        t_seg, t_disp, t_seg2, _ = net(
            torch.from_numpy(left).permute(0, 3, 1, 2),
            torch.from_numpy(right).permute(0, 3, 1, 2))
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(left), jnp.asarray(right), train=False,
                      rngs={"dropout": jax.random.PRNGKey(0)})
    assert_heads_close([
        ("seg1", out["seg1"], t2j(t_seg)),
        ("disp1", out["disp1"], t2j(t_disp)),
        ("seg2", out["seg2"], t2j(t_seg2)),
    ])


def _ext_variant_transport(ref_cls_name, net_key, variant, seed,
                           fp64=False):
    """fp64=True: the piramid_res residual chains amplify random-init
    activations to ~2e5, so fp32 rounding alone reaches ~3e-4 relative on
    the heads; fp64 on both sides pins the wiring at 1e-8 instead."""
    from types import SimpleNamespace

    ref_mod = load_reference_models()
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import import (
        import_minidsnet_ext,
    )

    torch.manual_seed(seed)
    net = getattr(ref_mod, ref_cls_name)(
        SimpleNamespace(aspp=0), labels=2, pretrained=False,
        patch_type="1dcorr", include_edges=False, backbone="densenet")
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_minidsnet_ext(sd, variant=variant)

    cfg = PMTConfig()
    cfg.model.net = net_key
    cfg.model.backbone = "densenet"
    cfg.model.corr_type = "1dcorr"
    model = models.get_network(cfg)

    rng = np.random.default_rng(seed + 2)
    H, W = 256, 256
    left = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    right = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), jnp.asarray(right), train=False,
    )
    assert_tree_match(variables, params, stats)

    if not fp64:
        with torch.no_grad():
            t_seg, t_disp, t_seg2, _ = net(
                torch.from_numpy(left).permute(0, 3, 1, 2),
                torch.from_numpy(right).permute(0, 3, 1, 2))
        out = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(left), jnp.asarray(right), train=False,
                          rngs={"dropout": jax.random.PRNGKey(0)})
        tol = 1e-4
    else:
        net.double()
        with torch.no_grad():
            t_seg, t_disp, t_seg2, _ = net(
                torch.from_numpy(left).permute(0, 3, 1, 2).double(),
                torch.from_numpy(right).permute(0, 3, 1, 2).double())
        with jax.enable_x64(True):
            p64 = jax.tree_util.tree_map(
                lambda a: np.asarray(a, np.float64), params)
            s64 = jax.tree_util.tree_map(
                lambda a: np.asarray(a, np.float64), stats)
            out = model.apply({"params": p64, "batch_stats": s64},
                              jnp.asarray(left, jnp.float64),
                              jnp.asarray(right, jnp.float64), train=False,
                              rngs={"dropout": jax.random.PRNGKey(0)})
        tol = 1e-8
    assert_heads_close([
        ("seg1", out["seg1"], t2j(t_seg)),
        ("disp1", out["disp1"], t2j(t_disp)),
        ("seg2", out["seg2"], t2j(t_seg2)),
    ], tol=tol)


def test_ext_piramid_weight_transport(ref):
    """'sdnet_mini_ext_piramid' = minidsnetExtPiramid (dsnet_t2.py:
    1303-1629): flagship module set, but head 2's final skip is the
    pyramid-enriched /2 map a_pyramidB_0 and the output resizes to full
    res with nearest (:1557-1562)."""
    _ext_variant_transport("minidsnetExtPiramid", "sdnet_mini_ext_piramid",
                           "piramid", 101)


def test_ext_piramid_res_weight_transport(ref):
    """'sdnet_mini_ext_piramid_res' = minidsnetExtPiramidRes (:2180-2423):
    residual corr fusion (y = a_pyramidB_2 + corrConv(y) + cdu3(x1)),
    additive gate fusion (s2 += x3*at_s + y3*at_d), 64-ch Conv2DownUp11
    and PLAIN conv2dSame disp/seg output heads."""
    _ext_variant_transport("minidsnetExtPiramidRes",
                           "sdnet_mini_ext_piramid_res", "piramid_res", 103,
                           fp64=True)


def test_seg_dsnet_weight_transport(ref):
    """'sdnet_seg' = seg_dsnet (dsnet_t2.py:2087-2177): minidsnet trunk
    with a SHARED per-view segNet on the deepest tap (shared conv2d_ba0
    skip); the right seg head is warped by the predicted disparity. fp64
    on both sides for the warp-dependent head (see _warp_variant_fp64)."""
    from types import SimpleNamespace

    ref_mod = load_reference_models()
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import import (
        import_seg_dsnet,
    )

    torch.manual_seed(79)
    net = ref_mod.seg_dsnet(SimpleNamespace(), labels=2, pretrained=False,
                            patch_type="1dcorr", include_edges=False)
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_seg_dsnet(sd)

    cfg = PMTConfig()
    cfg.model.net = "sdnet_seg"
    cfg.model.corr_type = "1dcorr"
    model = models.get_network(cfg)

    rng = np.random.default_rng(83)
    H, W = 256, 256
    left = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    right = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), jnp.asarray(right), train=False,
    )
    assert_tree_match(variables, params, stats)

    net.double()
    with torch.no_grad():
        t_seg, t_disp, t_seg_rw, _ = net(
            torch.from_numpy(left).permute(0, 3, 1, 2).double(),
            torch.from_numpy(right).permute(0, 3, 1, 2).double())
    with jax.enable_x64(True):
        p64 = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64),
                                     params)
        s64 = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64),
                                     stats)
        out = model.apply({"params": p64, "batch_stats": s64},
                          jnp.asarray(left, jnp.float64),
                          jnp.asarray(right, jnp.float64), train=False,
                          rngs={"dropout": jax.random.PRNGKey(0)})
    assert_heads_close([
        ("seg1", out["seg1"], t2j(t_seg)),
        ("disp1", out["disp1"], t2j(t_disp)),
        ("seg_right_warped", out["seg2"], t2j(t_seg_rw)),
    ], tol=1e-8)


def test_warp_softmax_weight_transport(ref):
    """'dsnet_warp_soft' = minidsnetDivideSoftmax (dsnet_t2_warp.py:
    169-308): per-class softmax attention from a Conv2DownUp7 Sequential
    head; BOTH seg heads take the LEFT pyramid-b0 tap (:242-243 quirk);
    right seg is warped by the predicted disparity before the blend."""
    t_out, out = _warp_variant_fp64(
        "minidsnetDivideSoftmax", "dsnet_warp_soft", "soft", 53)
    t_left, t_disp, t_both, _, t_right_w, t_at = t_out
    assert_heads_close([
        ("seg_left", out["seg1"], t_left),
        ("disp1", out["disp1"], t_disp),
        ("seg_both", out["seg2"], t_both),
        ("seg_right_warped", out["seg3"], t_right_w),
        ("at_softmax", out["warped_right"], t_at),
    ], tol=1e-8)


def test_warp_disp_weight_transport(ref):
    """'dsnet_warp_disp' = minidsnetDivideDisp (:704-836): the right IMAGE
    is warped into the left view with GT disparity (masked by disp>0)
    before the second backbone/seg pass; sigmoid attention over the
    128-ch (x1_1, x2_1, y3) concat."""
    rng = np.random.default_rng(61)
    disp_np = (rng.random((1, 1, 256, 256)) * 8.0).astype(np.float64)
    t_disp_in = torch.from_numpy(disp_np)
    # keep fp64: both frameworks must sample at bit-identical coordinates
    j_disp_in = np.transpose(disp_np, (0, 2, 3, 1))
    t_out, out = _warp_variant_fp64(
        "minidsnetDivideDisp", "dsnet_warp_disp", "disp", 59,
        torch_extra=t_disp_in, jax_extra={"disp_gt": j_disp_in})
    t_both, t_disp, t_left, _, t_right, t_at = t_out
    assert_heads_close([
        ("seg_both", out["seg1"], t_both),
        ("disp1", out["disp1"], t_disp),
        ("seg_left", out["seg2"], t_left),
        ("seg_right", out["seg3"], t_right),
        ("at_d", out["warped_right"], t_at),
    ], tol=1e-8)


def test_warp_disp_consist_weight_transport(ref):
    """'dsnet_warp_disp_consist' = minidsnetDivideDisp2 (:839-972): like
    disp but warps the right image with the PREDICTED disparity and
    returns the warped image (for the consistency loss) instead of the
    attention map."""
    t_out, out = _warp_variant_fp64(
        "minidsnetDivideDisp2", "dsnet_warp_disp_consist", "disp2", 67)
    t_both, t_disp, t_left, _, t_right, t_warped = t_out
    assert_heads_close([
        ("seg_both", out["seg1"], t_both),
        ("disp1", out["disp1"], t_disp),
        ("seg_left", out["seg2"], t_left),
        ("seg_right", out["seg3"], t_right),
        ("warped_right_img", out["warped_right"], t_warped),
    ], tol=1e-8)


def test_dsnet_weight_transport(ref):
    """'sdnet' = dsnet (dsnet_t2.py:119-321): the original two-head
    cascade — 17x17 normalized 2-D correlation, log-softmax'd coarse seg,
    refinement trunk with stride-2 deconvbn ups, residual head mixing
    (seg2 = 0.9*s2 + 0.1*seg1, disp2 = 0.8*d2 + 0.2*d1)."""
    from types import SimpleNamespace

    ref_mod = load_reference_models()
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import import (
        import_dsnet,
    )

    torch.manual_seed(107)
    net = ref_mod.dsnet(SimpleNamespace(), labels=2, pretrained=False)
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_dsnet(sd)

    cfg = PMTConfig()
    cfg.model.net = "sdnet"
    model = models.get_network(cfg)

    rng = np.random.default_rng(109)
    H, W = 256, 256
    left = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    right = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), jnp.asarray(right), train=False,
    )
    assert_tree_match(variables, params, stats)

    with torch.no_grad():
        t_s1, t_d1, t_s2, t_d2 = net(
            torch.from_numpy(left).permute(0, 3, 1, 2),
            torch.from_numpy(right).permute(0, 3, 1, 2))
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(left), jnp.asarray(right), train=False,
                      rngs={"dropout": jax.random.PRNGKey(0)})
    assert_heads_close([
        ("seg1", out["seg1"], t2j(t_s1)),
        ("disp1", out["disp1"], t2j(t_d1)),
        ("seg2", out["seg2"], t2j(t_s2)),
        ("disp2", out["disp2"], t2j(t_d2)),
    ])


def test_ext_dlab_weight_transport(ref):
    """'sdnet_mini_ext_dlab' = minidsnetExt_deeplab (dsnet_t2.py:2426-2729):
    the Ext decoder skeleton on HANet's deeplabV3plus ResNet-101 trunk
    (ResNet3X3 stem, variant-'D' os=8 dilation, img-pool-first ASPP,
    bot_aspp/bot_fine 1x1 projections — models_hanet/resnet_pytorch.py:
    7-232). The backbone taps (dec0_up, high, middle, dec0_fine) feed the
    flagship-style segNet/corr/attention decoders."""
    from types import SimpleNamespace

    ref_mod = load_reference_models()
    import models_hanet.Resnet as hanet_resnet
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import_families import (
        import_ext_dlab,
    )

    # resnet101() defaults pretrained=True -> torch-hub download; this
    # environment has no egress, so force random init (weight transport
    # proves wiring regardless of the init distribution)
    orig = hanet_resnet.resnet101
    hanet_resnet.resnet101 = lambda pretrained=True, **kw: orig(
        pretrained=False, **kw)
    try:
        torch.manual_seed(113)
        # backbone must be a name from the channel table even though the
        # trunk is always deeplabV3plus — 'deeplab' itself leaves
        # inplane_seg2 unbound and CRASHES (dsnet_t2.py:2541); the train
        # scripts pass densenet (inplane_seg2=512 == middle_level width)
        net = ref_mod.minidsnetExt_deeplab(
            SimpleNamespace(aspp=0, hanet=0, convDeconvOut=0, abilation=[]),
            labels=2, pretrained=False, patch_type="1dcorr",
            include_edges=False, backbone="densenet")
    finally:
        hanet_resnet.resnet101 = orig
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_ext_dlab(sd)

    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext_dlab"
    cfg.model.corr_type = "1dcorr"
    model = models.get_network(cfg)

    rng = np.random.default_rng(127)
    H, W = 128, 128  # /8 trunk: keep the CPU ResNet-101 pass small
    left = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    right = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), jnp.asarray(right), train=False,
    )
    assert_tree_match(variables, params, stats)

    with torch.no_grad():
        t_seg, t_disp, t_seg2, _ = net(
            torch.from_numpy(left).permute(0, 3, 1, 2),
            torch.from_numpy(right).permute(0, 3, 1, 2))
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(left), jnp.asarray(right), train=False,
                      rngs={"dropout": jax.random.PRNGKey(0)})
    assert_heads_close([
        ("seg1", out["seg1"], t2j(t_seg)),
        ("disp1", out["disp1"], t2j(t_disp)),
        ("seg2", out["seg2"], t2j(t_seg2)),
    ])


def _flagship_transport(aspp=0, hanet=0, seed=131):
    """Flagship minidsnetExt transport at the aspp/hanet configs the
    round-2 VERDICT flagged as unproven (weak #4): aspp=1 (ASPP over the
    /4 tap), aspp=2 (ASPP over /16 taps + second 1-D correlation), and
    the HANet head (pos=None path — the pos-grid wiring is covered by
    test_round2's HANet unit tests)."""
    from types import SimpleNamespace

    ref_mod = load_reference_models()
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import import (
        import_minidsnet_ext,
    )

    torch.manual_seed(seed)
    tcfg = SimpleNamespace(dropout=0.0, multaskloss=0, aspp=aspp, use_att=1,
                           hanet=hanet, convDeconvOut=0, abilation="")
    net = ref_mod.minidsnetExt(tcfg, labels=2, pretrained=False,
                               patch_type="1dcorr", include_edges=False,
                               backbone="densenet")
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_minidsnet_ext(sd, aspp_mod=aspp,
                                         hanet=bool(hanet))

    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg.model.backbone = "densenet"
    cfg.model.corr_type = "1dcorr"
    cfg.model.aspp = aspp
    cfg.model.hanet = hanet
    model = models.get_network(cfg)

    rng = np.random.default_rng(seed + 2)
    H, W = 256, 256
    left = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    right = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), jnp.asarray(right), train=False,
    )
    assert_tree_match(variables, params, stats)

    if aspp:
        # random-init ASPP amplifies head-2 activations to ~1e5, where fp32
        # rounding alone is ~1.5e-4 relative — pin the wiring in fp64
        net.double()
        with torch.no_grad():
            t_args = (torch.from_numpy(left).permute(0, 3, 1, 2).double(),
                      torch.from_numpy(right).permute(0, 3, 1, 2).double())
            t_seg, t_disp, t_seg2, _ = net(*t_args)
        with jax.enable_x64(True):
            p64 = jax.tree_util.tree_map(
                lambda a: np.asarray(a, np.float64), params)
            s64 = jax.tree_util.tree_map(
                lambda a: np.asarray(a, np.float64), stats)
            out = model.apply({"params": p64, "batch_stats": s64},
                              jnp.asarray(left, jnp.float64),
                              jnp.asarray(right, jnp.float64), train=False,
                              rngs={"dropout": jax.random.PRNGKey(0)})
        tol = 1e-8
    else:
        with torch.no_grad():
            t_args = (torch.from_numpy(left).permute(0, 3, 1, 2),
                      torch.from_numpy(right).permute(0, 3, 1, 2))
            t_seg, t_disp, t_seg2, _ = (net(*t_args, None) if hanet
                                        else net(*t_args))
        out = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(left), jnp.asarray(right), train=False,
                          rngs={"dropout": jax.random.PRNGKey(0)})
        tol = 1e-4
    assert_heads_close([
        ("seg1", out["seg1"], t2j(t_seg)),
        ("disp1", out["disp1"], t2j(t_disp)),
        ("seg2", out["seg2"], t2j(t_seg2)),
    ], tol=tol)


def test_flagship_aspp1_weight_transport(ref):
    _flagship_transport(aspp=1, seed=131)


def test_flagship_aspp2_weight_transport(ref):
    _flagship_transport(aspp=2, seed=137)


def test_flagship_hanet_weight_transport(ref):
    _flagship_transport(aspp=0, hanet=1, seed=139)


def test_encdec_scse_weight_transport(ref):
    """EncoderDecoderNet resnet18/unet_scse (models_deeplab/net.py:12-79):
    torchvision 5-stage encoder split, SCSE decoders at every scale,
    hypercolumn concat, 1x1+ABN+1x1 logits. Not reachable from the
    reference CLI but part of its models_deeplab surface (SURVEY §2.3)."""
    from models_deeplab.net import EncoderDecoderNet as TorchEncDec
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.models.encdec import (
        EncoderDecoderNet,
    )
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import_families import (
        import_encdec,
    )

    torch.manual_seed(157)
    net = TorchEncDec(output_channels=19, enc_type="resnet18",
                      dec_type="unet_scse", pretrained=False)
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_encdec(sd, enc_type="resnet18")

    model = EncoderDecoderNet(labels=19, enc_type="resnet18",
                              dec_type="unet_scse")
    rng = np.random.default_rng(163)
    x = rng.standard_normal((1, 128, 128, 3), dtype=np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x), train=False,
    )
    assert_tree_match(variables, params, stats)

    with torch.no_grad():
        t_out = net(torch.from_numpy(x).permute(0, 3, 1, 2))
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), train=False,
                      rngs={"dropout": jax.random.PRNGKey(0)})
    assert_heads_close([("seg1", out["seg1"], t2j(t_out))])


def _encdec_transport(enc_type, dec_type, seed):
    from models_deeplab.net import EncoderDecoderNet as TorchEncDec
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.models.encdec import (
        EncoderDecoderNet,
    )
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import_families import (
        import_encdec,
    )

    torch.manual_seed(seed)
    net = TorchEncDec(output_channels=19, enc_type=enc_type,
                      dec_type=dec_type, pretrained=False)
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_encdec(sd, enc_type=enc_type, dec_type=dec_type)

    model = EncoderDecoderNet(labels=19, enc_type=enc_type,
                              dec_type=dec_type)
    rng = np.random.default_rng(seed + 2)
    x = rng.standard_normal((1, 128, 128, 3), dtype=np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x), train=False,
    )
    assert_tree_match(variables, params, stats)

    with torch.no_grad():
        t_out = net(torch.from_numpy(x).permute(0, 3, 1, 2))
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), train=False,
                      rngs={"dropout": jax.random.PRNGKey(0)})
    assert_heads_close([("seg1", out["seg1"], t2j(t_out))])


def test_encdec_oc_weight_transport(ref):
    """EncoderDecoderNet resnet34/unet_oc: ObjectContext non-local decoder
    (oc.py SelfAttentionBlock2D q/k shared, zero-init W) on the BasicBlock
    resnet34 split."""
    _encdec_transport("resnet34", "unet_oc", 167)


def test_encdec_seibn_weight_transport(ref):
    """EncoderDecoderNet resnet50/unet_seibn: SE + half-instance-norm IBN-a
    decoder (ibn.py) on the Bottleneck resnet50 split."""
    _encdec_transport("resnet50", "unet_seibn", 173)


def test_flagship_resnet50_backbone_transport(ref):
    """Flagship minidsnetExt on the dilated multi-grid resnet50 trunk
    (-backbone resnet50: models/resnet_deeplab.py:45-170 os=16 + the
    aspp_4 head over the deepest tap, dsnet_t2.py:957-960 + :1186-1188).
    Proves the 7x7-stem/multigrid backbone flavor the densenet tests
    can't reach."""
    from types import SimpleNamespace

    ref_mod = load_reference_models()
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import import (
        import_minidsnet_ext,
    )

    torch.manual_seed(179)
    tcfg = SimpleNamespace(dropout=0.0, multaskloss=0, aspp=0, use_att=1,
                           hanet=0, convDeconvOut=0, abilation="")
    net = ref_mod.minidsnetExt(tcfg, labels=2, pretrained=False,
                               patch_type="1dcorr", include_edges=False,
                               backbone="resnet50")
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_minidsnet_ext(sd, backbone="resnet50")

    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg.model.backbone = "resnet50"
    cfg.model.corr_type = "1dcorr"
    model = models.get_network(cfg)

    rng = np.random.default_rng(181)
    H, W = 256, 256
    left = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    right = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), jnp.asarray(right), train=False,
    )
    assert_tree_match(variables, params, stats)

    # the aspp_4 head amplifies activations like aspp 1/2 do — fp64
    net.double()
    with torch.no_grad():
        t_seg, t_disp, t_seg2, _ = net(
            torch.from_numpy(left).permute(0, 3, 1, 2).double(),
            torch.from_numpy(right).permute(0, 3, 1, 2).double())
    with jax.enable_x64(True):
        p64 = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64),
                                     params)
        s64 = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64),
                                     stats)
        out = model.apply({"params": p64, "batch_stats": s64},
                          jnp.asarray(left, jnp.float64),
                          jnp.asarray(right, jnp.float64), train=False,
                          rngs={"dropout": jax.random.PRNGKey(0)})
    assert_heads_close([
        ("seg1", out["seg1"], t2j(t_seg)),
        ("disp1", out["disp1"], t2j(t_disp)),
        ("seg2", out["seg2"], t2j(t_seg2)),
    ], tol=1e-8)


def test_flagship_efficientnet_b2_backbone_transport(ref):
    """Flagship minidsnetExt on efficientnet-b2 (dsnet_t2.py:1973-1980:
    extract_endpoints reductions (16,24,48,120,1408), segnet_input 2816,
    inplane_seg2 304 per :1046-1053). The oracle is tests/effnet_oracle.py —
    an independent torch implementation of the efficientnet_pytorch
    architecture with identical state-dict keys (the real package is not
    installed in this image); this pins MBConv wiring, SE channel counts,
    TF-dynamic-SAME padding alignment and the 0.6.x endpoint semantics."""
    from types import SimpleNamespace

    ref_mod = load_reference_models()
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import import (
        import_minidsnet_ext,
    )

    torch.manual_seed(229)
    tcfg = SimpleNamespace(dropout=0.0, multaskloss=0, aspp=0, use_att=1,
                           hanet=0, convDeconvOut=0, abilation="")
    net = ref_mod.minidsnetExt(tcfg, labels=2, pretrained=False,
                               patch_type="1dcorr", include_edges=False,
                               backbone="efficientnet-b2")
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_minidsnet_ext(sd, backbone="efficientnet-b2")

    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg.model.backbone = "efficientnet-b2"
    cfg.model.corr_type = "1dcorr"
    model = models.get_network(cfg)

    rng = np.random.default_rng(233)
    H, W = 256, 256
    left = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    right = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), jnp.asarray(right), train=False,
    )
    assert_tree_match(variables, params, stats)

    # 80+ blocks of swish/SE compounding on random init — pin in fp64
    net.double()
    with torch.no_grad():
        t_seg, t_disp, t_seg2, _ = net(
            torch.from_numpy(left).permute(0, 3, 1, 2).double(),
            torch.from_numpy(right).permute(0, 3, 1, 2).double())
    with jax.enable_x64(True):
        p64 = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64),
                                     params)
        s64 = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64),
                                     stats)
        out = model.apply({"params": p64, "batch_stats": s64},
                          jnp.asarray(left, jnp.float64),
                          jnp.asarray(right, jnp.float64), train=False,
                          rngs={"dropout": jax.random.PRNGKey(0)})
    assert_heads_close([
        ("seg1", out["seg1"], t2j(t_seg)),
        ("disp1", out["disp1"], t2j(t_disp)),
        ("seg2", out["seg2"], t2j(t_seg2)),
    ], tol=1e-8)


def test_flagship_2dcorr_weight_transport(ref):
    """Flagship minidsnetExt with patch_type='2dcorr' (dsnet_t2.py:1072-1077:
    17x17 patch, corrConv2d in_planes 289, forward flattens (ph,pw) and
    divides by channels :1190-1192). The 1dcorr flagship is proven in
    test_parity_full_model; this pins the other correlation geometry end to
    end (patch flattening order dy-major + channel normalization + the
    289-ch consumer conv)."""
    from types import SimpleNamespace

    ref_mod = load_reference_models()
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import import (
        import_minidsnet_ext,
    )

    torch.manual_seed(223)
    tcfg = SimpleNamespace(dropout=0.0, multaskloss=0, aspp=0, use_att=1,
                           hanet=0, convDeconvOut=0, abilation="")
    net = ref_mod.minidsnetExt(tcfg, labels=2, pretrained=False,
                               patch_type="2dcorr", include_edges=False,
                               backbone="densenet")
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_minidsnet_ext(sd)

    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg.model.backbone = "densenet"
    cfg.model.corr_type = "2dcorr"
    model = models.get_network(cfg)

    rng = np.random.default_rng(227)
    H, W = 256, 256
    left = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    right = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), jnp.asarray(right), train=False,
    )
    assert_tree_match(variables, params, stats)

    with torch.no_grad():
        t_seg, t_disp, t_seg2, _ = net(
            torch.from_numpy(left).permute(0, 3, 1, 2),
            torch.from_numpy(right).permute(0, 3, 1, 2))
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(left), jnp.asarray(right), train=False,
                      rngs={"dropout": jax.random.PRNGKey(0)})
    assert_heads_close([
        ("seg1", out["seg1"], t2j(t_seg)),
        ("disp1", out["disp1"], t2j(t_disp)),
        ("seg2", out["seg2"], t2j(t_seg2)),
    ])


def test_flagship_dn201_backbone_transport(ref):
    """Flagship minidsnetExt on densenet201 (-backbone dn201 — reference
    dsnet_t2.py:1916-1917, models/densenet.py:366). Regression test for the
    block config: densenet201 is (6,12,48,32), NOT (6,12,48,36) — the wrong
    value shifts the final tap from 1920 to 2048 channels and breaks
    checkpoint import silently."""
    from types import SimpleNamespace

    ref_mod = load_reference_models()
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import import (
        import_minidsnet_ext,
    )

    torch.manual_seed(211)
    tcfg = SimpleNamespace(dropout=0.0, multaskloss=0, aspp=0, use_att=1,
                           hanet=0, convDeconvOut=0, abilation="")
    net = ref_mod.minidsnetExt(tcfg, labels=2, pretrained=False,
                               patch_type="1dcorr", include_edges=False,
                               backbone="dn201")
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_minidsnet_ext(sd, backbone="dn201")

    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg.model.backbone = "dn201"
    cfg.model.corr_type = "1dcorr"
    model = models.get_network(cfg)

    rng = np.random.default_rng(213)
    H, W = 256, 256
    left = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    right = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), jnp.asarray(right), train=False,
    )
    assert_tree_match(variables, params, stats)

    net.double()
    with torch.no_grad():
        t_seg, t_disp, t_seg2, _ = net(
            torch.from_numpy(left).permute(0, 3, 1, 2).double(),
            torch.from_numpy(right).permute(0, 3, 1, 2).double())
    with jax.enable_x64(True):
        p64 = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64),
                                     params)
        s64 = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64),
                                     stats)
        out = model.apply({"params": p64, "batch_stats": s64},
                          jnp.asarray(left, jnp.float64),
                          jnp.asarray(right, jnp.float64), train=False,
                          rngs={"dropout": jax.random.PRNGKey(0)})
    assert_heads_close([
        ("seg1", out["seg1"], t2j(t_seg)),
        ("disp1", out["disp1"], t2j(t_disp)),
        ("seg2", out["seg2"], t2j(t_seg2)),
    ], tol=1e-8)


def test_flagship_dn161_backbone_transport(ref):
    """Flagship minidsnetExt on densenet161 (-backbone dn161 — reference
    dsnet_t2.py:1925-1926, models/densenet.py:328-341): unlike dn169/201
    this variant changes the STEM width (96 init features) and growth rate
    (48), so it proves the import + flax model are width-generic, not just
    depth-generic."""
    from types import SimpleNamespace

    ref_mod = load_reference_models()
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import import (
        import_minidsnet_ext,
    )

    torch.manual_seed(197)
    tcfg = SimpleNamespace(dropout=0.0, multaskloss=0, aspp=0, use_att=1,
                           hanet=0, convDeconvOut=0, abilation="")
    net = ref_mod.minidsnetExt(tcfg, labels=2, pretrained=False,
                               patch_type="1dcorr", include_edges=False,
                               backbone="dn161")
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_minidsnet_ext(sd, backbone="dn161")

    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg.model.backbone = "dn161"
    cfg.model.corr_type = "1dcorr"
    model = models.get_network(cfg)

    rng = np.random.default_rng(199)
    H, W = 256, 256
    left = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    right = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), jnp.asarray(right), train=False,
    )
    assert_tree_match(variables, params, stats)

    net.double()
    with torch.no_grad():
        t_seg, t_disp, t_seg2, _ = net(
            torch.from_numpy(left).permute(0, 3, 1, 2).double(),
            torch.from_numpy(right).permute(0, 3, 1, 2).double())
    with jax.enable_x64(True):
        p64 = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64),
                                     params)
        s64 = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64),
                                     stats)
        out = model.apply({"params": p64, "batch_stats": s64},
                          jnp.asarray(left, jnp.float64),
                          jnp.asarray(right, jnp.float64), train=False,
                          rngs={"dropout": jax.random.PRNGKey(0)})
    assert_heads_close([
        ("seg1", out["seg1"], t2j(t_seg)),
        ("disp1", out["disp1"], t2j(t_disp)),
        ("seg2", out["seg2"], t2j(t_seg2)),
    ], tol=1e-8)


def test_flagship_dn169_backbone_transport(ref):
    """Flagship minidsnetExt on densenet169 (-backbone dn169, block config
    (6,12,32,32) — models/densenet.py:342-355): proves the densenet-variant
    backbone plumbing beyond the 121 the other tests use."""
    from types import SimpleNamespace

    ref_mod = load_reference_models()
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import import (
        import_minidsnet_ext,
    )

    torch.manual_seed(191)
    tcfg = SimpleNamespace(dropout=0.0, multaskloss=0, aspp=0, use_att=1,
                           hanet=0, convDeconvOut=0, abilation="")
    net = ref_mod.minidsnetExt(tcfg, labels=2, pretrained=False,
                               patch_type="1dcorr", include_edges=False,
                               backbone="dn169")
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_minidsnet_ext(sd, backbone="dn169")

    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg.model.backbone = "dn169"
    cfg.model.corr_type = "1dcorr"
    model = models.get_network(cfg)

    rng = np.random.default_rng(193)
    H, W = 256, 256
    left = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    right = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), jnp.asarray(right), train=False,
    )
    assert_tree_match(variables, params, stats)

    # deeper dense blocks amplify random-init activations to ~3e4 where
    # fp32 rounding alone exceeds 1e-4 relative — pin in fp64 (see aspp)
    net.double()
    with torch.no_grad():
        t_seg, t_disp, t_seg2, _ = net(
            torch.from_numpy(left).permute(0, 3, 1, 2).double(),
            torch.from_numpy(right).permute(0, 3, 1, 2).double())
    with jax.enable_x64(True):
        p64 = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64),
                                     params)
        s64 = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64),
                                     stats)
        out = model.apply({"params": p64, "batch_stats": s64},
                          jnp.asarray(left, jnp.float64),
                          jnp.asarray(right, jnp.float64), train=False,
                          rngs={"dropout": jax.random.PRNGKey(0)})
    assert_heads_close([
        ("seg1", out["seg1"], t2j(t_seg)),
        ("disp1", out["disp1"], t2j(t_disp)),
        ("seg2", out["seg2"], t2j(t_seg2)),
    ], tol=1e-8)
