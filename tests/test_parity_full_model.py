"""Full-model activation parity vs the torch reference (VERDICT #1).

Instantiates the reference minidsnetExt (models/dsnet_t2.py:941-1299) on
CPU with shimmed CUDA deps, transports its randomly-initialized weights
into our flax MiniDSNetExt via utils.torch_import.import_minidsnet_ext,
and checks the four heads agree to fp32 tolerance on identical inputs.

This is weight-transport parity: it proves the wiring (every conv, BN,
skip, gate, resize and the correlation kernel) matches the reference
function — ImageNet weights are not required for that.
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
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import import (  # noqa: E402
    import_minidsnet_ext,
)
from reference_oracle import load_reference_models  # noqa: E402

# minimum size where the reference's AvgPool2d(128) pyramid branch is
# well-defined (tap0 = input/2 must be >= 128)
H, W = 256, 256


def _tree_keys(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(p): np.shape(v) for p, v in flat}


@pytest.fixture(scope="module")
def oracle_pair():
    """(torch net, our model, grafted variables, torch/np inputs)."""
    from types import SimpleNamespace

    dsnet_t2 = load_reference_models()
    torch.manual_seed(7)
    tcfg = SimpleNamespace(dropout=0.0, multaskloss=0, aspp=0, use_att=1,
                           hanet=0, convDeconvOut=0, abilation="")
    net = dsnet_t2.minidsnetExt(tcfg, labels=2, pretrained=False,
                                patch_type="1dcorr", include_edges=False,
                                backbone="densenet")
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_minidsnet_ext(sd, labels=2)

    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg.model.backbone = "densenet"
    cfg.model.corr_type = "1dcorr"
    model = models.get_network(cfg)

    rng = np.random.default_rng(3)
    left = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    right = rng.standard_normal((1, H, W, 3), dtype=np.float32)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), jnp.asarray(right), train=False,
    )
    # the imported tree must be structurally IDENTICAL to a fresh init —
    # this is the line-by-line wiring check
    init_keys = _tree_keys(variables["params"])
    imp_keys = _tree_keys(params)
    assert init_keys == imp_keys, (
        f"param tree mismatch:\n only in init: "
        f"{sorted(set(init_keys) - set(imp_keys))[:10]}\n only in import: "
        f"{sorted(set(imp_keys) - set(init_keys))[:10]}\n shape diffs: "
        f"{[(k, init_keys[k], imp_keys[k]) for k in init_keys if k in imp_keys and init_keys[k] != imp_keys[k]][:10]}"
    )
    init_stats = _tree_keys(variables["batch_stats"])
    imp_stats = _tree_keys(stats)
    assert init_stats == imp_stats, (
        f"batch_stats mismatch: only init "
        f"{sorted(set(init_stats) - set(imp_stats))[:10]} / only import "
        f"{sorted(set(imp_stats) - set(init_stats))[:10]}"
    )
    grafted = {"params": params, "batch_stats": stats}
    return net, model, grafted, left, right


def test_flagship_weight_transport_heads_match(oracle_pair):
    net, model, variables, left, right = oracle_pair
    with torch.no_grad():
        t_out = net(torch.from_numpy(left).permute(0, 3, 1, 2),
                    torch.from_numpy(right).permute(0, 3, 1, 2))
    t_seg1, t_disp1, t_seg2, t_disp2 = [
        o.numpy().transpose(0, 2, 3, 1) for o in t_out
    ]
    out = model.apply(variables, jnp.asarray(left), jnp.asarray(right),
                      train=False, rngs={"dropout": jax.random.PRNGKey(0)})
    for name, ours, theirs in (
        ("seg1", out["seg1"], t_seg1),
        ("disp1", out["disp1"], t_disp1),
        ("seg2", out["seg2"], t_seg2),
        ("disp2", out["disp2"], t_disp2),
    ):
        ours = np.asarray(ours)
        scale = max(1.0, float(np.abs(theirs).max()))
        diff = np.abs(ours - theirs).max()
        assert diff / scale < 1e-4, (
            f"{name}: max|d|={diff:.3e} (scale {scale:.3e}), "
            f"ours range [{ours.min():.3f},{ours.max():.3f}] vs torch "
            f"[{theirs.min():.3f},{theirs.max():.3f}]"
        )


def test_dsnetv2_weight_transport_heads_match():
    """dsnetv2 (dsnet_t2.py:402-616) — VERDICT flagged our wiring as
    'reconstructed, not verified'; this verifies it end-to-end by weight
    transport. Covers the legacy piramidNet (v1) backbone, the stride-2
    deconvbn upsamplers, the always-normalized correlation and the
    log-softmax/raw-logit 0.9/0.1 head mix."""
    from types import SimpleNamespace

    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils.torch_import import (
        import_dsnetv2,
    )

    dsnet_t2 = load_reference_models()
    torch.manual_seed(11)
    net = dsnet_t2.dsnetv2(SimpleNamespace(), labels=2, pretrained=False,
                           patch_type="1dcorr", include_edges=False)
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = import_dsnetv2(sd, labels=2)

    cfg = PMTConfig()
    cfg.model.net = "sdnetv2"
    cfg.model.corr_type = "1dcorr"
    model = models.get_network(cfg)

    rng = np.random.default_rng(5)
    left = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    right = rng.standard_normal((1, H, W, 3), dtype=np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(left), jnp.asarray(right), train=False,
    )
    init_keys = _tree_keys(variables["params"])
    imp_keys = _tree_keys(params)
    assert init_keys == imp_keys, (
        f"param tree mismatch:\n only in init: "
        f"{sorted(set(init_keys) - set(imp_keys))[:10]}\n only in import: "
        f"{sorted(set(imp_keys) - set(init_keys))[:10]}\n shape diffs: "
        f"{[(k, init_keys[k], imp_keys[k]) for k in init_keys if k in imp_keys and init_keys[k] != imp_keys[k]][:10]}"
    )
    assert _tree_keys(variables["batch_stats"]) == _tree_keys(stats)

    with torch.no_grad():
        t_out = net(torch.from_numpy(left).permute(0, 3, 1, 2),
                    torch.from_numpy(right).permute(0, 3, 1, 2))
    t_seg1, t_disp1, t_seg2, t_disp2 = [
        o.numpy().transpose(0, 2, 3, 1) for o in t_out
    ]
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(left), jnp.asarray(right), train=False,
                      rngs={"dropout": jax.random.PRNGKey(0)})
    for name, ours, theirs in (
        ("seg1", out["seg1"], t_seg1),
        ("disp1", out["disp1"], t_disp1),
        ("seg2", out["seg2"], t_seg2),
        ("disp2", out["disp2"], t_disp2),
    ):
        ours = np.asarray(ours)
        scale = max(1.0, float(np.abs(theirs).max()))
        diff = np.abs(ours - theirs).max()
        assert diff / scale < 1e-4, (
            f"{name}: max|d|={diff:.3e} (scale {scale:.3e}), "
            f"ours range [{ours.min():.3f},{ours.max():.3f}] vs torch "
            f"[{theirs.min():.3f},{theirs.max():.3f}]"
        )


def test_session_restores_torch_checkpoint(tmp_path, oracle_pair):
    """-load_weights <file.pth.tar> imports a reference torch checkpoint
    into the Session (the migration path for reference users)."""
    net, model, grafted, left, right = oracle_pair
    ckpt = {"state_dict": {f"module.{k}": v
                           for k, v in net.state_dict().items()},
            "epoch": 3}
    path = str(tmp_path / "ref_ckpt.pth.tar")
    torch.save(ckpt, path)

    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.training.loop import (
        _import_torch_checkpoint,
    )

    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    repl = _import_torch_checkpoint(cfg, path)
    # imported tree == the direct state-dict conversion
    for a, b in zip(jax.tree_util.tree_leaves(repl["params"]),
                    jax.tree_util.tree_leaves(grafted["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pretrained_backbone_path(tmp_path):
    """-pretrained_path imports densenet121 weights into the backbone at
    init (models/densenet.py:248-258 torch-hub equivalent, offline)."""
    load_reference_models()
    from models.densenet import densenet121

    torch.manual_seed(3)
    dn = densenet121(pretrained=False)
    path = str(tmp_path / "densenet121.pth")
    torch.save(dn.state_dict(), path)

    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.training import (
        Session,
    )

    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini"
    cfg.model.pretrained_path = path
    rng = np.random.default_rng(0)
    batch = {
        "left": rng.standard_normal((1, 64, 96, 3), dtype=np.float32),
        "right": rng.standard_normal((1, 64, 96, 3), dtype=np.float32),
        "seg": np.zeros((1, 64, 96, 2), np.float32),
        "disp": np.zeros((1, 64, 96, 1), np.float32),
        "edges": np.zeros((1, 64, 96, 1), np.float32),
    }
    s = Session(cfg, use_mesh=False)
    s.init_state(batch)
    conv0 = np.asarray(
        s.state.params["features"]["backbone"]["conv0"]["kernel"]
    )
    want = dn.state_dict()["conv0.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(conv0, want)
