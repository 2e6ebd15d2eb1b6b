"""Weight-conversion parity: torch modules vs flax with imported weights."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from pmt_learning_for_semantic_segmentation_and_disparity_tpu.utils import (
    torch_import as TI,
)


def test_conv_kernel_parity(rng):
    x = rng.standard_normal((1, 8, 10, 4), dtype=np.float32)
    conv = torch.nn.Conv2d(4, 6, 3, padding=1, bias=False)
    with torch.no_grad():
        ref = conv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    k = TI.conv_kernel(conv.weight.detach().numpy())
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(got), ref.transpose(0, 2, 3, 1), atol=1e-5
    )


def test_deconv_as_conv_kernel_parity(rng):
    """torch ConvTranspose2d stride-1 + centered crop == SAME conv with the
    flipped/transposed kernel (models/blocks.py DeconvBN rationale)."""
    x = rng.standard_normal((1, 9, 12, 4), dtype=np.float32)
    deconv = torch.nn.ConvTranspose2d(4, 5, 3, stride=1, bias=False)
    with torch.no_grad():
        full = deconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    # reference centered crop for k=3,s=1 starts at 1 (torch_model.py:334-346)
    ref = full[:, :, 1:-1, 1:-1]
    k = TI.deconv_as_conv_kernel(deconv.weight.detach().numpy())
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k.copy()), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(got), ref.transpose(0, 2, 3, 1), atol=1e-5
    )


def test_dense_layer_import_parity(rng):
    """One torchvision-style dense layer, end to end through the converter."""
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.models.densenet import (
        _DenseLayer,
    )

    cin, growth, bn_size = 8, 4, 4
    x = rng.standard_normal((1, 6, 6, cin), dtype=np.float32)

    t_norm1 = torch.nn.BatchNorm2d(cin).eval()
    t_conv1 = torch.nn.Conv2d(cin, bn_size * growth, 1, bias=False)
    t_norm2 = torch.nn.BatchNorm2d(bn_size * growth).eval()
    t_conv2 = torch.nn.Conv2d(bn_size * growth, growth, 3, padding=1, bias=False)
    with torch.no_grad():
        for bn in (t_norm1, t_norm2):
            bn.weight.uniform_(0.5, 1.5)
            bn.bias.uniform_(-0.5, 0.5)
            bn.running_mean.uniform_(-0.5, 0.5)
            bn.running_var.uniform_(0.5, 1.5)
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        y = t_conv1(torch.relu(t_norm1(xt)))
        y = t_conv2(torch.relu(t_norm2(y)))
        ref = torch.cat([xt, y], 1).numpy().transpose(0, 2, 3, 1)

    sd = {}
    for name, bn, conv in (("norm1", t_norm1, t_conv1),
                           ("norm2", t_norm2, t_conv2)):
        pre = f"features.denseblock1.denselayer1.{name}"
        sd[f"{pre}.weight"] = bn.weight.detach().numpy()
        sd[f"{pre}.bias"] = bn.bias.detach().numpy()
        sd[f"{pre}.running_mean"] = bn.running_mean.numpy()
        sd[f"{pre}.running_var"] = bn.running_var.numpy()
    sd["features.denseblock1.denselayer1.conv1.weight"] = (
        t_conv1.weight.detach().numpy()
    )
    sd["features.denseblock1.denselayer1.conv2.weight"] = (
        t_conv2.weight.detach().numpy()
    )

    lp = {
        "norm1": {"scale": sd["features.denseblock1.denselayer1.norm1.weight"],
                  "bias": sd["features.denseblock1.denselayer1.norm1.bias"]},
        "conv1": {"kernel": TI.conv_kernel(
            sd["features.denseblock1.denselayer1.conv1.weight"])},
        "norm2": {"scale": sd["features.denseblock1.denselayer1.norm2.weight"],
                  "bias": sd["features.denseblock1.denselayer1.norm2.bias"]},
        "conv2": {"kernel": TI.conv_kernel(
            sd["features.denseblock1.denselayer1.conv2.weight"])},
    }
    ls = {
        "norm1": {"mean": sd["features.denseblock1.denselayer1.norm1.running_mean"],
                  "var": sd["features.denseblock1.denselayer1.norm1.running_var"]},
        "norm2": {"mean": sd["features.denseblock1.denselayer1.norm2.running_mean"],
                  "var": sd["features.denseblock1.denselayer1.norm2.running_var"]},
    }
    layer = _DenseLayer(growth)
    got = layer.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, lp),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, ls)},
        jnp.asarray(x), False,
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_import_densenet121_full_tree(rng):
    """Synthesize a torchvision-style state dict, import, run the backbone."""
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.models.densenet import (
        densenet121,
    )

    # Build the expected tree by initializing our model, then fabricate a
    # torch state dict with matching shapes and check import succeeds and
    # produces identical tree structure.
    m = densenet121()
    x = jnp.zeros((1, 64, 64, 3))
    vs = m.init(jax.random.PRNGKey(0), x)

    sd = {}

    def fabricate(prefix_t, p_tree, s_tree):
        sd[f"{prefix_t}.conv0.weight"] = rng.standard_normal(
            (64, 3, 7, 7), dtype=np.float32
        )

    sd["features.conv0.weight"] = rng.standard_normal((64, 3, 7, 7),
                                                      dtype=np.float32)

    def add_bn(pre, c):
        sd[f"{pre}.weight"] = np.ones(c, np.float32)
        sd[f"{pre}.bias"] = np.zeros(c, np.float32)
        sd[f"{pre}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{pre}.running_var"] = np.ones(c, np.float32)

    add_bn("features.norm0", 64)
    nf = 64
    for bi, nl in enumerate((6, 12, 24, 16)):
        for li in range(nl):
            pre = f"features.denseblock{bi + 1}.denselayer{li + 1}"
            cin = nf + li * 32
            add_bn(f"{pre}.norm1", cin)
            sd[f"{pre}.conv1.weight"] = rng.standard_normal(
                (128, cin, 1, 1), dtype=np.float32) * 0.01
            add_bn(f"{pre}.norm2", 128)
            sd[f"{pre}.conv2.weight"] = rng.standard_normal(
                (32, 128, 3, 3), dtype=np.float32) * 0.01
        nf += nl * 32
        if bi < 3:
            add_bn(f"features.transition{bi + 1}.norm", nf)
            sd[f"features.transition{bi + 1}.conv.weight"] = (
                rng.standard_normal((nf // 2, nf, 1, 1), dtype=np.float32) * 0.01
            )
            nf //= 2
    add_bn("features.norm5", nf)

    params, stats = TI.import_densenet121(sd)
    # identical tree structure => drop-in replacement for init params
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, vs["params"])
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes
    out = m.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        x,
    )
    assert out[-1].shape == (1, 2, 2, 1024)
