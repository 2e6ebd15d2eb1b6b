"""Native (C++) data runtime parity tests vs the numpy pipeline."""
import numpy as np
import pytest

from pmt_learning_for_semantic_segmentation_and_disparity_tpu import data as D
from pmt_learning_for_semantic_segmentation_and_disparity_tpu.data import native as N

pytestmark = pytest.mark.skipif(
    not N.native_available(), reason="native lib not built"
)


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("native_fixture")
    manifests = D.make_roses_fixture(str(root), n_train=3, n_test=1,
                                     hw=(64, 96))
    return manifests


def test_native_batch_matches_numpy_pipeline(fixture):
    manifests = fixture
    lp = D.read_manifest(fixture["left"])
    rp = D.read_manifest(fixture["right"])
    dp = D.read_manifest(fixture["disp"])
    sp = D.read_manifest(fixture["seg"])
    ip = D.read_manifest(fixture["inst"])

    out = N.decode_roses_batch(lp, rp, dp, sp, ip, hw=(64, 96),
                               activation="linear")
    assert out["left"].shape == (3, 64, 96, 3)

    # numpy reference path
    ds = D.StereoSegDataset(
        list(zip(lp, rp)), list(zip(dp, sp, ip)), 2, 1.0, "roses",
        np.array([[0, 0, 0], [1, 1, 1]], np.float32),
        output_activation="linear",
    )
    for i in range(3):
        raw = ds.load_raw(i)
        np.testing.assert_allclose(
            out["left"][i], raw["left"] / 255.0, atol=1e-6
        )
        np.testing.assert_allclose(out["disp"][i], raw["disp"], atol=1e-5)
        np.testing.assert_array_equal(out["seg"][i], raw["seg"])
        np.testing.assert_array_equal(out["edges"][i], raw["edges"])


def test_native_activation_modes(fixture):
    lp = D.read_manifest(fixture["left"])[:1]
    rp = D.read_manifest(fixture["right"])[:1]
    dp = D.read_manifest(fixture["disp"])[:1]
    sp = D.read_manifest(fixture["seg"])[:1]
    ip = D.read_manifest(fixture["inst"])[:1]
    sig = N.decode_roses_batch(lp, rp, dp, sp, ip, hw=(64, 96),
                               activation="sigmoid", max_d=100.0)
    assert sig["disp"].max() <= 1.0
    tanh = N.decode_roses_batch(lp, rp, dp, sp, ip, hw=(64, 96),
                                activation="tanh", max_d=100.0)
    assert tanh["disp"].min() >= -1.0


def test_dataset_native_path_matches_numpy(fixture):
    """The wired-in loader fast path (StereoSegDataset.native_io) produces
    the same samples as the numpy path, through augmentation."""
    lp = D.read_manifest(fixture["left"])
    rp = D.read_manifest(fixture["right"])
    dp = D.read_manifest(fixture["disp"])
    sp = D.read_manifest(fixture["seg"])
    ip = D.read_manifest(fixture["inst"])
    norm = np.array([[0, 0, 0], [1, 1, 1]], np.float32)

    def mk(native):
        return D.StereoSegDataset(
            list(zip(lp, rp)), list(zip(dp, sp, ip)), 2, 100.0, "roses",
            norm, output_activation="linear", native_io=native, seed=3,
        )

    ds_native, ds_numpy = mk("on"), mk("off")
    assert ds_native._native is not None
    assert ds_numpy._native is None
    for i in range(3):
        a, b = ds_native[i], ds_numpy[i]
        for k in ("left", "right", "disp", "seg", "edges"):
            np.testing.assert_allclose(a[k], b[k], atol=2e-5, err_msg=k)
