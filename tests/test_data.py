"""Data pipeline tests on synthetic ROSeS-layout fixtures."""
import os

import numpy as np
import pytest

from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import PMTConfig
from pmt_learning_for_semantic_segmentation_and_disparity_tpu import data as D


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("roses_fixture")
    manifests = D.make_roses_fixture(str(root), n_train=4, n_test=2,
                                     hw=(320, 560))
    return str(root), manifests


def _cfg(manifests):
    cfg = PMTConfig()
    cfg.data.dataset_name = "roses"
    cfg.model.output_activation = "linear"
    D.apply_fixture_to_config(cfg, manifests)
    return cfg


def test_manifest_reader(fixture_dir):
    root, manifests = fixture_dir
    files = D.read_manifest(manifests["left"])
    assert len(files) == 4
    assert all(os.path.isabs(f) and os.path.exists(f) for f in files)


def test_depth_to_disparity_math(fixture_dir):
    """roses: disp = 640*0.03/depth (utilTorchDataLoader.py:57-58,176-179)."""
    root, manifests = fixture_dir
    cfg = _cfg(manifests)
    tr, te = D.build_datasets(cfg.data, "linear", 1.0,
                              np.array([[0, 0, 0], [1, 1, 1]], np.float32))
    raw = tr.load_raw(0)
    import cv2

    depth = cv2.imread(D.read_manifest(manifests["disp"])[0])[:, :, 0]
    expected = np.where(depth > 0, 640 * 0.03 / depth, 0)
    np.testing.assert_allclose(raw["disp"][..., 0], expected, rtol=1e-6)


def test_roses_one_hot_blue_channel():
    seg = np.zeros((4, 4, 3), np.uint8)
    seg[0, 0] = (0, 0, 200)  # blue > 128 -> branch
    onehot = D.roses_one_hot(seg)
    assert onehot[0, 0, 1] == 1 and onehot[0, 0, 0] == 0
    assert onehot[1, 1, 0] == 1


def test_cityscapes_trainid_lut():
    ids = np.array([[7, 26], [0, 24]], np.uint8)  # road, car, unlabeled, person
    onehot = D.img_id2train_id(ids, 19)
    assert onehot.shape == (2, 2, 20)
    assert onehot[0, 0, 0] == 1  # road -> trainId 0
    assert onehot[0, 1, 13] == 1  # car -> 13
    assert onehot[1, 0, 19] == 1  # unlabeled -> ignore channel
    assert onehot[1, 1, 11] == 1  # person -> 11


def test_activation_normalization(fixture_dir):
    root, manifests = fixture_dir
    cfg = _cfg(manifests)
    norm = np.array([[0, 0, 0], [1, 1, 1]], np.float32)
    # sigmoid: clamp at max_d then /max_d (utilTorchDataLoader.py:186-195)
    tr, _ = D.build_datasets(cfg.data, "sigmoid", 100.0, norm)
    d = tr.load_raw(0)["disp"]
    assert d.max() <= 1.0
    # tanh: 2d/max - 1 where nonzero
    tr2, _ = D.build_datasets(cfg.data, "tanh", 100.0, norm)
    d2 = tr2.load_raw(0)["disp"]
    assert d2.min() >= -1.0 and d2.max() <= 1.0


def test_train_sample_crop_and_shapes(fixture_dir):
    root, manifests = fixture_dir
    cfg = _cfg(manifests)
    cfg.data.crop = (256, 512)
    norm = np.array([[0, 0, 0], [1, 1, 1]], np.float32)
    tr, te = D.build_datasets(cfg.data, "linear", 1.0, norm)
    s = tr[0]
    assert s["left"].shape == (256, 512, 3)
    assert s["seg"].shape == (256, 512, 2)
    assert s["disp"].shape == (256, 512, 1)
    assert s["edges"].shape == (256, 512, 1)
    assert s["left"].dtype == np.float32
    # test set: full image passthrough (crop [0,0])
    t = te[0]
    assert t["left"].shape == (320, 560, 3)


def test_dataloader_and_bucket_padding(fixture_dir):
    root, manifests = fixture_dir
    cfg = _cfg(manifests)
    norm = np.array([[0, 0, 0], [1, 1, 1]], np.float32)
    _, te = D.build_datasets(cfg.data, "linear", 1.0, norm)
    loader = D.DataLoader(te, 2, shuffle=False, drop_last=False,
                          bucket_hw=(512, 960))
    batch = next(iter(loader))
    assert batch["left"].shape == (2, 512, 960, 3)
    assert len(batch["meta"]) == 2


def test_determinism_same_seed(fixture_dir):
    root, manifests = fixture_dir
    cfg = _cfg(manifests)
    cfg.data.crop = (128, 256)
    norm = np.array([[0, 0, 0], [1, 1, 1]], np.float32)
    tr, _ = D.build_datasets(cfg.data, "linear", 1.0, norm)
    tr.seed = 7
    a = tr[1]["left"]
    b = tr[1]["left"]
    np.testing.assert_array_equal(a, b)
    tr.seed = 8
    c = tr[1]["left"]
    assert not np.array_equal(a, c)


def test_color_jitter_pair_joint(rng):
    left = rng.integers(0, 255, (32, 32, 3), np.uint8)
    right = left.copy()
    l2, r2 = D.color_jitter_pair(left, right, np.random.default_rng(3))
    np.testing.assert_array_equal(l2, r2)  # shared factors on equal inputs
    assert not np.array_equal(l2, left)


def test_stereo_flip_reprojection():
    h, w = 8, 16
    left = np.zeros((h, w, 3), np.float32)
    right = np.ones((h, w, 3), np.float32)
    disp = np.full((h, w, 1), 2.0, np.float32)
    seg = np.zeros((h, w, 3), np.float32)
    seg[..., 0] = 1
    edges = np.zeros((h, w, 1), np.float32)
    out = D.RandomCropAugment._stereo_flip([left, right, disp, seg, edges])
    # L/R swapped and mirrored
    np.testing.assert_array_equal(out[0][:, :, 0], np.ones((h, w)))
    # occlusion marked in the ignore channel
    assert out[3][..., -1].sum() > 0


def test_hdf5_dataset_source(tmp_path):
    """hdf5-backed dataset (utilTorchDataLoader.py:37-42,139-144)."""
    import h5py

    p = str(tmp_path / "data.h5")
    rng2 = np.random.default_rng(0)
    with h5py.File(p, "w") as f:
        f["left"] = rng2.integers(0, 255, (3, 32, 48, 3), np.uint8)
        f["right"] = rng2.integers(0, 255, (3, 32, 48, 3), np.uint8)
        f["seg"] = rng2.integers(0, 2, (3, 32, 48, 2)).astype(np.float32)
        f["disp"] = rng2.random((3, 32, 48)).astype(np.float32)
    ds = D.StereoSegDataset(
        [], [], 2, 1.0, "roses",
        np.array([[0, 0, 0], [1, 1, 1]], np.float32), hdf5=p,
    )
    assert len(ds) == 3
    raw = ds.load_raw(1)
    assert raw["left"].shape == (32, 48, 3)
    # load_raw keeps the 0-255 convention (normalization happens exactly
    # once, in __getitem__ — the reference's hdf5 double-/255 is fixed)
    assert raw["left"].max() > 1.0
    sample = ds[1]
    assert sample["left"].max() <= 1.0 + 1e-6


def test_only_test_mode(fixture_dir):
    """only_test: zero labels + path metadata (utilTorchDataLoader.py:260-272)."""
    root, manifests = fixture_dir
    cfg = _cfg(manifests)
    cfg.data.only_test = True
    norm = np.array([[0, 0, 0], [1, 1, 1]], np.float32)
    _, te = D.build_datasets(cfg.data, "linear", 1.0, norm, train=False)
    s = te[0]
    assert s["seg"].shape[-1] == 3  # n_labels + 1
    assert float(np.abs(s["seg"]).sum()) == 0.0
    assert float(np.abs(s["disp"]).sum()) == 0.0
    assert len(s["meta"]) == 2 and s["meta"][0].endswith(".png")


def test_class_balancer(tmp_path):
    """Least-sampled-class bookkeeping (utilTorchDataLoader.py:60-125)."""
    import pandas as pd

    csv = tmp_path / "labels.csv"
    pd.DataFrame({
        "n": [0, 1, 2, 3],
        "0": [1, 1, 0, 0],
        "1": [0, 1, 1, 1],
    }).to_csv(csv, index=False)
    bal = D.ClassBalancer(str(csv), "roses", 2)
    rng2 = np.random.default_rng(0)
    picks = [bal.next_index(rng2) for _ in range(40)]
    idxs = [p[0] for p in picks]
    classes = [p[1] for p in picks]
    assert set(idxs) <= {0, 1, 2, 3}
    # both classes get sampled, roughly balanced
    assert abs(classes.count(0) - classes.count(1)) <= 4
