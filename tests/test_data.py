"""Data layer tests: transforms, pairing, loaders (synthetic sources)."""
import os

import numpy as np
import pytest

os.environ.setdefault("RGMF_SYNTH_N", "600")

from ratio_guided_multimodal_fm_tpu.data.pipeline import Pairing, to_unit_range
from ratio_guided_multimodal_fm_tpu.data.transforms import (
    TRANSFORM_NAMES,
    apply_transform,
    inverse_transform,
)


@pytest.mark.parametrize("name", [n for n in TRANSFORM_NAMES if n != "none"])
def test_transform_roundtrip(name):
    rng = np.random.RandomState(0)
    x = rng.randn(4, 8, 8, 1).astype(np.float32)
    y = apply_transform(name, x)
    x_back = inverse_transform(name, y)
    np.testing.assert_allclose(x_back, x, atol=1e-6)


def test_rotate90_direction():
    """rotate90 = 90° clockwise: top-left pixel moves to top-right."""
    x = np.zeros((1, 4, 4, 1), np.float32)
    x[0, 0, 0, 0] = 1.0
    y = apply_transform("rotate90", x)
    assert y[0, 0, 3, 0] == 1.0


def test_to_unit_range():
    u8 = np.array([[0, 127, 255]], np.uint8)
    f = to_unit_range(u8)
    np.testing.assert_allclose(f, [[-1.0, -0.00392157, 1.0]], atol=1e-5)


def test_pairing_same_and_different():
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 10, 500)
    pairing = Pairing(labels)
    q = rng.randint(0, 10, 64)
    same = pairing.same_label(q, rng)
    assert (labels[same] == q).all()
    diff, diff_lbl = pairing.different_label(q, rng)
    assert (labels[diff] != q).all()
    assert (labels[diff] == diff_lbl).all()


def test_flow_loader_shapes(tmp_path):
    from ratio_guided_multimodal_fm_tpu.data.mnist_dataset import (
        get_flow_dataloader,
    )

    loader = get_flow_dataloader("rotate90", batch_size=32, train=True,
                                 root=str(tmp_path))
    batch = next(iter(loader))
    assert batch["x"].shape == (32, 28, 28, 1)
    assert batch["y"].shape == (32, 28, 28, 1)
    assert batch["x"].min() >= -1.0 and batch["x"].max() <= 1.0
    # y is the transform of x
    np.testing.assert_allclose(batch["y"],
                               apply_transform("rotate90", batch["x"]))


def test_ratio_loader_semantics(tmp_path):
    from ratio_guided_multimodal_fm_tpu.data.mnist_dataset import (
        get_ratio_dataloader,
    )

    loader = get_ratio_dataloader("rotate180", batch_size=64,
                                  real_fake_ratio=0.5, root=str(tmp_path))
    batch = next(iter(loader))
    assert set(batch) >= {"x", "y", "is_real", "label_x", "label_y"}
    real = batch["is_real"].astype(bool)
    # real pairs: same label; fake pairs: different label
    assert (batch["label_x"][real] == batch["label_y"][real]).all()
    assert (batch["label_x"][~real] != batch["label_y"][~real]).all()
    # both real and fake present at ratio 0.5 over 64 draws (w.h.p.)
    assert real.any() and (~real).any()


def test_mnist_svhn_loader_shapes(tmp_path):
    from ratio_guided_multimodal_fm_tpu.data.mnist_svhn import (
        get_mnist_svhn_dataloader,
    )

    loader = get_mnist_svhn_dataloader(batch_size=16, train=True,
                                       root=str(tmp_path))
    batch = next(iter(loader))
    assert batch["x"].shape == (16, 32, 32, 1)
    assert batch["y"].shape == (16, 32, 32, 3)


def test_device_cached_loaders_match_host(monkeypatch, tmp_path):
    """RGMF_DEVICE_DATA=1 (device-resident arrays + on-device gathers)
    yields bit-identical batches to the host path."""
    import importlib

    import jax

    from ratio_guided_multimodal_fm_tpu.data import device_data

    root = str(tmp_path / "d")

    def batches(force):
        monkeypatch.setenv("RGMF_DEVICE_DATA", "1" if force else "0")
        # fresh module caches so the flag is honored
        import ratio_guided_multimodal_fm_tpu.data.mnist_svhn as ms
        ms._CACHE.clear()
        loader = ms.get_mnist_svhn_ratio_dataloader(16, True, root, seed=5)
        return [{k: np.asarray(v) for k, v in b.items()}
                for _, b in zip(range(3), iter(loader))]

    host = batches(False)
    dev = batches(True)
    for hb, db in zip(host, dev):
        assert set(hb) == set(db)
        for k in hb:
            np.testing.assert_array_equal(hb[k], db[k])
