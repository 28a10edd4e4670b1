"""Config-#5 real-data ingestion (data/natural.py:load_natural, round 5):
CIFAR-10 python batches / CelebA aligned-image dirs dropped under ./data
auto-upgrade the stretch config; procedural generators stay the fallback
(BASELINE configs[4]; VERDICT r4 missing #3)."""
import os
import pickle

import numpy as np
import pytest

from ratio_guided_multimodal_fm_tpu.data.natural import (
    _celeba_class,
    load_natural,
)


def _write_fake_cifar(root, n=64):
    d = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    batch = {
        b"data": rng.randint(0, 256, (n, 3072), dtype=np.uint8),
        b"labels": [int(v) for v in rng.randint(0, 10, n)],
    }
    with open(os.path.join(d, "data_batch_1"), "wb") as f:
        pickle.dump(batch, f)
    return batch


def _write_fake_celeba(root, n=12):
    from PIL import Image

    base = os.path.join(root, "celeba")
    img_dir = os.path.join(base, "img_align_celeba")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(1)
    names = ["Black_Hair", "Blond_Hair", "Brown_Hair", "Gray_Hair",
             "Eyeglasses", "Smiling"]
    rows = []
    for i in range(n):
        fname = f"{i:06d}.jpg"
        arr = rng.randint(0, 256, (218, 178, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, fname))
        vals = [-1] * len(names)
        vals[i % 4] = 1                      # cycle hair attributes
        vals[4] = 1 if i % 2 else -1         # alternate glasses
        rows.append((fname, vals))
    with open(os.path.join(base, "list_attr_celeba.txt"), "w") as f:
        f.write(f"{n}\n")
        f.write(" ".join(names) + "\n")
        for fname, vals in rows:
            f.write(fname + " " + " ".join(str(v) for v in vals) + "\n")
    return rows


def test_fallback_procedural(tmp_path):
    imgs, labels, src = load_natural("objects", 8, seed=3,
                                     root=str(tmp_path), cache=False)
    assert src == "procedural"
    assert imgs.shape == (8, 64, 64, 3) and imgs.dtype == np.uint8


def test_cifar10_detected_and_loaded(tmp_path):
    batch = _write_fake_cifar(str(tmp_path), n=64)
    imgs, labels, src = load_natural("objects", 32, seed=3,
                                     root=str(tmp_path))
    assert src == "cifar10"
    assert imgs.shape == (32, 64, 64, 3) and imgs.dtype == np.uint8
    assert labels.dtype == np.int32
    assert set(labels) <= set(range(10))
    # labels must correspond to the picked images (permutation of batch)
    all_labels = np.asarray(batch[b"labels"])
    assert all(l in all_labels for l in labels)
    # cached second call is identical
    imgs2, labels2, src2 = load_natural("objects", 32, seed=3,
                                        root=str(tmp_path))
    np.testing.assert_array_equal(imgs, imgs2)
    np.testing.assert_array_equal(labels, labels2)
    # oversampling beyond the pool works (with replacement)
    imgs3, labels3, _ = load_natural("objects", 100, seed=4,
                                     root=str(tmp_path), cache=False)
    assert imgs3.shape[0] == 100


def test_celeba_detected_and_classes(tmp_path):
    _write_fake_celeba(str(tmp_path), n=12)
    imgs, labels, src = load_natural("faces", 12, seed=5,
                                     root=str(tmp_path), cache=False)
    assert src == "celeba"
    assert imgs.shape == (12, 64, 64, 3) and imgs.dtype == np.uint8
    # hair cycle (black, blond, brown, gray) x alternating glasses →
    # classes from {0,1,2,3,5,8,9} region; all within 0..9 and >1 distinct
    assert set(labels) <= set(range(10)) and len(set(labels)) > 1


def test_celeba_class_mapping():
    assert _celeba_class({"Black_Hair": 1}) == 0
    assert _celeba_class({"Black_Hair": 1, "Eyeglasses": 1}) == 1
    assert _celeba_class({"Brown_Hair": 1}) == 2
    assert _celeba_class({"Blond_Hair": 1, "Eyeglasses": 1}) == 5
    assert _celeba_class({"Gray_Hair": 1}) == 8
    assert _celeba_class({}) == 6            # red/other slot, no glasses
    assert _celeba_class({"Eyeglasses": 1}) == 7


def test_size_mismatch_resize(tmp_path):
    """CelebA 178x218 center-crops to square then resizes (no squash)."""
    _write_fake_celeba(str(tmp_path), n=2)
    imgs, _, src = load_natural("faces", 2, seed=0, root=str(tmp_path),
                                cache=False, px=32)
    assert src == "celeba" and imgs.shape == (2, 32, 32, 3)
