"""CLI guard rails: missing checkpoints exit with actionable messages
(parity with ref sample.py:159-167 checkpoint-existence guards)."""
import os

import pytest


def _in_tmp(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # no checkpoints/ here


def test_sample_missing_fm_checkpoint(tmp_path, monkeypatch):
    _in_tmp(tmp_path, monkeypatch)
    from ratio_guided_multimodal_fm_tpu.cli import sample

    with pytest.raises(SystemExit) as e:
        sample.main(["--num_samples", "2", "--num_steps", "2"])
    msg = str(e.value)
    assert "FM_x" in msg and "train_flow" in msg


def test_evaluate_missing_classifier(tmp_path, monkeypatch):
    _in_tmp(tmp_path, monkeypatch)
    from ratio_guided_multimodal_fm_tpu.cli import evaluate

    with pytest.raises(SystemExit) as e:
        evaluate.main(["--num_samples", "2", "--num_steps", "2"])
    assert "Classifier" in str(e.value)


def test_sample_mnist_svhn_missing_ratio(tmp_path, monkeypatch):
    """With FM ckpts absent the first failure is FM_mnist; message says so."""
    _in_tmp(tmp_path, monkeypatch)
    from ratio_guided_multimodal_fm_tpu.cli import sample_mnist_svhn

    with pytest.raises(SystemExit) as e:
        sample_mnist_svhn.main(["--guidance_method", "mc_feng",
                                "--num_samples", "2", "--num_steps", "2"])
    assert "FM_mnist" in str(e.value)


def test_unknown_transform_is_identity():
    """Unknown transform names fall through to identity, matching
    ref evaluate.py:53's default branch."""
    import numpy as np

    from ratio_guided_multimodal_fm_tpu.data.transforms import apply_transform

    x = np.random.RandomState(0).randn(2, 4, 4, 1).astype(np.float32)
    np.testing.assert_array_equal(apply_transform("not_a_transform", x), x)
