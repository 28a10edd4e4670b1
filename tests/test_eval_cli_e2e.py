"""CLI plumbing e2e: `cli.evaluate --ema --guidance_methods smc` against a
random-init run dir (scripts/make_serve_run.py --with_classifier
--with_ema).

Guards the exact composition the round-4 TPU study queues drive — EMA
sibling checkpoint resolution + the SMC knobs through the evaluate CLI —
with weight-independent assertions (random init ⇒ metrics are
meaningless, but the sweep must produce rows with finite values and
write JSON at the reference's output path).
"""
import importlib.util
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_serve_run():
    spec = importlib.util.spec_from_file_location(
        "make_serve_run", os.path.join(ROOT, "scripts", "make_serve_run.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_evaluate_ema_smc_plumbing(tmp_path, monkeypatch):
    _make_serve_run().main(["--run_dir", str(tmp_path),
                            "--with_classifier", "--with_ema"])
    # --ema resolves the sibling checkpoints the helper just wrote
    assert os.path.isdir(tmp_path / "checkpoints" / "flow_x_ema_best")
    assert os.path.isdir(tmp_path / "checkpoints"
                         / "flow_y_rotate90_ema_best")

    monkeypatch.chdir(tmp_path)
    from ratio_guided_multimodal_fm_tpu.cli import evaluate

    evaluate.main(["--ema", "--guidance_methods", "smc",
                   "--guidance_strengths", "1.0",
                   "--num_samples", "8", "--num_steps", "4",
                   "--mc_batch_size", "8"])

    with open("outputs/evaluation_results.json") as f:
        rows = json.load(f)
    (row,) = [r for r in rows if r["method"] == "smc"]
    assert row["guidance_strength"] == 1.0
    assert row["num_samples"] == 8
    for k in ("coherence_acc", "label_entropy_x", "label_entropy_y"):
        assert float(row[k]) == float(row[k])  # finite, not NaN
    assert 0.0 <= row["coherence_acc"] <= 1.0


def test_make_serve_run_exp2_classifier_checkpoints(tmp_path):
    """exp-2 variant writes the dual classifiers + EMA flow siblings the
    evaluate_mnist_svhn CLI expects (BatchNorm classifier keeps its
    batch_stats)."""
    _make_serve_run().main(["--run_dir", str(tmp_path),
                            "--experiment", "mnist_svhn",
                            "--with_classifier", "--with_ema"])
    base = tmp_path / "checkpoints"
    for name in ("flow_mnist32_ema_best", "flow_svhn_ema_best",
                 "mnist32_classifier", "svhn_classifier"):
        assert os.path.isdir(base / name), name

    from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
        load_checkpoint,
    )
    tree = load_checkpoint(str(base / "svhn_classifier"))
    assert "params" in tree and "batch_stats" in tree


def test_evaluate_ratio_ema_plumbing(tmp_path, monkeypatch):
    """--ratio_ema resolves the ratio_*_ema_best sibling (written by
    train_ratio* --ema_decay; here by the make_serve_run helper) through
    the evaluate CLI's guidance path."""
    _make_serve_run().main(["--run_dir", str(tmp_path),
                            "--with_classifier", "--with_ema"])
    assert os.path.isdir(tmp_path / "checkpoints"
                         / "ratio_disc_rotate90_ema_best")

    monkeypatch.chdir(tmp_path)
    from ratio_guided_multimodal_fm_tpu.cli import evaluate

    evaluate.main(["--ratio_ema", "--guidance_methods", "mc_feng",
                   "--guidance_strengths", "1.0",
                   "--num_samples", "8", "--num_steps", "4",
                   "--mc_batch_size", "8"])

    with open("outputs/evaluation_results.json") as f:
        rows = json.load(f)
    (row,) = [r for r in rows if r["method"] == "mc_feng"]
    assert 0.0 <= row["coherence_acc"] <= 1.0


def test_evaluate_mc_refresh_plumbing(tmp_path, monkeypatch):
    """--mc_refresh 2 through the evaluate CLI: the sampler regenerates
    its MC set internally, so the chunk policy collapses to one chunk and
    the result row records the knob."""
    _make_serve_run().main(["--run_dir", str(tmp_path),
                            "--with_classifier"])
    monkeypatch.chdir(tmp_path)
    from ratio_guided_multimodal_fm_tpu.cli import evaluate

    evaluate.main(["--guidance_methods", "mc_feng",
                   "--guidance_strengths", "1.0",
                   "--num_samples", "8", "--num_steps", "4",
                   "--mc_batch_size", "8", "--mc_refresh", "2"])

    with open("outputs/evaluation_results.json") as f:
        rows = json.load(f)
    (row,) = [r for r in rows if r["method"] == "mc_feng"]
    assert row["mc_refresh"] == 2
    assert row["n_chunks"] == 1  # refresh subsumes per-chunk fresh sets
    assert 0.0 <= row["coherence_acc"] <= 1.0
