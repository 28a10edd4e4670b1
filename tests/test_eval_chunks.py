"""--eval_chunks: chunked evaluation with a fresh MC set per chunk
(the measured remedy for saturated-discriminator guidance — ROUND2.md).
Full CLI path on tiny settings with real (untrained) checkpoints."""
import json
import os

import jax
import jax.numpy as jnp

from ratio_guided_multimodal_fm_tpu.models import (
    MNISTClassifier,
    RatioEstimatorMNIST,
)
from ratio_guided_multimodal_fm_tpu.cli.common import fm_model
from ratio_guided_multimodal_fm_tpu.train.checkpoint import save_checkpoint


def _write_checkpoints():
    os.makedirs("checkpoints", exist_ok=True)
    clf = MNISTClassifier()
    save_checkpoint("checkpoints/mnist_classifier",
                    clf.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 28, 28, 1)))["params"])
    fm = fm_model("unet")
    p = fm.init(jax.random.PRNGKey(1), jnp.zeros((1, 28, 28, 1)),
                jnp.zeros((1,)))["params"]
    save_checkpoint("checkpoints/flow_x_best", p)
    save_checkpoint("checkpoints/flow_y_rotate90_best", p)
    ratio = RatioEstimatorMNIST(loss_type="disc")
    save_checkpoint("checkpoints/ratio_disc_rotate90_best",
                    ratio.init(jax.random.PRNGKey(2),
                               jnp.zeros((1, 28, 28, 1)),
                               jnp.zeros((1, 28, 28, 1)))["params"])


def test_eval_chunks_full_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _write_checkpoints()
    from ratio_guided_multimodal_fm_tpu.cli import evaluate

    evaluate.main(["--num_samples", "6", "--num_steps", "2",
                   "--mc_batch_size", "4", "--eval_chunks", "2",
                   "--guidance_methods", "mc_feng",
                   "--guidance_strengths", "0.5",
                   "--save_samples"])
    results = json.load(open("outputs/evaluation_results.json"))
    assert len(results) == 1
    assert results[0]["num_samples"] == 6  # 2 chunks of 3, concatenated

    # chunked run must differ from the single-set run (fresh MC sets and
    # per-chunk keys change the draw)
    import numpy as np

    chunked = np.load("outputs/samples_mc_feng_gamma0.5_rotate90.npz")["x"]
    evaluate.main(["--num_samples", "6", "--num_steps", "2",
                   "--mc_batch_size", "4", "--eval_chunks", "1",
                   "--guidance_methods", "mc_feng",
                   "--guidance_strengths", "0.5",
                   "--save_samples"])
    single = np.load("outputs/samples_mc_feng_gamma0.5_rotate90.npz")["x"]
    assert chunked.shape == single.shape == (6, 28, 28, 1)
    assert not np.allclose(chunked, single)
