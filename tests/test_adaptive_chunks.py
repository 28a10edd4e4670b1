"""Chunked evaluation by default (eval/chunked.py, VERDICT r2 #2).

The regression scenario: a saturated (mis-ranking) discriminator degrades
guided coherence under the round-2 default of one shared MC set; a fresh
MC set per chunk is the measured remedy. Calibration on real checkpoints
showed NO ESS signal separates the regimes
(docs/results_r3/chunk_trigger_calibration.json), so fresh-set-per-chunk
is the unconditional default; --eval_chunks 1 restores the old protocol.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratio_guided_multimodal_fm_tpu.eval.chunked import (
    mc_set_ess,
    resolve_chunk_policy,
    sample_in_chunks,
)


class TestMcSetEss:
    def test_uniform_ratios_give_full_ess(self):
        assert mc_set_ess(jnp.ones(256)) == pytest.approx(256.0)

    def test_saturated_ratios_collapse_to_one(self):
        # log r spread of hundreds of units -> exp spans many decades
        log_r = np.array([200.0] + [0.0] * 255)
        r = np.exp(np.minimum(log_r, 80.0))
        assert mc_set_ess(r) == pytest.approx(1.0, abs=1e-6)

    def test_nonfinite_sum_reads_as_collapsed(self):
        r = np.array([np.inf, 1.0, 1.0])
        assert mc_set_ess(r) == 1.0

    def test_moderate_spread_in_between(self):
        rng = np.random.RandomState(0)
        r = np.exp(rng.randn(256))           # healthy-ish log spread ~N(0,1)
        ess = mc_set_ess(r)
        assert 20.0 < ess < 256.0


class TestResolveChunkPolicy:
    def test_forced_integer(self):
        assert resolve_chunk_policy("3", True)[0] == 3
        assert resolve_chunk_policy(1, True)[0] == 1   # forced 1 overrides

    def test_auto_chunks_whenever_mc_set_exists(self):
        n, reason = resolve_chunk_policy("auto", True, auto_chunks=4)
        assert n == 4 and "fresh MC" in reason

    def test_no_mc_set(self):
        assert resolve_chunk_policy("auto", False)[0] == 1


def _fake_harness(log_r_scale):
    """sample_fn/make_mc_set over trivial arrays; records calls."""
    calls = {"mc": 0, "sample": []}

    def make_mc(key):
        calls["mc"] += 1
        kx, kr = jax.random.split(key)
        log_r = log_r_scale * jax.random.normal(kr, (32,))
        return (jax.random.normal(kx, (32, 2, 2, 1)),
                jax.random.normal(jax.random.fold_in(kx, 1), (32, 2, 2, 1)),
                jnp.exp(jnp.minimum(log_r, 80.0)))

    def sample_fn(key, n, mc_set):
        calls["sample"].append(n)
        x = jax.random.normal(key, (n, 2, 2, 1))
        ess = jnp.full((3, n), float(mc_set_ess(mc_set[2])))
        return x, -x, {"ess": ess, "w_max": jnp.ones(3)}

    return make_mc, sample_fn, calls


class TestSampleInChunks:
    def test_auto_uses_fresh_set_per_chunk(self):
        make_mc, sample_fn, calls = _fake_harness(log_r_scale=30.0)
        x, y, diags, info = sample_in_chunks(
            sample_fn, make_mc, 10, jax.random.PRNGKey(0),
            eval_chunks="auto", auto_chunks=4)
        assert info["n_chunks"] == 4
        assert calls["mc"] == 4            # one fresh set per chunk
        assert x.shape[0] == 10 and sum(calls["sample"]) == 10
        assert len(info["mc_set_ess"]) == 4
        assert diags["ess"].shape == (3, 10)   # merged over all chunks
        assert "ess_trajectory_mean" in info

    def test_forced_one_reproduces_reference_protocol(self):
        make_mc, sample_fn, calls = _fake_harness(log_r_scale=30.0)
        _, _, _, info = sample_in_chunks(
            sample_fn, make_mc, 10, jax.random.PRNGKey(0), eval_chunks="1")
        assert info["n_chunks"] == 1 and calls["mc"] == 1

    def test_mc_cache_reused_across_strengths(self):
        make_mc, sample_fn, calls = _fake_harness(log_r_scale=30.0)
        cache = {}
        for _ in range(3):    # three gamma points of a sweep
            sample_in_chunks(sample_fn, make_mc, 8, jax.random.PRNGKey(0),
                             eval_chunks="auto", auto_chunks=4,
                             mc_cache=cache)
        assert calls["mc"] == 4   # generated once, reused twice

    def test_diag_merge_scalar_keys(self):
        make_mc, sample_fn, _ = _fake_harness(log_r_scale=30.0)
        _, _, diags, _ = sample_in_chunks(
            sample_fn, make_mc, 8, jax.random.PRNGKey(0), eval_chunks="2")
        assert diags["w_max"].shape == (3,)   # per-step scalars kept


def test_evaluate_cli_auto_chunks_on_saturated_ratio(tmp_path, monkeypatch):
    """End-to-end regression: default flags + saturated ratio checkpoint
    => auto chunking fires and the run completes; forcing 1 restores the
    single-set protocol. (The quality claim itself is validated on TPU —
    docs/results_r3.)"""
    monkeypatch.chdir(tmp_path)
    import os

    from ratio_guided_multimodal_fm_tpu.cli import evaluate
    from ratio_guided_multimodal_fm_tpu.cli.common import fm_model
    from ratio_guided_multimodal_fm_tpu.models import (
        MNISTClassifier,
        RatioEstimatorMNIST,
    )
    from ratio_guided_multimodal_fm_tpu.train.checkpoint import save_checkpoint

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
    rp = ratio.init(jax.random.PRNGKey(2), jnp.zeros((1, 28, 28, 1)),
                    jnp.zeros((1, 28, 28, 1)))["params"]
    # Saturate the discriminator: blow up the score head so |T| (and hence
    # |log r̂| = |logsigmoid(T) - logsigmoid(-T)| = |T|) is in the hundreds.
    rp = jax.tree_util.tree_map(lambda a: a * 50.0, rp)
    save_checkpoint("checkpoints/ratio_disc_rotate90_best", rp)

    evaluate.main(["--num_samples", "8", "--num_steps", "2",
                   "--mc_batch_size", "4",
                   "--guidance_methods", "mc_feng",
                   "--guidance_strengths", "0.5"])
    results = json.load(open("outputs/evaluation_results.json"))
    assert results[0]["n_chunks"] == 4
    assert "fresh MC" in results[0]["chunk_policy"]
    assert results[0]["num_samples"] == 8
    assert "label_entropy_x" in results[0]

    evaluate.main(["--num_samples", "8", "--num_steps", "2",
                   "--mc_batch_size", "4", "--eval_chunks", "1",
                   "--guidance_methods", "mc_feng",
                   "--guidance_strengths", "0.5"])
    results = json.load(open("outputs/evaluation_results.json"))
    assert results[0]["n_chunks"] == 1
