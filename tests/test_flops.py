"""Analytic FLOP accounting (core/flops.py) — the MFU denominators."""
from ratio_guided_multimodal_fm_tpu.core.flops import (
    flexible_unet_flops_per_call,
    guided_sampler_flops,
    mnist_unet_flops,
    svhn_unet_flops,
)


def test_linear_in_batch():
    assert mnist_unet_flops(512) == 2 * mnist_unet_flops(256)


def test_known_magnitudes():
    # cross-checked against the per-layer microbench sums
    # (docs/results_r3/profile_B512.json): svhn ~1.45 TFLOP/fwd at B=512
    assert 1.3e12 < svhn_unet_flops(512) < 1.6e12
    assert 0.30e12 < mnist_unet_flops(512) < 0.40e12


def test_sampler_total_includes_phase_a():
    with_a = guided_sampler_flops(512, 256, 100, with_phase_a=True)
    without = guided_sampler_flops(512, 256, 100, with_phase_a=False)
    assert with_a > without > 0
    # phase A at mc_batch=256 is about half the per-step cost of B=512
    assert 1.3 < with_a / without < 1.7


def test_deeper_net_costs_more():
    small = flexible_unet_flops_per_call(64, 32, 1, 32, (1, 2))
    big = flexible_unet_flops_per_call(64, 32, 3, 64, (1, 2, 2))
    assert big > 3 * small
