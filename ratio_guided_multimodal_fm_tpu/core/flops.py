"""Analytic FLOP accounting for the framework's models.

Why this exists: `jax.stages.Compiled.cost_analysis()["flops"]` does NOT
multiply a `lax.scan` body by its trip count on this backend — round 2's
bench divided honest wall time by a ~25×-underreported FLOP total and
published **2.06% MFU** for a sampler that actually runs at ~57%
(discovered in round 3 by cross-checking the per-layer conv FLOPs against
the measured step time and the fusion contents of the device trace —
docs/results_r3/mfu_roofline.json). MFU numbers are now computed from the
closed-form convolution/dense FLOPs below.

Counts follow the standard convention (2 × MACs); only convs and denses
are counted (normalizations/elementwise excluded — they are bandwidth,
not useful FLOPs).
"""
from __future__ import annotations

from typing import Tuple


def flexible_unet_flops_per_call(
    batch: int,
    img_size: int,
    in_channels: int,
    model_channels: int,
    channel_mult: Tuple[int, ...],
    num_res_blocks: int = 2,
) -> float:
    """FLOPs of one FlexibleUNet forward (models/unet.py architecture)."""
    B = batch
    fl = 0.0

    def conv(h, cin, cout, stride=1, k=3):
        nonlocal fl
        ho = h // stride
        fl += 2.0 * B * ho * ho * k * k * cin * cout

    def dense(cin, cout):
        nonlocal fl
        fl += 2.0 * B * cin * cout

    mc = model_channels
    time_dim = mc * 4
    dense(mc, time_dim)
    dense(time_dim, time_dim)

    def resblock(h, cin, cout):
        conv(h, cin, cout)
        dense(time_dim, cout)
        conv(h, cout, cout)
        if cin != cout:
            conv(h, cin, cout, k=1)

    conv(img_size, in_channels, mc)
    chans = [mc]
    h, c = img_size, mc
    for lvl, m in enumerate(channel_mult):
        out = mc * m
        for _ in range(num_res_blocks):
            resblock(h, c, out)
            c = out
            chans.append(c)
        if lvl < len(channel_mult) - 1:
            conv(h, c, c, stride=2)
            h //= 2
            chans.append(c)
    resblock(h, c, c)
    resblock(h, c, c)
    for lvl in reversed(range(len(channel_mult))):
        out = mc * channel_mult[lvl]
        for _ in range(num_res_blocks + 1):
            skip = chans.pop()
            resblock(h, c + skip, out)
            c = out
        if lvl > 0:
            h *= 2
            conv(h, c, c)
    conv(img_size, c, in_channels)
    return fl


def mnist_unet_flops(batch: int, img_size: int = 32) -> float:
    return flexible_unet_flops_per_call(batch, img_size, 1, 32, (1, 2))


def svhn_unet_flops(batch: int) -> float:
    return flexible_unet_flops_per_call(batch, 32, 3, 64, (1, 2, 2))


def guided_sampler_flops(
    batch: int,
    mc_batch: int,
    num_steps: int,
    with_phase_a: bool = True,
) -> float:
    """Total FLOPs of the fused MNIST-SVHN guided sampler: phase A (two
    mc_batch-chain Euler scans) + main loop (both U-Nets per step at
    `batch`). Guidance matmuls contribute [B,D]x[D,N] + [B,N]x[N,D] per
    step at f32 (counted; ~1% of total)."""
    per_step_main = mnist_unet_flops(batch) + svhn_unet_flops(batch)
    fl = num_steps * per_step_main
    if with_phase_a:
        fl += num_steps * (mnist_unet_flops(mc_batch)
                           + svhn_unet_flops(mc_batch))
        # terminal ratio scores are two encoder towers — small; skipped
    d = 32 * 32 * 1 + 32 * 32 * 3
    fl += num_steps * (2.0 * batch * mc_batch * d) * 2   # cross + weighted
    return fl
