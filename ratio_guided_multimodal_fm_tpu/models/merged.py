"""Merged-pair U-Net evaluation: run the sampler's TWO velocity nets as
ONE program via grouped convolutions.

Motivation (round-3 profile, docs/results_r3/profile_B512.json): the
guided sampler evaluates fm_x and fm_y serially inside every ODE step.
Both parity nets of experiment 1 are FlexibleUNets with IDENTICAL
topology (ref unet.py:282-305 — in=1, ch=32, mult=(1,2), 2 res blocks),
so every conv pair (same kh,kw,Cin,Cout, different weights) can execute
as a single `lax.conv_general_dilated(feature_group_count=2)` with the
two kernels concatenated on the output-feature axis: exact block-diagonal
semantics with NO wasted FLOPs and half the op count.

MEASURED OUTCOME (v5e, docs/results_r3/merged_experiment.json): the
merged program is ~31% SLOWER than two separate dense-conv evaluations
at the exp-1 B=512 workload — XLA's grouped-conv lowering (plus the
per-ResBlock interleave concats) costs more than the op-count halving
saves, and at B=512 the separate convs already fill the MXU via the
batch dimension (57% MFU, mfu_roofline.json). Kept as an OPT-IN
(`--merged_unet`) with exactness tests, same pay-or-retire discipline as
the retired GroupNorm Pallas kernel (ops/groupnorm_pallas.py).

Layout: activations are part-major channel concats [B, H, W, 2*C]
(part x first). GroupNorm stays exact because each part's channel count
divides by its min(8, ch) group count, so merged GN with 2*g groups never
mixes parts. Decoder skip concats interleave per part ([h_x, s_x, h_y,
s_y]) so the stored concat-formulation ResBlock kernels apply unchanged.

Public API:
  can_merge(model_x, model_y)          -> bool
  merge_unet_params(px, py)            -> merged param tree
  make_merged_velocity_fn(model)       -> fn(merged, x, y, t) -> (vx, vy)

Equivalence vs per-net evaluation is asserted by
tests/test_merged_unet.py (both split_skip settings, f32 exact-ish).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.models.layers import timestep_embedding

_DN = ("NHWC", "HWIO", "NHWC")

_MERGE_FIELDS = ("in_channels", "img_size", "model_channels",
                 "channel_mult", "num_res_blocks", "norm_eps")


def can_merge(model_x, model_y) -> bool:
    """True when the two FlexibleUNets have identical topology (weights
    may differ) so their pairwise evaluation can fuse into one program."""
    try:
        return all(getattr(model_x, f) == getattr(model_y, f)
                   for f in _MERGE_FIELDS)
    except AttributeError:
        return False


def merge_unet_params(params_x, params_y):
    """Merge two same-topology FlexibleUNet param trees.

    conv kernels  (kh,kw,Cin,Cout) -> (kh,kw,Cin,2*Cout)  [out-axis concat
        = grouped-conv weight layout; group g reads input slice g]
    dense kernels (I,O)            -> (2,I,O) stacked
    biases / GN scale+bias         -> per-part concat
    """
    def merge(path, a, b):
        name = path[-1].key
        if a.ndim == 4:                      # conv kernel
            return jnp.concatenate([a, b], axis=3)
        if a.ndim == 2:                      # dense kernel
            return jnp.stack([a, b])
        if name == "bias" and len(path) >= 2 and \
                path[-2].key in ("time_mlp", "time_dense1", "time_dense2"):
            return jnp.stack([a, b])         # dense bias: [2,O]
        return jnp.concatenate([a, b])       # conv bias / GN scale+bias
    return jax.tree_util.tree_map_with_path(merge, params_x, params_y)


def _gconv(h, p, *, stride=1, pad=1, dtype):
    """Grouped conv over the merged layout (part x = group 0)."""
    k = p["kernel"].astype(dtype)
    kh, kw = k.shape[0], k.shape[1]
    return jax.lax.conv_general_dilated(
        h, k, (stride, stride), [(pad, pad)] * 2, dimension_numbers=_DN,
        feature_group_count=2) + p["bias"].astype(dtype)


def _gn_silu(h, p, g_part, *, dtype, eps=1e-6, silu=True):
    """Per-part GroupNorm(+SiLU) on the merged layout: 2*g_part groups over
    2*C channels. Exact because per-part C divides g_part, so no group
    straddles the part boundary. f32 stats; `eps` must match the source
    models' norm_eps (1e-6 flax default, 1e-5 torch-exact imports)."""
    B, _, _, C2 = h.shape
    g = 2 * g_part
    cg = C2 // g
    xf = h.astype(jnp.float32)
    xg = xf.reshape(B, -1, g, cg)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(xg * xg, axis=(1, 3), keepdims=True) - mean * mean
    y = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(h.shape)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    y = y.astype(dtype)
    return jax.nn.silu(y) if silu else y


def _time_bias(t_embs, p, dtype):
    """Per-part Dense(silu(t_emb)) -> merged channel layout [B, 2*O]."""
    e = jax.nn.silu(t_embs)
    out = jnp.einsum("pbi,pio->pbo", e, p["kernel"].astype(dtype)) \
        + p["bias"].astype(dtype)[:, None, :]
    return out.transpose(1, 0, 2).reshape(out.shape[1], -1)


def _interleave(h, s):
    """[B,H,W,2Ch] + [B,H,W,2Cs] -> [B,H,W,2(Ch+Cs)] ordered
    [h_x, s_x, h_y, s_y] (per-part concat, matching the stored
    concat-formulation decoder kernels)."""
    Ch = h.shape[-1] // 2
    Cs = s.shape[-1] // 2
    return jnp.concatenate(
        [h[..., :Ch], s[..., :Cs], h[..., Ch:], s[..., Cs:]], axis=-1)


def _resblock(h, t_embs, p, out_ch, *, skip=None, dtype, eps=1e-6):
    """Merged ResBlock, mirroring models/layers.py:ResBlock (deterministic;
    math identical to both the concat and the split_skip formulations)."""
    if skip is not None:
        h = _interleave(h, skip)
    in_ch = h.shape[-1] // 2
    g = min(8, in_ch)
    z = _gn_silu(h, p["GroupNorm_0"], g, dtype=dtype, eps=eps)
    z = _gconv(z, p["conv1"], dtype=dtype)
    z = z + _time_bias(t_embs, p["time_mlp"], dtype)[:, None, None, :]
    z = _gn_silu(z, p["GroupNorm_1"], min(8, out_ch), dtype=dtype, eps=eps)
    z = _gconv(z, p["conv2"], dtype=dtype)
    if in_ch != out_ch:
        h = _gconv(h, p["skip"], pad=0, dtype=dtype)
    return z + h


def make_merged_velocity_fn(model) -> Callable:
    """Build fn(merged_params, x, y, t) -> (v_x, v_y) for a pair of nets
    that both have `model`'s topology (any FlexibleUNet; weights live in
    the merged tree from merge_unet_params). Deterministic (no dropout) —
    inference/sampling only."""
    mc = model.model_channels
    cmult = tuple(model.channel_mult)
    nrb = model.num_res_blocks
    cin = model.in_channels
    dtype = model.dtype
    eps = getattr(model, "norm_eps", 1e-6)

    def fn(p, x, y, t):
        h = jnp.concatenate([x, y], axis=-1).astype(dtype)

        t_emb = timestep_embedding(t, mc).astype(dtype)      # same for
        t_embs = jnp.broadcast_to(t_emb, (2,) + t_emb.shape)  # both parts
        t_embs = jnp.einsum("pbi,pio->pbo", t_embs,
                            p["time_dense1"]["kernel"].astype(dtype)) \
            + p["time_dense1"]["bias"].astype(dtype)[:, None, :]
        t_embs = jax.nn.silu(t_embs)
        t_embs = jnp.einsum("pbi,pio->pbo", t_embs,
                            p["time_dense2"]["kernel"].astype(dtype)) \
            + p["time_dense2"]["bias"].astype(dtype)[:, None, :]

        h = _gconv(h, p["input_conv"], dtype=dtype)

        hs = [h]
        blk = 0
        for level, mult in enumerate(cmult):
            out_ch = mc * mult
            for _ in range(nrb):
                h = _resblock(h, t_embs, p[f"enc_{blk}"], out_ch,
                              dtype=dtype, eps=eps)
                hs.append(h)
                blk += 1
            if level < len(cmult) - 1:
                h = _gconv(h, p[f"down_{level}"]["conv"], stride=2,
                           dtype=dtype)
                hs.append(h)

        ch = h.shape[-1] // 2
        h = _resblock(h, t_embs, p["middle_1"], ch, dtype=dtype, eps=eps)
        h = _resblock(h, t_embs, p["middle_2"], ch, dtype=dtype, eps=eps)

        blk = 0
        for rev_idx, level in enumerate(reversed(range(len(cmult)))):
            out_ch = mc * cmult[level]
            for _ in range(nrb + 1):
                h = _resblock(h, t_embs, p[f"dec_{blk}"], out_ch,
                              skip=hs.pop(), dtype=dtype, eps=eps)
                blk += 1
            if level > 0:
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = _gconv(h, p[f"up_{rev_idx}"]["conv"], dtype=dtype)

        h = _gn_silu(h, p["GroupNorm_0"], min(8, mc), dtype=dtype, eps=eps)
        h = _gconv(h, p["out_conv"], dtype=dtype)
        return h[..., :cin], h[..., cin:]

    return fn


def merged_pair_apply(model) -> Callable:
    """(params_x, params_y, x, y, t) -> (v_x, v_y), merging params on the
    fly (cheap inside jit: two concats per weight, hoisted by XLA when the
    trees are literals; for repeated calls prefer merge_unet_params once)."""
    fn = make_merged_velocity_fn(model)

    def apply(params_x, params_y, x, y, t):
        return fn(merge_unet_params(params_x, params_y), x, y, t)

    return apply
