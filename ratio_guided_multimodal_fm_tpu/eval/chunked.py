"""Chunked sampling with fresh MC sets — the evaluate CLIs' default.

The mc_feng guidance quality of a *saturated* ratio estimator is controlled
by the number of MC candidates each trajectory gets to choose from
(measured, docs/ROUND2.md §1: a 30-epoch discriminator collapses γ=1
coherence to 0.068 with one shared 256-candidate set, recovers to 0.365
with 4 fresh sets — exceeding the torch reference's best-effort 0.314).
Round 2 shipped the remedy behind an opt-in flag (--eval_chunks); this
module makes it the DEFAULT (VERDICT r2 #2).

Why unconditional rather than ESS-triggered. VERDICT suggested triggering
on collapsed ESS; calibration against the real round-2 checkpoints
(docs/results_r3/chunk_trigger_calibration.json) shows NO ESS signal
separates the failing regime from the healthy one:

* pre-sampling, the ESS of softmax(log r̂) over the MC set (== trajectory
  ESS at t≈0) is 16.2 for the healthy 10-epoch discriminator and **25.2**
  for the saturated 30-epoch one — the saturated net is not more
  weight-concentrated;
* during sampling, trajectory-mean ESS at γ=1 is 2.04 healthy vs **2.79**
  saturated, with near-identical per-step collapse curves (ESS→1 by t≈0.3
  in every regime).

The failure mode is MIS-RANKING (the overfit discriminator's top-rank
precision on off-distribution flow samples drops — ROUND2.md §1), which no
weight statistic detects before the classifier sees the samples. The
remedy, however, is uniformly safe: a fresh MC set per chunk multiplies
candidates-per-trajectory at zero device-memory cost, matches the torch
reference protocol exactly (flow_utils.py:231-258 regenerates the MC set
inside every sampling call — the round-2 parity asymmetry the advisor
flagged ran in torch's favor for this very reason), recovers the saturated
regime, and is neutral-to-positive when the ratio net is healthy. So the
default is: always chunk (auto_chunks=4). `--eval_chunks 1` restores the
round-2 single-shared-set protocol; an integer forces that many chunks.

`mc_set_ess` stays as a reported diagnostic (it is still the honest
summary of how concentrated the candidate weights start out).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import numpy as np

DEFAULT_AUTO_CHUNKS = 4


def mc_set_ess(mc_ratios) -> float:
    """ESS of the normalized ratio weights over the MC set.

    Equals the guidance-trajectory ESS at t≈0 (see module docstring): N for
    a flat discriminator, → 1 for a saturated one. Computed in f64 on host
    so huge ratio spreads don't overflow the summaries themselves.
    """
    r = np.asarray(jax.device_get(mc_ratios), dtype=np.float64)
    r = np.maximum(r, 0.0)
    s = r.sum()
    if not np.isfinite(s) or s <= 0.0:
        return 1.0
    w = r / s
    return float(1.0 / np.maximum((w * w).sum(), 1e-300))


def resolve_chunk_policy(
    eval_chunks,                      # "auto" | int | None
    has_mc_set: bool,
    auto_chunks: int = DEFAULT_AUTO_CHUNKS,
    no_mc_reason: str = "no MC set (method has no candidate pool)",
) -> Tuple[int, str]:
    """Returns (n_chunks, reason). `eval_chunks` may be the string "auto"
    (default: fresh MC set per chunk whenever the method uses an MC set —
    see module docstring for why this is unconditional), an int (forced),
    or None (treated as auto). `no_mc_reason` labels the has_mc_set=False
    single-chunk decision — callers whose sampler regenerates candidates
    internally (mc_refresh>1) pass an accurate provenance string so eval
    artifacts don't mislabel mc_feng rows as pool-free (r4 verdict)."""
    if eval_chunks is not None and eval_chunks != "auto":
        n = max(1, int(eval_chunks))
        return n, f"forced (--eval_chunks {eval_chunks})"
    if not has_mc_set:
        return 1, no_mc_reason
    return (max(1, auto_chunks),
            "default: fresh MC candidates per chunk (candidates-per-"
            "trajectory controls guided quality; reference protocol — "
            "ROUND2.md, chunk_trigger_calibration.json)")


def _merge_diags(chunk_diags: list) -> dict:
    """Merge per-chunk sampler diagnostics (dicts of [T] or [T,B] arrays)
    into one dict covering ALL samples: [T,B] arrays concatenate on the
    batch axis; per-step scalars aggregate by max/min for *_max/*_min keys
    and by unweighted mean otherwise (chunk sizes differ by at most 1)."""
    chunk_diags = [d for d in chunk_diags if d]
    if not chunk_diags:
        return {}
    out = {}
    for k in chunk_diags[0]:
        vs = [np.asarray(jax.device_get(d[k])) for d in chunk_diags]
        if vs[0].ndim >= 2:
            out[k] = np.concatenate(vs, axis=1)
        elif k.endswith("_max"):
            out[k] = np.max(vs, axis=0)
        elif k.endswith("_min"):
            out[k] = np.min(vs, axis=0)
        else:
            out[k] = np.mean(vs, axis=0)
    return out


def sample_in_chunks(
    sample_fn: Callable,     # (key, n, mc_set) -> (x, y, diags)
    make_mc_set: Optional[Callable],  # (key) -> mc_set, or None
    num_samples: int,
    key: jax.Array,
    eval_chunks="auto",
    auto_chunks: int = DEFAULT_AUTO_CHUNKS,
    mc_cache: Optional[dict] = None,
    log_fn: Callable = print,
    no_mc_reason: str = "no MC set (method has no candidate pool)",
) -> Tuple[jax.Array, jax.Array, dict, Dict]:
    """Chunked sampling with a fresh MC set per chunk (the default policy).

    Returns (samples_x, samples_y, merged_diags, info) where info records
    the policy decision, per-chunk MC-set ESS, and aggregate ESS summaries.

    `mc_cache` (optional dict) caches MC sets across calls — an eval sweep
    reuses identical sets across guidance strengths (they are
    γ-independent), including the per-chunk fresh sets. Keys: chunk index
    (or "single" for the one-chunk protocol).

    Key discipline matches the round-2 --eval_chunks implementation
    exactly: n_chunks == 1 uses `key` for both the MC set and the sampling
    call; n_chunks > 1 uses fold_in(key, ci) per chunk and
    fold_in(chunk_key, 7) for that chunk's MC set.
    """
    mc_cache = {} if mc_cache is None else mc_cache
    info: Dict = {}

    n_chunks, reason = resolve_chunk_policy(
        eval_chunks, make_mc_set is not None, auto_chunks,
        no_mc_reason=no_mc_reason)
    n_chunks = min(n_chunks, max(1, num_samples))
    info["n_chunks"] = n_chunks
    info["chunk_policy"] = reason
    log_fn(f"  [chunks] {reason} -> {n_chunks} chunk(s)")

    base, extra = divmod(num_samples, n_chunks)
    xs, ys, diags_per_chunk, ess_list = [], [], [], []
    for ci in range(n_chunks):
        n_i = base + (1 if ci < extra else 0)
        if n_i == 0:
            continue
        ck = jax.random.fold_in(key, ci) if n_chunks > 1 else key
        mc_ci = None
        if make_mc_set is not None:
            if n_chunks == 1:
                if "single" not in mc_cache:
                    mc_cache["single"] = make_mc_set(key)
                mc_ci = mc_cache["single"]
            else:
                if ci not in mc_cache:
                    mc_cache[ci] = make_mc_set(jax.random.fold_in(ck, 7))
                mc_ci = mc_cache[ci]
            ess_list.append(mc_set_ess(mc_ci[2]))
        sx, sy, d = sample_fn(ck, n_i, mc_ci)
        xs.append(sx)
        ys.append(sy)
        diags_per_chunk.append(d)

    import jax.numpy as jnp

    samples_x = jnp.concatenate(xs) if len(xs) > 1 else xs[0]
    samples_y = jnp.concatenate(ys) if len(ys) > 1 else ys[0]
    merged = _merge_diags(diags_per_chunk)

    if ess_list:
        info["mc_set_ess"] = [round(e, 3) for e in ess_list]
    if "ess" in merged:
        ess = merged["ess"]            # [T, num_samples], all chunks
        # step 0 is excluded from trajectory stats: the guidance gate
        # (t > EPS_T) is closed there and its ESS is a constant N.
        traj = ess[1:] if ess.shape[0] > 1 else ess
        info["ess_final_mean"] = float(ess[-1].mean())
        info["ess_final_min"] = float(ess[-1].min())
        info["ess_trajectory_min"] = float(traj.min())
        info["ess_trajectory_mean"] = float(traj.mean())
    return samples_x, samples_y, merged, info
