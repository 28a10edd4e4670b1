"""Shared CLI plumbing: argument groups, model factories, apply-fn builders.

Flag surfaces mirror the reference scripts exactly (SURVEY §5.6); `--device`
is accepted for compatibility but JAX owns device placement (the TPU is the
default backend; JAX_PLATFORMS=cpu forces CPU).
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.models import (
    FlowMatchingModel,
    FlowMatchingUNet,
)
from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
    checkpoint_exists,
    load_params,
)


def add_common_flags(p: argparse.ArgumentParser, seed_default: int = 42):
    p.add_argument("--device", type=str, default="tpu",
                   help="Backend: 'tpu' (default; whatever JAX selects) or "
                        "'cpu' to force the CPU backend. Needed because the "
                        "site hook pre-imports jax, so JAX_PLATFORMS set in "
                        "the environment can be clobbered before main() runs")
    p.add_argument("--seed", type=int, default=seed_default,
                   help="Random seed for reproducibility")
    p.add_argument("--data_root", type=str, default="./data",
                   help="Dataset root (IDX/.mat files; synthetic fallback)")
    p.add_argument("--dtype", type=str, default="f32",
                   choices=["f32", "bf16"],
                   help="Model activation dtype (params stay f32; guidance "
                        "weight math is always f32)")
    # Multi-host scaffolding (SURVEY §5.8; parallel/multihost.py). All
    # default to single-process; env vars RGMF_COORDINATOR /
    # RGMF_NUM_PROCESSES / RGMF_PROCESS_ID work too.
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 (multi-host runs)")
    p.add_argument("--num_processes", type=int, default=None,
                   help="total number of host processes")
    p.add_argument("--process_id", type=int, default=None,
                   help="this process's index in [0, num_processes)")
    p.add_argument("--no_prefetch", action="store_true",
                   help="disable the background device-prefetch input "
                        "pipeline (data/prefetch.py)")
    p.add_argument("--merged_unet", action="store_true",
                   help="evaluate the two velocity nets as one merged "
                        "grouped-conv program (models/merged.py; identical "
                        "math, same-topology pairs only). OFF by default: "
                        "measured 31%% SLOWER on v5e at the exp-1 workload "
                        "(docs/results_r3/merged_experiment.json) — XLA's "
                        "grouped-conv lowering loses to two dense convs")


def add_solver_flag(p: argparse.ArgumentParser):
    """--solver for every sampler-facing CLI (sample/evaluate/serve).

    The reference integrates with Euler only (flow_utils.py:85-100); the
    higher-order fixed-step solvers are a TPU-framework capability: same
    fused lax.scan, 2 velocity evals/step, O(dt²) local error — Euler-100
    sample quality at ~4× fewer steps on trained (near-straight) rectified
    flows (docs/results_r3/solver_study.json). 'heun' is unguided-only
    (see sample/guided.py:GuidedSamplerConfig.solver)."""
    p.add_argument("--solver", type=str, default="euler",
                   choices=["euler", "midpoint", "heun"],
                   help="ODE integrator: 'euler' (reference protocol), "
                        "'midpoint' (2 evals/step, 2nd order; composes "
                        "with guidance), 'heun' (2nd order, unguided only)")
    p.add_argument("--time_grid", type=str, default="uniform",
                   choices=["uniform", "late", "early", "cosine"],
                   help="ODE step placement (flow/cfm.py:make_time_grid): "
                        "'uniform' (reference grid), 'late' (dense near "
                        "t=1, where the flow and the guidance field "
                        "stiffen), 'early', 'cosine'. Free accuracy knob "
                        "at a fixed velocity-eval budget")
    p.add_argument("--grid_power", type=float, default=2.0,
                   help="warp exponent for --time_grid late/early "
                        "(g(s)=1-(1-s)^p / s^p)")


def add_smc_flags(p: argparse.ArgumentParser):
    """--smc_* knobs for the SMC (particle-filter) guidance method
    (sample/smc.py): Langevin churn + systematic resampling on the ratio
    potential — couples pairs WITHOUT a candidate pool, so coherence never
    costs snapping onto N_mc pre-generated samples."""
    p.add_argument("--smc_churn", type=float, default=1.0,
                   help="Langevin churn coefficient (beta_t = churn*(1-t)^2;"
                        " regenerates diversity after resampling; 0 = "
                        "deterministic ODE proposal)")
    p.add_argument("--smc_churn_iters", type=int, default=1,
                   help="Langevin iterations per ODE step (sample/smc.py "
                        "SMCSamplerConfig.churn_iters): >1 adds pure "
                        "marginal-preserving mixing iterations at t+dt "
                        "(2 extra U-Net evals each) — buys selection-"
                        "to-selection mixing at FEW ODE steps, where the "
                        "mixing budget (not integration error) is what "
                        "limits SMC coherence")
    p.add_argument("--smc_resample_tau", type=float, default=0.5,
                   help="systematic-resample when population ESS < tau*B")
    p.add_argument("--smc_t_min", type=float, default=0.2,
                   help="no resampling before this t (early endpoint "
                        "predictions are off-distribution for the "
                        "terminal-time ratio net)")
    p.add_argument("--smc_t_max", type=float, default=0.9,
                   help="no resampling after this t (leave churn time to "
                        "decorrelate resampled clones)")
    p.add_argument("--smc_resample_window", type=str, default="t",
                   choices=["t", "step"],
                   help="resample-window semantics: 't' gates on raw time "
                        "(round-4 protocol), 'step' gates on the step "
                        "fraction i/num_steps — identical on the uniform "
                        "grid, but keeps the selection budget constant "
                        "under non-uniform --time_grid (a fixed t-window "
                        "starves selection on the early grid: 0.525 vs "
                        "0.701, smc_mp12_early.json)")
    p.add_argument("--smc_group", type=int, default=16,
                   help="stratified (island) selection group size: "
                        "particles resample within independent groups of "
                        "this size, preserving class diversity ACROSS "
                        "groups (measured: global selection lets the "
                        "ratio net's class bias collapse label entropy — "
                        "docs/results_r4/smc_gamma_sweep.json). 0 = one "
                        "global population; any batch size works (a "
                        "non-dividing remainder is phantom-padded)")


def smc_config_from_args(args, strength: float, x_shape, y_shape):
    """Build an SMCSamplerConfig from the CLI flag surface."""
    from ratio_guided_multimodal_fm_tpu.sample.smc import SMCSamplerConfig

    return SMCSamplerConfig(
        guidance_strength=strength, num_steps=args.num_steps,
        x_shape=tuple(x_shape), y_shape=tuple(y_shape),
        churn=args.smc_churn,
        churn_iters=getattr(args, "smc_churn_iters", 1),
        resample_tau=args.smc_resample_tau,
        resample_t_min=args.smc_t_min, resample_t_max=args.smc_t_max,
        resample_group=args.smc_group,
        resample_window=getattr(args, "smc_resample_window", "t"),
        log_ratio_clip=getattr(args, "ratio_clip", None),
        solver=args.solver, time_grid=args.time_grid,
        grid_power=args.grid_power)


def add_fused_flag(p: argparse.ArgumentParser):
    """--fused_steps for the FM train CLIs (train/steps.py:
    make_fm_train_multistep): K optimizer steps per dispatch as one
    lax.scan program over the device-cached dataset."""
    p.add_argument("--fused_steps", type=int, default=1,
                   help="Run K optimizer steps per dispatch as ONE fused "
                        "lax.scan program over the device-cached dataset "
                        "— amortizes per-dispatch latency (the round-4 "
                        "train-MFU bottleneck). Single-process only. "
                        "Notes: the randomness stream differs from a K=1 "
                        "run of the same seed (per-sub-step fold_in), "
                        "trailing batches that don't fill a K-chunk are "
                        "dropped, and preemption granularity becomes K "
                        "steps. 1 = reference protocol.")


def add_fast_rng_flag(p: argparse.ArgumentParser):
    """--fast_rng for the train CLIs: XLA RngBitGenerator keys instead of
    threefry. Dropout mask generation with the default threefry PRNG costs
    2.2 ms of a 5.4 ms SVHN-FM forward at B=128 (fwd MFU 34% -> 54% with
    rbg, 58% with dropout off — docs/results_r5/profile_train_variants
    .json); rbg reclaims ~87% of that tax at the cost of a different
    (still deterministic, seeded) random stream than the reference
    protocol's."""
    p.add_argument("--fast_rng", action="store_true",
                   help="Use the XLA RngBitGenerator PRNG for all JAX "
                        "randomness (dropout masks, t/noise draws): "
                        "measured fwd 5.35 -> 3.42 ms at B=128 on the "
                        "v5e. Deterministic per seed, but a DIFFERENT "
                        "stream than the default threefry — leave off "
                        "for bit-reproducibility against earlier runs.")


def add_ema_flag(p: argparse.ArgumentParser):
    """--ema / --ratio_ema for every sampler-facing CLI: load the
    Polyak-averaged flow weights (flow_*_ema_best) and/or ratio weights
    (ratio_*_ema_best) written by training with --ema_decay. The two are
    orthogonal — --ema selects the FLOW nets, --ratio_ema the ratio net."""
    p.add_argument("--ratio_ema", action="store_true",
                   help="load EMA ratio-estimator weights "
                        "(ratio_*_ema_best; train with --ema_decay)")
    p.add_argument("--ema", action="store_true",
                   help="load the EMA (Polyak-averaged) flow checkpoints "
                        "(flow_*_ema_best; train with --ema_decay)")


def add_reflow_flag(p: argparse.ArgumentParser):
    """--reflow for every sampler-facing CLI: load the reflow-distilled
    flow checkpoints (cli/reflow.py writes them next to the teachers with
    a `_reflow` name part). Combine with `--num_steps 8` or `--solver
    midpoint --num_steps 4` — the straightened flows keep teacher quality
    at a fraction of the velocity evals (docs/results_r3/reflow_study.json)."""
    p.add_argument("--reflow", action="store_true",
                   help="use the reflow-distilled flows "
                        "(checkpoints/flow_*_reflow_best; see cli/reflow.py)")


def arm_preemption():
    """Train-CLI startup hook: route SIGTERM to the preemption flag so a
    signal landing before the epoch driver's PreemptionGuard (data
    loading / state init / first compile — minutes on a tunneled
    backend) is remembered and honored at the first completed step
    instead of killing the process unsaved.

    ONLY the train CLIs call this: they always reach train_epochs, which
    consumes the flag. Arming it in evaluate/sample/serve would make
    SIGTERM a silent no-op there (nothing polls the flag) — breaking
    `timeout`, graceful server shutdown, and plain `kill`.
    """
    from ratio_guided_multimodal_fm_tpu.train.preemption import arm
    arm()


def init_runtime(args):
    """Per-CLI runtime setup: backend override + multi-host init (no-op
    single-process). Returns (process_index, process_count)."""
    if getattr(args, "device", "tpu") == "cpu":
        import jax as _jax
        # Backends init lazily, so this still works after the site hook's
        # early `import jax` (which defeats env-var JAX_PLATFORMS).
        _jax.config.update("jax_platforms", "cpu")
    if getattr(args, "fast_rng", False):
        import jax as _jax
        # Every PRNGKey/split/fold_in made after this point is an rbg
        # key; flax dropout inherits it through the rngs dict.
        _jax.config.update("jax_default_prng_impl", "rbg")
    from ratio_guided_multimodal_fm_tpu.parallel.multihost import (
        maybe_init_distributed,
    )

    maybe_init_distributed(
        getattr(args, "coordinator_address", None),
        getattr(args, "num_processes", None),
        getattr(args, "process_id", None))
    import jax as _jax

    return _jax.process_index(), _jax.process_count()


def wrap_loader(loader, args, depth: int = 2):
    """Apply the background device-prefetch wrapper unless --no_prefetch.

    Auto-disabled on the axon-tunneled single-chip backend
    (JAX_PLATFORMS=axon): the producer thread's jax.device_put racing the
    main thread's first train-step compile deadlocks the tunnel — the
    client freezes permanently with every thread in futex_do_wait
    (reproduced 4x on 2026-08-17; --no_prefetch fixed it immediately).
    Real (non-tunneled) TPU runtimes multiplex concurrent dispatch fine.
    Force-enable there with RGMF_PREFETCH=1.
    """
    if getattr(args, "no_prefetch", False):
        return loader
    if ("axon" in os.environ.get("JAX_PLATFORMS", "")
            and os.environ.get("RGMF_PREFETCH") != "1"):
        print("prefetch: disabled on the axon tunnel backend "
              "(thread-concurrency deadlock; RGMF_PREFETCH=1 overrides)")
        return loader
    from ratio_guided_multimodal_fm_tpu.data.prefetch import PrefetchLoader

    return PrefetchLoader(loader, depth)


def dtype_of(args):
    import jax.numpy as jnp

    return jnp.bfloat16 if getattr(args, "dtype", "f32") == "bf16" else jnp.float32


def fm_model(kind: str, img_size: int = 28, dtype=None):
    """'--model unet|original' factory (ref sample.py:132-134)."""
    import jax.numpy as jnp

    kw = {"dtype": dtype} if dtype is not None else {}
    if kind == "unet":
        return FlowMatchingUNet(**kw)
    return FlowMatchingModel(**kw)


def multihost_adapt(state, step_fn, extract):
    """Adapt a (state, step, batch-extract) triple for multi-process DP.

    Single-process: returned unchanged. Multi-process (after
    init_runtime's jax.distributed init): the train state is replicated
    over a ('data',) mesh spanning ALL processes' devices, each batch
    becomes a globally sharded array (this process materializes only its
    contiguous row slice), and the per-step PRNG key is replicated. The
    jitted step then runs as one SPMD program: XLA shards the forward/
    backward over 'data' and all-reduces the gradients — no step-code
    changes. Checkpoints: every process calls save (replicated metrics ⇒
    identical decisions) and Orbax coordinates the single write
    internally. Validated by a real 2-process run in
    tests/test_multihost_train.py.
    """
    import jax as _jax

    if _jax.process_count() == 1:
        return state, step_fn, extract
    from ratio_guided_multimodal_fm_tpu.parallel.multihost import (
        global_data_mesh,
        globalize_batch,
        replicate_tree,
    )

    mesh = global_data_mesh()
    state = state.replace(
        params=replicate_tree(state.params, mesh),
        opt_state=replicate_tree(state.opt_state, mesh),
        **({"batch_stats": replicate_tree(state.batch_stats, mesh)}
           if getattr(state, "batch_stats", None) is not None else {}),
        **({"ema_params": replicate_tree(state.ema_params, mesh)}
           if getattr(state, "ema_params", None) is not None else {}))
    rep = _jax.sharding.NamedSharding(mesh, _jax.sharding.PartitionSpec())

    def step2(s, b, k):
        return step_fn(s, b, _jax.device_put(k, rep))

    def extract2(b):
        return globalize_batch(extract(b), mesh)

    return state, step2, extract2


def velocity_fn(model, params):
    """Closure (x, t) -> v with fixed params (inference, no dropout)."""
    return lambda x, t: model.apply({"params": params}, x, t)


def maybe_merged_pair_fn(model_x, model_y, params_x, params_y, args=None):
    """(x, y, t) -> (v_x, v_y) evaluating BOTH nets as one grouped-conv
    program (models/merged.py) when their topologies match AND the user
    passed --merged_unet; None otherwise. Math is identical either way;
    the merged program measured 31% slower on v5e (merged_experiment.json)
    so separate evaluation is the default."""
    if args is None or not getattr(args, "merged_unet", False):
        return None
    from ratio_guided_multimodal_fm_tpu.models.merged import (
        can_merge,
        make_merged_velocity_fn,
        merge_unet_params,
    )
    if not can_merge(model_x, model_y):
        return None
    merged = merge_unet_params(params_x, params_y)
    f = make_merged_velocity_fn(model_x)
    return lambda x, y, t: f(merged, x, y, t)


def ratio_log_fn(model, variables):
    """Closure (x, y) -> log r̂ for guidance."""
    def fn(x, y):
        return model.apply(variables, x, y, method=model.log_ratio)
    return fn


def load_params_or_exit(path: str, template, what: str, hint: str):
    if not checkpoint_exists(path):
        raise SystemExit(
            f"ERROR: {what} checkpoint not found: {path}\n{hint}")
    return load_params(path, template)


def summarize_diagnostics(diags, num_steps: int,
                          time_grid: str = "uniform",
                          grid_power: float = 2.0) -> list:
    """Per-step summary rows from the sampler's stacked diagnostics
    (arrays of shape [T] or [T, B]). `time_grid` labels each row with the
    ACTUAL step time (non-uniform grids, flow/cfm.py:make_time_grid)."""
    if not diags:
        return []
    from ratio_guided_multimodal_fm_tpu.flow.cfm import make_time_grid
    ts = np.asarray(make_time_grid(num_steps, time_grid, grid_power)[0])
    d = {k: np.asarray(v) for k, v in diags.items()}
    rows = []
    for s in range(num_steps):
        row = {"step": s, "t": round(float(ts[s]), 4)}
        for k, v in sorted(d.items()):
            if v.ndim == 0:
                continue   # run-level scalars (e.g. SMC final_ess)
            if v.ndim == 1:
                row[k] = float(v[s])
            else:
                row[f"{k}_mean"] = float(v[s].mean())
                row[f"{k}_min"] = float(v[s].min())
        rows.append(row)
    return rows


def report_guidance_diagnostics(diags, num_steps: int, save_path=None,
                                log_fn=print, time_grid: str = "uniform",
                                grid_power: float = 2.0) -> list:
    """Print guidance diagnostics at ~30% marks — parity+ with the
    reference's mid-trajectory prints (flow_utils.py:349-363) — and
    optionally save the full per-step trace as JSON. The headline addition
    over the reference is the effective sample size (ESS) of the importance
    weights: ESS → 1 is the weight-collapse failure mode."""
    rows = summarize_diagnostics(diags, num_steps, time_grid, grid_power)
    if not rows:
        return rows
    stride = max(1, int(0.3 * num_steps))
    for s in range(stride, num_steps, stride):
        r = rows[s]
        parts = [f"t={r['t']:.2f}"]
        if "ess_mean" in r:
            parts.append(f"ESS mean={r['ess_mean']:.1f} min={r['ess_min']:.1f}")
        if "smc_ess" in r:
            # 'resampled' is 0/1 in global mode, the FRACTION of islands
            # that resampled in island mode — print it as a float (int()
            # would show 0 for a step where 15/32 islands fired).
            parts.append(f"SMC-ESS={r['smc_ess']:.1f}"
                         f" resampled={r.get('resampled', 0.0):.2f}")
        for k in ("v_x_norm", "v_y_norm", "g_x_norm", "g_y_norm"):
            if k in r:
                parts.append(f"{k.replace('_norm','')}||={r[k]:.3f}")
        if "w_max" in r:
            parts.append(f"w∈[{r.get('w_min', 0):.2e},{r['w_max']:.2e}]")
        if "Z_bar_mean" in r:
            parts.append(f"Z̄={r['Z_bar_mean']:.3e}")
        log_fn("  [guidance diag] " + "  ".join(parts))
    if save_path:
        import json

        with open(save_path, "w") as f:
            json.dump(rows, f, indent=1)
        log_fn(f"  Diagnostics trace saved to: {save_path}")
    return rows


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def batch_to_jnp(batch: dict) -> dict:
    return {k: jnp.asarray(v) for k, v in batch.items()}
