"""Distributed guided sampling over a ('data','mc') mesh.

Scaling story (new capability — the reference is single-device, SURVEY §5.7/5.8):

* 'data' axis: the sample batch is sharded; each device integrates its own
  rows. Params are replicated (<=9.1M), so no communication in the velocity
  evals.
* 'mc' axis: the Monte-Carlo guidance set is sharded; every MC-phase Euler
  chain runs on its shard only, and the per-step importance-weight
  reductions (row-max, Z̄/p̄ means, Σw·X1) become pmax/psum over 'mc' —
  mathematically exact. This is what lets N_mc scale past one chip's HBM:
  the reference OOMs at O(B·N_mc·D) on a single GPU; here the N_mc axis
  rides ICI.

RNG discipline: every shard derives the SAME (kx, ky, kmx, kmy) as the
single-device sampler (sample/guided.py) and draws the FULL initial-noise
tensors, then slices its own rows by axis index. Initial noise is the only
full-size tensor ever materialized (RNG is ~free next to 100 U-Net evals);
all chains and guidance reductions run on shards. Consequence: given the
same key, the distributed sampler equals the single-device sampler up to
floating-point reduction order — asserted by
tests/test_distributed_sampler.py.

The guided Euler step body is shared with the single-device sampler
(`sample.guided._make_guided_step`), and the MC phase uses the one
`flow.cfm.ode_scan` integrator — no duplicated numerics.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ratio_guided_multimodal_fm_tpu.flow.cfm import make_time_grid, ode_scan
from ratio_guided_multimodal_fm_tpu.sample.guided import (
    GuidedSamplerConfig,
    _make_guided_step,
)


def make_distributed_guided_sampler_p(
    fm_x_apply: Callable,            # (params_x, x, t) -> v
    fm_y_apply: Callable,
    cfg: GuidedSamplerConfig,
    log_ratio_apply: Optional[Callable],  # (ratio_vars, x, y) -> [B]
    mesh: Mesh,
    data_axis: str = "data",
    mc_axis: str = "mc",
):
    """Params-as-arguments distributed sampler.

    Returns sampler(params, key, num_samples, mc_set=None, init_noise=None)
    -> (x1, y1); jitted internally (one compile per distinct
    (num_samples, mc_set?, init_noise?) signature — callers cannot
    accidentally re-trace per call).

    num_samples must divide by the 'data' axis size; cfg.mc_batch_size by
    the 'mc' axis size.
    """
    n_data = mesh.shape[data_axis]
    n_mc = mesh.shape[mc_axis]
    assert cfg.mc_batch_size % n_mc == 0, "mc_batch_size % mc axis != 0"
    mc_local = cfg.mc_batch_size // n_mc
    num_steps = cfg.num_steps
    method = cfg.guidance_method
    guided = method != "none" and log_ratio_apply is not None

    def local(params, key: jax.Array, num_samples: int, mc_set, init_noise):
        di = jax.lax.axis_index(data_axis)
        mi = jax.lax.axis_index(mc_axis)
        per = num_samples // n_data

        params_x, params_y, ratio_vars = params
        fm_x_fn = lambda x, t: fm_x_apply(params_x, x, t)   # noqa: E731
        fm_y_fn = lambda y, t: fm_y_apply(params_y, y, t)   # noqa: E731
        log_ratio_fn = None
        if log_ratio_apply is not None:
            log_ratio_fn = lambda x, y: log_ratio_apply(ratio_vars, x, y)  # noqa: E731

        # Same key discipline as the single-device sampler.
        kx, ky, kmx, kmy = jax.random.split(key, 4)
        if init_noise is not None:
            x_t, y_t = init_noise  # already row-sharded by in_specs
        else:
            # Draw the FULL noise and slice this shard's rows, so the
            # trajectory set is identical to the single-device sampler.
            x_full = jax.random.normal(
                kx, (num_samples,) + cfg.x_shape, jnp.float32)
            y_full = jax.random.normal(
                ky, (num_samples,) + cfg.y_shape, jnp.float32)
            x_t = jax.lax.dynamic_slice_in_dim(x_full, di * per, per, 0)
            y_t = jax.lax.dynamic_slice_in_dim(y_full, di * per, per, 0)

        if guided and method == "mc_feng" and mc_set is None:
            x0_full = jax.random.normal(
                kmx, (cfg.mc_batch_size,) + cfg.x_shape, jnp.float32)
            y0_full = jax.random.normal(
                kmy, (cfg.mc_batch_size,) + cfg.y_shape, jnp.float32)
            x0 = jax.lax.dynamic_slice_in_dim(x0_full, mi * mc_local,
                                              mc_local, 0)
            y0 = jax.lax.dynamic_slice_in_dim(y0_full, mi * mc_local,
                                              mc_local, 0)
            mc_x1 = ode_scan(fm_x_fn, x0, num_steps, solver=cfg.solver,
                             grid=cfg.time_grid, grid_power=cfg.grid_power)
            mc_y1 = ode_scan(fm_y_fn, y0, num_steps, solver=cfg.solver,
                             grid=cfg.time_grid, grid_power=cfg.grid_power)
            log_r = log_ratio_fn(mc_x1, mc_y1).astype(jnp.float32)
            if cfg.log_ratio_clip is not None:
                log_r = jnp.clip(log_r, -cfg.log_ratio_clip,
                                 cfg.log_ratio_clip)
            mc_set = (mc_x1, mc_y1, jnp.exp(log_r))

        step = _make_guided_step(fm_x_fn, fm_y_fn, cfg, log_ratio_fn,
                                 mc_set, mc_axis)
        grid = make_time_grid(num_steps, cfg.time_grid, cfg.grid_power)
        (x_t, y_t), _ = jax.lax.scan(step, (x_t, y_t), grid)
        return x_t, y_t

    _compiled: dict = {}

    def sampler(params, key: jax.Array, num_samples: int,
                mc_set=None, init_noise=None):
        assert num_samples % n_data == 0, "num_samples % data axis != 0"
        sig = (num_samples, mc_set is None, init_noise is None)
        if sig not in _compiled:
            fn = shard_map(
                lambda p, k, ms, ini: local(p, k, num_samples, ms, ini),
                mesh=mesh,
                in_specs=(P(), P(),
                          P() if mc_set is None else (P(mc_axis),) * 3,
                          P() if init_noise is None else (P(data_axis),) * 2),
                out_specs=(P(data_axis), P(data_axis)),
                check_vma=False,
            )
            _compiled[sig] = jax.jit(fn)
        return _compiled[sig](params, key, mc_set, init_noise)

    return sampler


def make_distributed_guided_sampler(
    fm_x_fn: Callable,
    fm_y_fn: Callable,
    cfg: GuidedSamplerConfig,
    log_ratio_fn: Optional[Callable],
    mesh: Mesh,
    data_axis: str = "data",
    mc_axis: str = "mc",
):
    """Closure-sugar variant (params baked into the callables); returns
    jitted sampler(key, num_samples, mc_set=None, init_noise=None)."""
    inner = make_distributed_guided_sampler_p(
        lambda _, x, t: fm_x_fn(x, t),
        lambda _, y, t: fm_y_fn(y, t),
        cfg,
        None if log_ratio_fn is None else (lambda _, x, y: log_ratio_fn(x, y)),
        mesh, data_axis=data_axis, mc_axis=mc_axis,
    )

    def sampler(key: jax.Array, num_samples: int, mc_set=None,
                init_noise=None):
        return inner((None, None, None), key, num_samples, mc_set,
                     init_noise)

    return sampler
