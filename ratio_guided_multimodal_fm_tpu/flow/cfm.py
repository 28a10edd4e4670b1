"""Conditional Flow Matching (rectified flow / OT-CFM) math as pure functions.

Parity with ref flow_utils.py:10-100 (CFMSchedule) and
train_flow_svhn.py:58-81 (CFMScheduleFlexible): the path is

    x_t = (1-t)·x_0 + t·x_1,  x_0 ~ N(0,I),  target u = x_1 - x_0.

Everything here is rank-agnostic (broadcasts t over trailing dims), so the
"flexible" subclass the reference needed for SVHN is just the one function.
`euler_sample` is the unguided prior→data integrator as ONE jitted
`lax.scan` (reference: Python loop, flow_utils.py:69-100).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _bcast(t: jax.Array, ndim: int) -> jax.Array:
    """[B] → [B, 1, ..., 1] with `ndim` total dims."""
    return t.reshape(t.shape + (1,) * (ndim - 1))


def interpolate(key: jax.Array, x1: jax.Array, t: jax.Array):
    """Sample x_0 ~ N(0,I) and return (x_t, u_target).

    Args:
      key: PRNG key for the prior draw.
      x1: [B, ...] data batch.
      t: [B] times in [0,1].
    Returns:
      x_t = (1-t)x_0 + t·x_1, u = x_1 - x_0   (ref flow_utils.py:40-67)
    """
    x0 = jax.random.normal(key, x1.shape, x1.dtype)
    tb = _bcast(t.astype(x1.dtype), x1.ndim)
    x_t = (1.0 - tb) * x0 + tb * x1
    return x_t, x1 - x0


def cfm_loss(velocity_fn: Callable, key: jax.Array, x1: jax.Array) -> jax.Array:
    """Monte-Carlo CFM objective for one batch.

    t ~ U(0,1), x_t interpolated, loss = MSE(v(x_t,t), x_1-x_0)
    (ref flow_utils.py:103-156, the hot training loop body).

    Args:
      velocity_fn: (x_t, t) -> v, closed over params.
    """
    kt, kn = jax.random.split(key)
    t = jax.random.uniform(kt, (x1.shape[0],), dtype=x1.dtype)
    x_t, u = interpolate(kn, x1, t)
    v = velocity_fn(x_t, t)
    return jnp.mean((v.astype(jnp.float32) - u.astype(jnp.float32)) ** 2)


SOLVERS = ("euler", "midpoint", "heun")

TIME_GRIDS = ("uniform", "late", "early", "cosine")


def make_time_grid(num_steps: int, kind: str = "uniform",
                   power: float = 2.0):
    """Per-step (ts, dts) f32 arrays for the flow-ODE scans.

    t_i = g(i/N) for a monotone warp g: [0,1]→[0,1] with g(0)=0, g(1)=1;
    dt_i = g((i+1)/N) − g(i/N), so Σdt_i = 1 exactly and every solver
    still lands at t=1. Beyond the reference surface (flow_utils.py:85-100
    only has the uniform Euler grid): at a fixed velocity-eval budget,
    WHERE the steps sit is a free accuracy knob.

      'uniform' — g(s)=s; bit-exact with the reference grid (t_i = i·(1/N)
                  computed in f32 exactly as the old scan did).
      'late'    — g(s)=1−(1−s)^p (p=`power`): steps concentrate near t=1,
                  where the interpolant sharpens and the mc_feng
                  conditional velocity (x1−x_t)/(1−t) stiffens.
      'early'   — g(s)=s^p: dense near t=0.
      'cosine'  — g(s)=(1−cos πs)/2: dense at both endpoints.

    Host-side numpy: grids are static under jit (num_steps/kind/power are
    config), so the arrays become compile-time constants of the scan.
    """
    if kind not in TIME_GRIDS:
        raise ValueError(f"time grid must be one of {TIME_GRIDS}, "
                         f"got {kind!r}")
    if kind == "uniform":
        # Reproduce the old `t = i*dt` scan values bitwise: f32(i) * f32(dt).
        dt = np.float32(1.0 / num_steps)
        ts = np.arange(num_steps, dtype=np.float32) * dt
        dts = np.full((num_steps,), dt, np.float32)
        return jnp.asarray(ts), jnp.asarray(dts)
    s = np.linspace(0.0, 1.0, num_steps + 1)
    if kind == "late":
        g = 1.0 - (1.0 - s) ** power
    elif kind == "early":
        g = s ** power
    else:  # cosine
        g = 0.5 * (1.0 - np.cos(np.pi * s))
    g[0], g[-1] = 0.0, 1.0
    ts = g[:-1].astype(np.float32)
    dts = (g[1:] - g[:-1]).astype(np.float32)
    return jnp.asarray(ts), jnp.asarray(dts)


def ode_scan(velocity_fn: Callable, x0: jax.Array, num_steps: int = 100,
             unroll: int = 1, solver: str = "euler",
             grid: str = "uniform", grid_power: float = 2.0) -> jax.Array:
    """THE flow-ODE integrator: x0 at t=0 → x1 at t=1 via one lax.scan.

    t-grid = `make_time_grid(num_steps, grid, grid_power)` — 'uniform'
    reproduces the reference's step·dt grid bitwise (flow_utils.py:85-100;
    the reference only has uniform Euler). This is the single
    implementation used by `euler_sample`, the guided sampler's MC phase
    (sample/guided.py) and the distributed sampler
    (parallel/sharded_guidance.py) — a numerics change lands everywhere.
    Traceable (not jitted here); callers jit the program.

    Solvers (all fixed-step, same scan structure — XLA sees one fused
    program either way):
      'euler'    — 1 velocity eval/step, O(dt) local error (reference).
      'midpoint' — 2 evals/step, O(dt²): eval at t, half-step, re-eval at
                   t+dt/2, full step with the midpoint velocity. On a
                   trained rectified flow the trajectories are near-straight,
                   so midpoint at N/2 steps matches Euler at N — same
                   cost, or Euler quality at ~4× fewer steps.
      'heun'     — 2 evals/step, O(dt²): trapezoid of eval at t and at the
                   Euler-predicted endpoint t+dt (touches t=1.0 on the
                   last step, which is fine for FM nets but NOT for
                   mc_feng guidance — see sample/guided.py).
    """
    if solver not in SOLVERS:
        raise ValueError(f"solver must be one of {SOLVERS}, got {solver!r}")
    ts, dts = make_time_grid(num_steps, grid, grid_power)

    def step(x_t, tdt):
        t_s, dt = tdt
        t = jnp.full((x0.shape[0],), t_s, jnp.float32)
        v = velocity_fn(x_t, t).astype(jnp.float32)
        if solver == "midpoint":
            v = velocity_fn(x_t + 0.5 * dt * v,
                            t + 0.5 * dt).astype(jnp.float32)
        elif solver == "heun":
            v2 = velocity_fn(x_t + dt * v, t + dt).astype(jnp.float32)
            v = 0.5 * (v + v2)
        return x_t + v * dt, None

    x1, _ = jax.lax.scan(step, x0.astype(jnp.float32),
                         (ts, dts), unroll=unroll)
    return x1


def euler_scan(velocity_fn: Callable, x0: jax.Array, num_steps: int = 100,
               unroll: int = 1) -> jax.Array:
    """Back-compat alias: ode_scan with the reference's Euler solver."""
    return ode_scan(velocity_fn, x0, num_steps, unroll=unroll,
                    solver="euler")


def ode_scan_pair(pair_fn: Callable, x0: jax.Array, y0: jax.Array,
                  num_steps: int = 100, unroll: int = 1,
                  solver: str = "euler", grid: str = "uniform",
                  grid_power: float = 2.0):
    """Paired integrator: both modality ODEs advance in ONE scan so a
    merged-pair velocity fn (models/merged.py) evaluates both U-Nets as a
    single grouped-conv program. Same t-grid/numerics/solvers as ode_scan."""
    if solver not in SOLVERS:
        raise ValueError(f"solver must be one of {SOLVERS}, got {solver!r}")
    ts, dts = make_time_grid(num_steps, grid, grid_power)

    def step(carry, tdt):
        x_t, y_t = carry
        t_s, dt = tdt
        t = jnp.full((x0.shape[0],), t_s, jnp.float32)
        v_x, v_y = pair_fn(x_t, y_t, t)
        v_x = v_x.astype(jnp.float32)
        v_y = v_y.astype(jnp.float32)
        if solver == "midpoint":
            v_x, v_y = pair_fn(x_t + 0.5 * dt * v_x,
                               y_t + 0.5 * dt * v_y, t + 0.5 * dt)
            v_x = v_x.astype(jnp.float32)
            v_y = v_y.astype(jnp.float32)
        elif solver == "heun":
            v_x2, v_y2 = pair_fn(x_t + dt * v_x, y_t + dt * v_y, t + dt)
            v_x = 0.5 * (v_x + v_x2.astype(jnp.float32))
            v_y = 0.5 * (v_y + v_y2.astype(jnp.float32))
        return (x_t + v_x * dt, y_t + v_y * dt), None

    (x1, y1), _ = jax.lax.scan(step, (x0.astype(jnp.float32),
                                      y0.astype(jnp.float32)),
                               (ts, dts), unroll=unroll)
    return x1, y1


def euler_scan_pair(pair_fn: Callable, x0: jax.Array, y0: jax.Array,
                    num_steps: int = 100, unroll: int = 1):
    """Back-compat alias: ode_scan_pair with the reference's Euler solver."""
    return ode_scan_pair(pair_fn, x0, y0, num_steps, unroll=unroll,
                         solver="euler")


@partial(jax.jit, static_argnums=(0, 2, 3, 4, 5, 6))
def euler_sample(velocity_fn: Callable, key: jax.Array, shape: tuple,
                 num_steps: int = 100, solver: str = "euler",
                 grid: str = "uniform", grid_power: float = 2.0):
    """Integrate the flow ODE prior→data with a fused lax.scan loop.

    Matches CFMSchedule.sample semantics (t = step·dt grid, ref
    flow_utils.py:69-100) but compiles the whole trajectory into one XLA
    program — no per-step host dispatch. `solver` picks the ode_scan
    integrator and `grid` the step placement (the reference only has
    uniform 'euler').

    Args:
      velocity_fn: (x_t, t[B]) -> v.
      shape: full output shape, e.g. (N, 28, 28, 1) NHWC.
    """
    x0 = jax.random.normal(key, shape, jnp.float32)
    return ode_scan(velocity_fn, x0, num_steps, solver=solver,
                    grid=grid, grid_power=grid_power)
