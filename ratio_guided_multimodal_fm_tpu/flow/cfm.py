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


def euler_scan(velocity_fn: Callable, x0: jax.Array, num_steps: int = 100,
               unroll: int = 1) -> jax.Array:
    """THE Euler integrator: x0 at t=0 → x1 at t=1 via one lax.scan.

    t-grid = step·dt (ref flow_utils.py:85-100). This is the single
    implementation used by `euler_sample`, the guided sampler's MC phase
    (sample/guided.py) and the distributed sampler
    (parallel/sharded_guidance.py) — a numerics change lands everywhere.
    Traceable (not jitted here); callers jit the surrounding program.
    """
    dt = 1.0 / num_steps

    def step(x_t, i):
        t = jnp.full((x0.shape[0],), i * dt, jnp.float32)
        v = velocity_fn(x_t, t)
        return x_t + v.astype(jnp.float32) * dt, None

    x1, _ = jax.lax.scan(step, x0.astype(jnp.float32),
                         jnp.arange(num_steps), unroll=unroll)
    return x1


def euler_scan_pair(pair_fn: Callable, x0: jax.Array, y0: jax.Array,
                    num_steps: int = 100, unroll: int = 1):
    """Paired Euler integrator: both modality ODEs advance in ONE scan so a
    merged-pair velocity fn (models/merged.py) evaluates both U-Nets as a
    single grouped-conv program. Same t-grid/numerics as euler_scan."""
    dt = 1.0 / num_steps

    def step(carry, i):
        x_t, y_t = carry
        t = jnp.full((x0.shape[0],), i * dt, jnp.float32)
        v_x, v_y = pair_fn(x_t, y_t, t)
        return (x_t + v_x.astype(jnp.float32) * dt,
                y_t + v_y.astype(jnp.float32) * dt), None

    (x1, y1), _ = jax.lax.scan(step, (x0.astype(jnp.float32),
                                      y0.astype(jnp.float32)),
                               jnp.arange(num_steps), unroll=unroll)
    return x1, y1


@partial(jax.jit, static_argnums=(0, 2, 3))
def euler_sample(velocity_fn: Callable, key: jax.Array, shape: tuple, num_steps: int = 100):
    """Integrate the flow ODE prior→data with a fused lax.scan Euler loop.

    Matches CFMSchedule.sample semantics (t = step·dt grid, ref
    flow_utils.py:69-100) but compiles the whole trajectory into one XLA
    program — no per-step host dispatch.

    Args:
      velocity_fn: (x_t, t[B]) -> v.
      shape: full output shape, e.g. (N, 28, 28, 1) NHWC.
    """
    x0 = jax.random.normal(key, shape, jnp.float32)
    return euler_scan(velocity_fn, x0, num_steps)
