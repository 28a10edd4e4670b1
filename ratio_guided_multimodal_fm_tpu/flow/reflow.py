"""Reflow (rectified-flow distillation): few-step sampling for the whole
framework.

Beyond the reference surface — the reference only trains base CFM
(flow_utils.py:103-156) and integrates with 100 Euler steps everywhere.
Reflow (Liu et al. 2022, "Flow Straight and Fast") retrains a flow on its
OWN deterministic couplings: draw x0 ~ N(0,I), integrate the teacher to
x1 = ODE(x0), then fit the student with the same CFM objective but the
GIVEN (x0, x1) pairing instead of the independent coupling. The marginals
are preserved while trajectories straighten, so after one round a handful
of Euler steps (or 2-4 midpoint steps, flow/cfm.py:ode_scan) reproduces
the teacher's 100-step samples — a 10-25× sampler speedup that drops
straight into the guided sampler: BOTH the MC candidate phase and the
main guided loop just get cheaper (sample/guided.py takes `num_steps` /
`solver` as config).

TPU shape: coupling generation is the teacher's fused ode_scan at a fixed
generation batch (one compiled program reused across the set); training is
the same donated jitted step as base FM. Teacher params are passed as jit
ARGUMENTS (never closure constants — CLAUDE.md remote-compile limits).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.core.guards import check_finite
from ratio_guided_multimodal_fm_tpu.flow.cfm import _bcast, ode_scan


def reflow_loss(velocity_fn: Callable, key: jax.Array,
                x0: jax.Array, x1: jax.Array) -> jax.Array:
    """CFM objective with a GIVEN coupling: t~U, x_t on the (x0,x1) chord,
    target u = x1 - x0. Identical to flow/cfm.py:cfm_loss except x0 comes
    from the coupling instead of a fresh prior draw."""
    t = jax.random.uniform(key, (x1.shape[0],), jnp.float32)
    tb = _bcast(t.astype(x1.dtype), x1.ndim)
    x_t = (1.0 - tb) * x0 + tb * x1
    u = x1 - x0
    v = velocity_fn(x_t, t)
    return jnp.mean((v.astype(jnp.float32) - u.astype(jnp.float32)) ** 2)


def make_reflow_train_step(model, *, donate: bool = True) -> Callable:
    """Build step(state, x0, x1, key) -> (state, loss). Twin of
    train/steps.py:make_fm_train_step with the coupling as data."""

    def step(state, x0: jax.Array, x1: jax.Array, key: jax.Array):
        kt, kd = jax.random.split(key)

        def loss_fn(params):
            return reflow_loss(
                lambda x, t: model.apply({"params": params}, x, t,
                                         deterministic=False,
                                         rngs={"dropout": kd}),
                kt, x0, x1)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        check_finite(loss, "reflow train loss")
        return state.apply_gradients(grads=grads), loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())


@partial(jax.jit, static_argnums=(0, 3, 4, 5, 6))
def _gen_batch(apply_fn, params, key, batch: int, shape: tuple,
               num_steps: int, solver: str):
    x0 = jax.random.normal(key, (batch,) + shape, jnp.float32)
    x1 = ode_scan(lambda x, t: apply_fn(params, x, t), x0, num_steps,
                  solver=solver)
    return x0, x1


def generate_couplings(
    apply_fn: Callable,            # (params, x, t[B]) -> v
    params,
    key: jax.Array,
    num_pairs: int,
    shape: Tuple[int, ...],
    num_steps: int = 100,
    solver: str = "euler",
    gen_batch_size: int = 512,
) -> Tuple[np.ndarray, np.ndarray]:
    """Teacher dataset for reflow: (x0, x1=ODE(x0)) as host numpy arrays.

    One compiled program (fixed gen batch) reused across ceil(n/B) launches;
    the host accumulates — the device only ever holds one batch. num_pairs
    is rounded up to a multiple of gen_batch_size (extra pairs are kept:
    more couplings never hurt)."""
    n_batches = -(-num_pairs // gen_batch_size)
    xs0, xs1 = [], []
    for i in range(n_batches):
        k = jax.random.fold_in(key, i)
        x0, x1 = _gen_batch(apply_fn, params, k, gen_batch_size,
                            tuple(shape), num_steps, solver)
        # host readback is the real barrier on the axon backend
        xs0.append(np.asarray(x0))
        xs1.append(np.asarray(x1))
    return np.concatenate(xs0), np.concatenate(xs1)
