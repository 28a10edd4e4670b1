"""Distributed guided sampling over a ('data','mc') mesh.

Scaling story (new capability — the reference is single-device, SURVEY §5.7/5.8):

* 'data' axis: the sample batch is sharded; each device integrates its own
  rows. Params are replicated (<=9.1M), so no communication in the velocity
  evals.
* 'mc' axis: the Monte-Carlo guidance set is sharded; every MC-phase Euler
  chain runs on its shard only, and the per-step importance-weight
  reductions (row-max, Z̄/p̄ means, Σw·X1) become pmax/psum over 'mc' —
  mathematically exact (tests/test_multichip.py). This is what lets N_mc
  scale past one chip's HBM: the reference OOMs at O(B·N_mc·D) on a single
  GPU; here the N_mc axis rides ICI.

RNG discipline: MC noise is keyed by the 'mc' shard index only, so all
'data' rows see the SAME MC set (matching single-device semantics); batch
noise is keyed by the 'data' index only, so shards draw disjoint rows.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from jax import shard_map

from ratio_guided_multimodal_fm_tpu.sample.guided import (
    EPS_T,
    GuidedSamplerConfig,
    mc_feng_guidance,
)


def make_distributed_guided_sampler(
    fm_x_fn: Callable,
    fm_y_fn: Callable,
    cfg: GuidedSamplerConfig,
    log_ratio_fn: Optional[Callable],
    mesh: Mesh,
    data_axis: str = "data",
    mc_axis: str = "mc",
):
    """Returns jitted sampler(key, num_samples) -> (x1, y1).

    num_samples must divide by the 'data' axis size; cfg.mc_batch_size by the
    'mc' axis size.
    """
    n_data = mesh.shape[data_axis]
    n_mc = mesh.shape[mc_axis]
    assert cfg.mc_batch_size % n_mc == 0, "mc_batch_size % mc axis != 0"
    mc_local = cfg.mc_batch_size // n_mc
    num_steps = cfg.num_steps
    dt = 1.0 / num_steps
    gamma = cfg.guidance_strength
    method = cfg.guidance_method
    guided = method != "none" and log_ratio_fn is not None

    def local(key: jax.Array, num_samples_local: int):
        di = jax.lax.axis_index(data_axis)
        mi = jax.lax.axis_index(mc_axis)

        # batch noise: unique per data shard, identical across mc shards
        kb = jax.random.fold_in(key, di)
        kx, ky = jax.random.split(jax.random.fold_in(kb, 1))
        x_t = jax.random.normal(kx, (num_samples_local,) + cfg.x_shape, jnp.float32)
        y_t = jax.random.normal(ky, (num_samples_local,) + cfg.y_shape, jnp.float32)

        mc_x1 = mc_y1 = mc_r = None
        if guided and method == "mc_feng":
            # MC noise: unique per mc shard, identical across data shards
            km = jax.random.fold_in(jax.random.fold_in(key, 7919), mi)
            kmx, kmy = jax.random.split(km)

            def euler(fn, k, shape):
                x = jax.random.normal(k, shape, jnp.float32)

                def step(x_t, i):
                    t = jnp.full((shape[0],), i * dt, jnp.float32)
                    return x_t + fn(x_t, t).astype(jnp.float32) * dt, None

                x, _ = jax.lax.scan(step, x, jnp.arange(num_steps))
                return x

            mc_x1 = euler(fm_x_fn, kmx, (mc_local,) + cfg.x_shape)
            mc_y1 = euler(fm_y_fn, kmy, (mc_local,) + cfg.y_shape)
            mc_r = jnp.exp(log_ratio_fn(mc_x1, mc_y1).astype(jnp.float32))

        def step(carry, i):
            x_t, y_t = carry
            t = i * dt
            tb = jnp.full((x_t.shape[0],), t, jnp.float32)
            v_x = fm_x_fn(x_t, tb).astype(jnp.float32)
            v_y = fm_y_fn(y_t, tb).astype(jnp.float32)
            if guided and method == "mc_feng":
                g_x, g_y, _ = mc_feng_guidance(
                    x_t, y_t, mc_x1, mc_y1, mc_r, t, mc_axis=mc_axis)
                gate = (t > EPS_T).astype(jnp.float32) * gamma
                v_x = (1.0 - gate) * v_x + gate * g_x
                v_y = (1.0 - gate) * v_y + gate * g_y
            elif guided and method == "grad":
                def lr_sum(xx, yy):
                    return jnp.sum(log_ratio_fn(xx, yy).astype(jnp.float32))
                g_x, g_y = jax.grad(lr_sum, argnums=(0, 1))(x_t, y_t)
                gate = (t > EPS_T).astype(jnp.float32) * gamma
                v_x = v_x + gate * g_x
                v_y = v_y + gate * g_y
            return (x_t + v_x * dt, y_t + v_y * dt), None

        (x_t, y_t), _ = jax.lax.scan(step, (x_t, y_t), jnp.arange(num_steps))
        return x_t, y_t

    def sampler(key: jax.Array, num_samples: int):
        assert num_samples % n_data == 0, "num_samples % data axis != 0"
        per = num_samples // n_data

        fn = shard_map(
            lambda k: local(k, per),
            mesh=mesh,
            in_specs=P(),
            out_specs=(P(data_axis), P(data_axis)),
            check_vma=False,
        )
        return fn(key)

    return sampler
