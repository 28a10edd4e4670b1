"""Multi-chip sharding tests on the 8-device fake CPU mesh (SURVEY §4 plan).

Validates: DP train step with replicated params/sharded batch; MC-axis
sharded guidance == single-device guidance (psum/pmax reductions are exact).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ratio_guided_multimodal_fm_tpu.parallel.mesh import make_mesh
from ratio_guided_multimodal_fm_tpu.sample.guided import mc_feng_guidance


def test_fake_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_graft_dryrun_multichip():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_mc_sharded_guidance_matches_single_device():
    """Sharding N_mc over 8 devices must give identical guidance (the
    reductions are plain sums/means/maxes over N)."""
    rng = np.random.RandomState(0)
    B, N, H = 4, 16, 6
    x_t = jnp.array(rng.randn(B, H, H, 1).astype(np.float32))
    y_t = jnp.array(rng.randn(B, H, H, 1).astype(np.float32))
    mc_x = jnp.array(rng.randn(N, H, H, 1).astype(np.float32))
    mc_y = jnp.array(rng.randn(N, H, H, 1).astype(np.float32))
    mc_r = jnp.array(np.exp(rng.randn(N)).astype(np.float32))
    t = jnp.float32(0.5)

    g_x_ref, g_y_ref, _ = mc_feng_guidance(x_t, y_t, mc_x, mc_y, mc_r, t)

    mesh = make_mesh(8, ("mc",))

    def f(x_t, y_t, mx, my, mr):
        gx, gy, _ = mc_feng_guidance(x_t, y_t, mx, my, mr, t, mc_axis="mc")
        return gx, gy

    sharded = shard_map(f, mesh=mesh,
                        in_specs=(P(), P(), P("mc"), P("mc"), P("mc")),
                        out_specs=(P(), P()))
    g_x, g_y = jax.jit(sharded)(x_t, y_t, mc_x, mc_y, mc_r)

    np.testing.assert_allclose(np.asarray(g_x), np.asarray(g_x_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_y), np.asarray(g_y_ref),
                               rtol=1e-4, atol=1e-5)


def test_dp_batch_sharding_loss_matches_replicated():
    """Same batch, sharded vs replicated → identical loss (deterministic key)."""
    from ratio_guided_multimodal_fm_tpu.flow.losses import disc_loss

    mesh = make_mesh(8, ("data",))
    s = jnp.array(np.random.RandomState(1).randn(16).astype(np.float32))
    m = jnp.array((np.arange(16) % 2).astype(np.float32))

    loss_ref, _ = disc_loss(s, m)
    s_sh = jax.device_put(s, NamedSharding(mesh, P("data")))
    m_sh = jax.device_put(m, NamedSharding(mesh, P("data")))
    loss_sh, _ = jax.jit(disc_loss)(s_sh, m_sh)
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-6)
