"""Round-3 correctness guards (advisor r2 + VERDICT r2 §weak):

* use_pallas=True with a sharded MC axis must fail loudly (the kernel has
  no global reductions — silently wrong guidance otherwise).
* The flash kernel's tiles keep the lane dim 128-aligned and refuse
  feature dims that cannot fit VMEM (64×64 RGB+gray used to pick TN=32 and
  die in Mosaic).
* exp(log r̂) stays f32-finite for saturated discriminators (used to
  overflow to +inf and NaN the Pallas path silently).
* Sharded diagnostics (w_min/w_max) reduce over the full MC axis, so
  sharded and unsharded runs report identical numbers.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ratio_guided_multimodal_fm_tpu.ops.guidance_pallas import (
    _auto_tiles,
    flash_guidance,
    flash_guidance_fits,
)
from ratio_guided_multimodal_fm_tpu.parallel.mesh import make_mesh
from ratio_guided_multimodal_fm_tpu.sample.guided import (
    GuidedSamplerConfig,
    _resolve_pallas,
    mc_feng_guidance,
    safe_exp_log_r,
)


def test_resolve_pallas_rejects_sharded_mc_axis():
    cfg = GuidedSamplerConfig(guidance_method="mc_feng", use_pallas=True)
    with pytest.raises(ValueError, match="local shard"):
        _resolve_pallas(cfg, mc_axis="mc")
    # 'auto' falls back instead of raising
    cfg_auto = GuidedSamplerConfig(guidance_method="mc_feng",
                                   use_pallas="auto")
    assert _resolve_pallas(cfg_auto, mc_axis="mc") is False


def test_auto_tiles_lane_alignment():
    # 64×64 RGB + 64×64 gray pair: row = 4·(12288+4096) bytes — used to
    # yield TN=32 (not 128-aligned)
    for row_bytes in (4 * 4096, 4 * 16384, 4 * 65536):
        tb, tn = _auto_tiles(row_bytes)
        assert tn >= 128 and tn % 128 == 0
        assert tb >= 8


def test_flash_guidance_fits_boundary():
    assert flash_guidance_fits(32 * 32 * 1, 32 * 32 * 3)      # exp-2 shapes
    assert not flash_guidance_fits(64 * 64 * 3, 64 * 64 * 1)  # stretch64


def test_flash_guidance_raises_on_oversized_features():
    B, N = 2, 4
    x_t = jnp.zeros((B, 64, 64, 3))
    y_t = jnp.zeros((B, 64, 64, 1))
    with pytest.raises(ValueError, match="VMEM"):
        flash_guidance(x_t, y_t, jnp.zeros((N, 64, 64, 3)),
                       jnp.zeros((N, 64, 64, 1)), jnp.zeros(N),
                       jnp.float32(0.5), interpret=True)


def test_safe_exp_log_r_finite_at_saturation():
    log_r = jnp.array([-500.0, 0.0, 100.0, 500.0])
    r = safe_exp_log_r(log_r)
    assert bool(jnp.all(jnp.isfinite(r)))
    # and the round-trip log the Pallas path takes stays finite too
    assert bool(jnp.all(jnp.isfinite(jnp.log(jnp.maximum(r, 1e-30)))))


def test_generate_mc_set_ratios_finite_for_saturated_ratio():
    from ratio_guided_multimodal_fm_tpu.sample.guided import generate_mc_set

    fm = lambda x, t: -x                               # noqa: E731
    log_ratio = lambda x, y: 300.0 * jnp.sum(          # noqa: E731
        x.reshape(x.shape[0], -1), axis=1)
    mc_x, mc_y, r = generate_mc_set(fm, fm, log_ratio,
                                    jax.random.PRNGKey(0), 8, (4, 4, 1),
                                    (4, 4, 1), num_steps=2)
    assert bool(jnp.all(jnp.isfinite(r)))


def test_sharded_diag_extrema_match_unsharded():
    rng = np.random.RandomState(0)
    B, N, H = 4, 16, 6
    x_t = jnp.array(rng.randn(B, H, H, 1).astype(np.float32))
    y_t = jnp.array(rng.randn(B, H, H, 1).astype(np.float32))
    mc_x = jnp.array(rng.randn(N, H, H, 1).astype(np.float32))
    mc_y = jnp.array(rng.randn(N, H, H, 1).astype(np.float32))
    mc_r = jnp.array(np.exp(rng.randn(N)).astype(np.float32))
    t = jnp.float32(0.5)

    _, _, diag_ref = mc_feng_guidance(x_t, y_t, mc_x, mc_y, mc_r, t)

    mesh = make_mesh(8, ("mc",))

    def f(x_t, y_t, mx, my, mr):
        _, _, d = mc_feng_guidance(x_t, y_t, mx, my, mr, t, mc_axis="mc")
        return d["w_min"], d["w_max"]

    w_min, w_max = jax.jit(shard_map(
        f, mesh=mesh, in_specs=(P(), P(), P("mc"), P("mc"), P("mc")),
        out_specs=(P(), P())))(x_t, y_t, mc_x, mc_y, mc_r)
    np.testing.assert_allclose(float(w_min), float(diag_ref["w_min"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(w_max), float(diag_ref["w_max"]),
                               rtol=1e-5)
