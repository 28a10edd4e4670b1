"""Verify drive: the ODE-solver feature end-to-end on the real TPU.

Mirror of tests/test_integration_e2e.py at H=16/ch=16 (the verify-skill
smoke recipe), extended with the new `solver` knob: trains tiny flows + a
tiny ratio net on procedural blob pairs, then compares guided coherence for
euler-100 / midpoint-50 / midpoint-25 / euler-25 and runs unguided heun.
Expected: guided >> unguided at every solver, midpoint-25 ≈ euler-100
(the 2nd-order claim), and heun runs finite.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/verify_solver_smoke.py
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.models import (
    FlexibleRatioEstimator,
    FlexibleUNet,
)
from ratio_guided_multimodal_fm_tpu.sample.guided import (
    GuidedSamplerConfig,
    make_guided_sampler,
)
from ratio_guided_multimodal_fm_tpu.train.steps import (
    create_fm_state,
    create_ratio_state,
    make_fm_train_step,
    make_ratio_train_step,
)

H = 16


def _make_batch(rng, n):
    cls = rng.randint(0, 2, n)
    base = np.full((n, H, H, 1), -0.6, np.float32)
    for i, c in enumerate(cls):
        if c == 0:
            base[i, 2:7, 2:7, 0] = 1.0
        else:
            base[i, 9:14, 9:14, 0] = 1.0
    base += rng.randn(n, H, H, 1).astype(np.float32) * 0.08
    ys = np.rot90(base, k=-1, axes=(1, 2)).copy()
    return base, ys, cls


def _blob_class(im, rot=False):
    im = np.asarray(im)[..., 0]
    if rot:
        im = np.rot90(im, k=1, axes=(1, 2))
    tl = im[:, 2:7, 2:7].sum(axis=(1, 2))
    br = im[:, 9:14, 9:14].sum(axis=(1, 2))
    return (br > tl).astype(int)


def main():
    rng = np.random.RandomState(0)
    model = FlexibleUNet(in_channels=1, img_size=H, model_channels=16,
                         channel_mult=(1, 2), num_res_blocks=1, dropout=0.0)
    sx = create_fm_state(model, jax.random.PRNGKey(1), (H, H, 1), lr=2e-3)
    sy = create_fm_state(model, jax.random.PRNGKey(2), (H, H, 1), lr=2e-3)
    fstep = make_fm_train_step(model, donate=False)

    t0 = time.perf_counter()
    for i in range(80):
        x, y, _ = _make_batch(rng, 64)
        sx, lx = fstep(sx, jnp.array(x), jax.random.PRNGKey(100 + i))
        sy, ly = fstep(sy, jnp.array(y), jax.random.PRNGKey(200 + i))
    print(f"FM trained 80 steps in {time.perf_counter()-t0:.1f}s, "
          f"final losses {float(jnp.asarray(lx).ravel()[0]):.3f}/"
          f"{float(jnp.asarray(ly).ravel()[0]):.3f}")

    ratio = FlexibleRatioEstimator(x_channels=1, y_channels=1,
                                   feature_dim=32, hidden_dim=64)
    rs = create_ratio_state(ratio, jax.random.PRNGKey(3), (H, H, 1),
                            (H, H, 1), lr=3e-3)
    rstep = make_ratio_train_step(ratio, "disc", donate=False)
    for i in range(60):
        x, y, cls = _make_batch(rng, 64)
        flip = rng.rand(64) < 0.5
        perm = rng.permutation(64)
        y_fake = y[perm]
        is_real = np.where(flip, (cls == cls[perm]).astype(np.float32), 1.0)
        yy = np.where(flip[:, None, None, None], y_fake, y)
        rs, rm = rstep(rs, jnp.array(x), jnp.array(yy),
                       jnp.array(is_real), jax.random.PRNGKey(300 + i))
    print(f"ratio trained: acc_real={float(rm['acc_real']):.2f} "
          f"acc_fake={float(rm['acc_fake']):.2f}")

    fm_x = lambda xt, t: model.apply({"params": sx.params}, xt, t)
    fm_y = lambda yt, t: model.apply({"params": sy.params}, yt, t)
    log_ratio = lambda a, b: ratio.apply({"params": rs.params}, a, b,
                                         method=ratio.log_ratio)

    def run(method, strength, solver, steps):
        cfg = GuidedSamplerConfig(method, strength, num_steps=steps,
                                  mc_batch_size=64, x_shape=(H, H, 1),
                                  y_shape=(H, H, 1), solver=solver)
        sampler = jax.jit(make_guided_sampler(fm_x, fm_y, cfg, log_ratio),
                          static_argnums=(1,))
        x1, y1, _ = sampler(jax.random.PRNGKey(9), 96)
        x1 = np.asarray(x1)  # host readback = real barrier on axon
        assert np.isfinite(x1).all() and np.isfinite(np.asarray(y1)).all(), \
            f"non-finite output: {method}/{solver}/{steps}"
        coh = float((_blob_class(x1) == _blob_class(y1, rot=True)).mean())
        print(f"  {method:8s} gamma={strength:<4} {solver:9s} "
              f"steps={steps:<4d} coherence={coh:.3f}")
        return coh

    print("sampling (each line = fresh jit compile):")
    results = {
        "unguided_euler100": run("none", 0.0, "euler", 100),
        "guided_euler100": run("mc_feng", 1.0, "euler", 100),
        "guided_euler25": run("mc_feng", 1.0, "euler", 25),
        "guided_midpoint50": run("mc_feng", 1.0, "midpoint", 50),
        "guided_midpoint25": run("mc_feng", 1.0, "midpoint", 25),
        "unguided_heun25": run("none", 0.0, "heun", 25),
    }

    ok = (results["guided_euler100"] > results["unguided_euler100"] + 0.1
          and results["guided_midpoint25"]
              >= results["guided_euler100"] - 0.08)
    results["ok"] = bool(ok)
    print(json.dumps(results))
    if not ok:
        raise SystemExit("solver smoke FAILED")
    print("SOLVER SMOKE OK")


if __name__ == "__main__":
    main()
