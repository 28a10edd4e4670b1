"""Multi-host guided sampling (parallel/sharded_guidance.py over a mesh
that SPANS processes — SURVEY §5.8).

Two separate Python processes join via jax.distributed.initialize (gloo
CPU collectives), each contributing 4 fake devices to one 8-device global
mesh. The distributed mc_feng sampler runs over ('data','mc') layouts
including one where the 'mc' axis PAIRS A DEVICE FROM EACH PROCESS — so
the guidance-weight reductions (pmax row-max, psum Z̄/p̄/Σw·X1) are real
cross-process collectives, not intra-host shuffles. Every process must
report the same order-sensitive readback of the global samples, equal to
the single-process single-device sampler's (same-key RNG discipline).
"""
import os
import socket
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Toy setup mirrored from tests/test_distributed_sampler.py — velocity
# fields and log-ratio are parameter-free pure functions so both sides of
# the comparison are exactly the same math.
NUM_STEPS = 10
MC_BATCH = 16
NUM_SAMPLES = 8
SHAPE = (6, 6, 1)

WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np, jax.numpy as jnp
    sys.path.insert(0, {repo!r})
    from ratio_guided_multimodal_fm_tpu.parallel.multihost import (
        maybe_init_distributed)
    from ratio_guided_multimodal_fm_tpu.parallel.sharded_guidance import (
        make_distributed_guided_sampler)
    from ratio_guided_multimodal_fm_tpu.sample.guided import (
        GuidedSamplerConfig)

    assert maybe_init_distributed()
    devs = jax.devices()
    assert len(devs) == 8 and jax.process_count() == 2

    fm = lambda x, t: -0.1 * x
    log_ratio = lambda x, y: -5.0 * jnp.mean(
        (x.reshape(x.shape[0], -1) - y.reshape(y.shape[0], -1)) ** 2,
        axis=1)
    cfg = GuidedSamplerConfig(
        guidance_method="mc_feng", guidance_strength=0.8,
        num_steps={num_steps}, mc_batch_size={mc_batch},
        x_shape={shape!r}, y_shape={shape!r})

    # Layout 'row': contiguous reshape — both mc partners live on the
    # same process. Layout 'span': transpose pairs device i (process 0)
    # with device 4+i (process 1) on the mc axis, so every guidance psum/
    # pmax crosses the process boundary.
    grids = dict(
        row=np.array(devs).reshape(4, 2),
        span=np.array(devs).reshape(2, 4).T,
    )
    w_x = jnp.arange({num_samples} * 36, dtype=jnp.float32).reshape(
        ({num_samples},) + {shape!r})
    vals = []
    for name in ("row", "span"):
        mesh = jax.sharding.Mesh(grids[name], ("data", "mc"))
        sampler = make_distributed_guided_sampler(
            fm, fm, cfg, log_ratio, mesh)
        x1, y1 = sampler(jax.random.PRNGKey(3), {num_samples})
        rd = jax.jit(lambda a, b: (jnp.vdot(a, w_x), jnp.vdot(b, w_x)))
        vx, vy = rd(x1, y1)
        vals.append((name, float(vx), float(vy)))
    for name, vx, vy in vals:
        print(f"RESULT {{jax.process_index()}} {{name}} "
              f"{{vx:.6f}} {{vy:.6f}}", flush=True)
""")


def _single_device_readback():
    from ratio_guided_multimodal_fm_tpu.sample.guided import (
        GuidedSamplerConfig,
        make_guided_sampler,
    )

    fm = lambda x, t: -0.1 * x          # noqa: E731
    log_ratio = lambda x, y: -5.0 * jnp.mean(   # noqa: E731
        (x.reshape(x.shape[0], -1) - y.reshape(y.shape[0], -1)) ** 2,
        axis=1)
    cfg = GuidedSamplerConfig(
        guidance_method="mc_feng", guidance_strength=0.8,
        num_steps=NUM_STEPS, mc_batch_size=MC_BATCH,
        x_shape=SHAPE, y_shape=SHAPE)
    single = jax.jit(make_guided_sampler(fm, fm, cfg, log_ratio),
                     static_argnums=(1,))
    sx, sy, _ = single(jax.random.PRNGKey(3), NUM_SAMPLES)
    w = jnp.arange(NUM_SAMPLES * 36, dtype=jnp.float32).reshape(
        (NUM_SAMPLES,) + SHAPE)
    return float(jnp.vdot(sx, w)), float(jnp.vdot(sy, w))


@pytest.mark.multiprocess
def test_two_process_mc_sharded_guidance(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(
        repo=REPO, num_steps=NUM_STEPS, mc_batch=MC_BATCH,
        num_samples=NUM_SAMPLES, shape=SHAPE))
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "RGMF_COORDINATOR": f"127.0.0.1:{port}",
            "RGMF_NUM_PROCESSES": "2",
            "RGMF_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    try:
        outs = [p.communicate(timeout=600)[0] for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        outs = [p.communicate()[0] for p in procs]
        pytest.fail("2-process run timed out:\n" + "\n----\n".join(outs))

    expect_x, expect_y = _single_device_readback()

    results = {}   # (process, layout) -> (vx, vy)
    for o in outs:
        lines = [l for l in o.splitlines() if l.startswith("RESULT")]
        assert len(lines) == 2, f"worker output:\n{o[-3000:]}"
        for l in lines:
            _, pi, name, vx, vy = l.split()
            results[(int(pi), name)] = (float(vx), float(vy))
    assert set(results) == {(0, "row"), (0, "span"), (1, "row"), (1, "span")}
    for (pi, name), (vx, vy) in results.items():
        # identical math, different reduction order: tight but not exact
        assert vx == pytest.approx(expect_x, rel=1e-4), (pi, name)
        assert vy == pytest.approx(expect_y, rel=1e-4), (pi, name)
