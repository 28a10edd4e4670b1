"""Multi-host scaffolding (parallel/multihost.py, SURVEY §5.8).

The real thing: TWO separate Python processes joined via
jax.distributed.initialize (gloo collectives on the CPU backend), each
owning 4 fake devices of an 8-device global mesh. Each host materializes
only its contiguous slice of the (identically seeded) global batch;
`jax.make_array_from_process_local_data` assembles the globally sharded
array, and an order-sensitive global reduction must equal the
single-process value exactly — proving the assembled array IS the global
batch, not a permutation of it.

Also unit-tests the host-side helpers in-process.
"""
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from ratio_guided_multimodal_fm_tpu.parallel.multihost import (
    process_batch_slice,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np, jax.numpy as jnp
    sys.path.insert(0, {repo!r})
    from ratio_guided_multimodal_fm_tpu.parallel.multihost import (
        maybe_init_distributed, process_batch_slice, make_global_array)

    assert maybe_init_distributed()    # env-driven (RGMF_*)
    devs = jax.devices()
    mesh = jax.sharding.Mesh(np.array(devs), ("data",))
    rng = np.random.RandomState(0)     # identical on every host
    batch = {{"x": rng.randn(16, 4).astype(np.float32)}}
    local = process_batch_slice(batch)
    assert local["x"].shape == (8, 4)  # 16 rows over 2 hosts
    gx = make_global_array(local["x"], mesh, "data")
    w = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    val = jax.jit(lambda a: jnp.vdot(a, w))(gx)   # order-sensitive
    print(f"RESULT {{jax.process_index()}} {{len(devs)}} "
          f"{{float(val):.6f}}", flush=True)
""")


def test_process_batch_slice_contiguous_blocks():
    b = {"x": np.arange(12).reshape(12, 1)}
    s0 = process_batch_slice(b, 0, 3)["x"]
    s2 = process_batch_slice(b, 2, 3)["x"]
    np.testing.assert_array_equal(s0[:, 0], [0, 1, 2, 3])
    np.testing.assert_array_equal(s2[:, 0], [8, 9, 10, 11])
    assert process_batch_slice(b, 0, 1)["x"] is b["x"]   # single-process


def test_process_batch_slice_requires_divisibility():
    with pytest.raises(ValueError, match="not divisible"):
        process_batch_slice({"x": np.zeros((10, 2))}, 0, 3)


@pytest.mark.multiprocess
def test_two_process_global_batch_assembly(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=REPO))
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

    rng = np.random.RandomState(0)
    x = rng.randn(16, 4).astype(np.float32)
    expect = float(
        (x * np.arange(64, dtype=np.float32).reshape(16, 4)).sum())

    results = {}
    for o in outs:
        lines = [l for l in o.splitlines() if l.startswith("RESULT")]
        assert lines, f"worker produced no RESULT:\n{o[-2000:]}"
        _, pi, ndev, val = lines[0].split()
        results[int(pi)] = (int(ndev), float(val))
    assert set(results) == {0, 1}
    for pi, (ndev, val) in results.items():
        assert ndev == 8                      # global device view
        assert val == pytest.approx(expect, rel=1e-5)
