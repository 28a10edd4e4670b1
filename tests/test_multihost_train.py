"""Multi-host DP TRAINING (cli/common.multihost_adapt, SURVEY §5.8): two
separate processes joined via jax.distributed (gloo CPU collectives) run
the SAME train_epochs wiring the CLIs use — state replicated over the
global mesh, batches sharded over 'data', XLA all-reducing grads across
the process boundary — on a tiny FlexibleUNet (the full 901K CLI model
compiles for minutes under SPMD partitioning on the CPU backend; the
wiring under test is identical).

Asserts:
* both processes report the SAME losses (replicated state ⇒ replicated
  metrics, bit-equal);
* they match a single-process control run over the identical global
  batches (up to cross-device reduction order);
* the checkpoint write lands once: EVERY process calls save and Orbax
  coordinates the multi-process write internally (a process-0-only gate
  deadlocks its barrier — see train/checkpoint.py); restored params
  match the control run's.
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

H = 8
N_BATCHES = 3
BATCH = 32
EPOCHS = 2

COMMON = textwrap.dedent("""
    import numpy as np
    import jax, jax.numpy as jnp
    from ratio_guided_multimodal_fm_tpu.core.prng import RNG
    from ratio_guided_multimodal_fm_tpu.models.unet import FlexibleUNet
    from ratio_guided_multimodal_fm_tpu.train.loop import train_epochs
    from ratio_guided_multimodal_fm_tpu.train.steps import (
        create_fm_state, make_fm_train_step)

    H, N_BATCHES, BATCH, EPOCHS = {h}, {nb}, {bs}, {ep}

    def data_iter(epoch):
        rng = np.random.RandomState(100 + epoch)   # identical on all procs
        for _ in range(N_BATCHES):
            yield rng.randn(BATCH, H, H, 1).astype(np.float32)

    def fresh():
        fm = FlexibleUNet(in_channels=1, img_size=H, model_channels=8,
                          channel_mult=(1, 2), num_res_blocks=1)
        state = create_fm_state(fm, jax.random.PRNGKey(0), (H, H, 1),
                                lr=1e-3)
        return state, make_fm_train_step(fm)
""")

HEADER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
""")

PREEMPT_WORKER_TAIL = textwrap.dedent("""
    from ratio_guided_multimodal_fm_tpu.cli.common import multihost_adapt
    from ratio_guided_multimodal_fm_tpu.parallel.multihost import (
        maybe_init_distributed)
    from ratio_guided_multimodal_fm_tpu.train.loop import train_epochs
    from ratio_guided_multimodal_fm_tpu.train.preemption import (
        request_preemption)

    assert maybe_init_distributed()
    state, step = fresh()
    count = {{"n": 0}}

    def counting(s, x, k):
        count["n"] += 1
        if jax.process_index() == 1 and count["n"] == 2:
            request_preemption()       # the "SIGTERM" hits ONLY process 1
        return step(s, x, k)

    state, step2, extract = multihost_adapt(state, counting, jnp.asarray)

    def di(e, skip=0):
        return map(extract, list(data_iter(e))[skip:])

    _, _, hist = train_epochs(state, step2, di, EPOCHS, RNG(7),
                              preempt_path={ckpt!r},
                              log_fn=lambda *_: None)
    rec = hist[-1]
    print(f"PREEMPT {{jax.process_index()}} "
          f"{{rec.get('preempted_at_step')}} {{rec.get('epoch')}}",
          flush=True)
""")

WORKER = HEADER + COMMON + textwrap.dedent("""
    from ratio_guided_multimodal_fm_tpu.cli.common import multihost_adapt
    from ratio_guided_multimodal_fm_tpu.parallel.multihost import (
        maybe_init_distributed)
    from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
        save_checkpoint, wait_for_saves)

    assert maybe_init_distributed()
    state, step = fresh()
    state, step2, extract = multihost_adapt(
        state, lambda s, x, k: step(s, x, k), jnp.asarray)

    losses = []
    state, best, hist = train_epochs(
        state, step2,
        lambda e: map(extract, data_iter(e)),
        EPOCHS, RNG(7), log_fn=lambda *_: None)
    # EVERY process calls save (Orbax coordinates the multi-process
    # write; a process-0-only gate deadlocks its internal barrier).
    save_checkpoint({ckpt!r}, state.params)
    wait_for_saves()
    for hrec in hist:
        print(f"LOSS {{jax.process_index()}} {{hrec['epoch']}} "
              f"{{hrec['loss']:.10f}}", flush=True)
""")


def _control():
    """Single-process control over the identical global batches."""
    ns = {}
    exec(COMMON.format(h=H, nb=N_BATCHES, bs=BATCH, ep=EPOCHS), ns)
    from ratio_guided_multimodal_fm_tpu.core.prng import RNG
    from ratio_guided_multimodal_fm_tpu.train.loop import train_epochs

    state, step = ns["fresh"]()
    state, _, hist = train_epochs(
        state, lambda s, x, k: step(s, jnp.asarray(x), k),
        ns["data_iter"], EPOCHS, RNG(7), log_fn=lambda *_: None)
    return state, {h["epoch"]: h["loss"] for h in hist}


@pytest.mark.multiprocess
def test_two_process_dp_training(tmp_path):
    ck = str(tmp_path / "mh_ckpt")
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=REPO, ckpt=ck,
                                    h=H, nb=N_BATCHES, bs=BATCH, ep=EPOCHS))
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
        pytest.fail("2-process training timed out:\n"
                    + "\n----\n".join(o[-2000:] for o in outs))

    losses = {}          # (process, epoch) -> loss
    for o in outs:
        lines = [l for l in o.splitlines() if l.startswith("LOSS")]
        assert len(lines) == EPOCHS, f"worker output:\n{o[-3000:]}"
        for l in lines:
            _, pi, e, v = l.split()
            losses[(int(pi), int(e))] = float(v)

    state_ctrl, hist_ctrl = _control()
    for e in range(1, EPOCHS + 1):
        assert losses[(0, e)] == losses[(1, e)]          # replicated
        assert losses[(0, e)] == pytest.approx(hist_ctrl[e], rel=2e-4)

    # the coordinated multi-process write landed; params == control
    assert os.path.isdir(ck)
    from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
        load_checkpoint,
    )
    a = jax.tree_util.tree_leaves(load_checkpoint(ck))
    b = jax.tree_util.tree_leaves(state_ctrl.params)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        # atol covers near-zero leaves (zero-init biases at ~1e-5 after a
        # few Adam steps) where the cross-process grad-reduction order
        # noise is amplified by Adam's normalizer.
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-3, atol=5e-5)


@pytest.mark.multiprocess
def test_two_process_skewed_preemption_agrees(tmp_path):
    """The preemption 'signal' reaches ONLY process 1: without cross-
    process agreement, process 1 would enter the collective Orbax save
    while process 0 launches the next SPMD step — a permanent distributed
    deadlock. With the per-step flag all-gather both processes must stop
    at the SAME step and the coordinated preempt checkpoint must land."""
    ck = str(tmp_path / "mh_preempt")
    worker = tmp_path / "worker.py"
    worker.write_text(
        (HEADER + COMMON + PREEMPT_WORKER_TAIL).format(
            repo=REPO, ckpt=ck, h=H, nb=N_BATCHES, bs=BATCH, ep=EPOCHS))
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
        pytest.fail("skewed preemption deadlocked:\n"
                    + "\n----\n".join(o[-2000:] for o in outs))

    stops = {}
    for o in outs:
        lines = [l for l in o.splitlines() if l.startswith("PREEMPT")]
        assert lines, f"worker output:\n{o[-3000:]}"
        _, pi, at_step, epoch = lines[0].split()
        stops[int(pi)] = (at_step, epoch)
    assert stops[0] == stops[1] == ("2", "1")   # same step on BOTH
    assert os.path.isdir(ck)                    # coordinated save landed
    from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
        load_checkpoint,
    )
    saved = load_checkpoint(ck)
    assert int(saved["step"]) == 2 and int(saved["epoch"]) == 0


EMA_WORKER = HEADER + COMMON + textwrap.dedent("""
    from ratio_guided_multimodal_fm_tpu.cli.common import multihost_adapt
    from ratio_guided_multimodal_fm_tpu.parallel.multihost import (
        maybe_init_distributed)
    from ratio_guided_multimodal_fm_tpu.models.unet import FlexibleUNet
    from ratio_guided_multimodal_fm_tpu.train.steps import (
        create_fm_state, make_fm_train_step)

    assert maybe_init_distributed()
    fm = FlexibleUNet(in_channels=1, img_size=H, model_channels=8,
                      channel_mult=(1, 2), num_res_blocks=1)
    state = create_fm_state(fm, jax.random.PRNGKey(0), (H, H, 1),
                            lr=1e-3, ema_decay=0.9)
    step = make_fm_train_step(fm, ema_decay=0.9)
    state, step2, extract = multihost_adapt(
        state, lambda s, x, k: step(s, x, k), jnp.asarray)
    state, best, hist = train_epochs(
        state, step2, lambda e: map(extract, data_iter(e)),
        EPOCHS, RNG(7), log_fn=lambda *_: None)
    fp_ema = float(sum(float(jnp.sum(l))
                   for l in jax.tree_util.tree_leaves(state.ema_params)))
    fp_par = float(sum(float(jnp.sum(l))
                   for l in jax.tree_util.tree_leaves(state.params)))
    print(f"EMAFP {{jax.process_index()}} {{fp_ema:.10f}} {{fp_par:.10f}}",
          flush=True)
""")


@pytest.mark.multiprocess
def test_two_process_ema_training(tmp_path):
    """Regression for multihost_adapt dropping ema_params: before the fix,
    --ema_decay under 2 processes mixed a process-local ema tree into the
    global SPMD step (jit incompatible-devices crash). The run must
    complete and both processes must hold the SAME (replicated) EMA."""
    worker = tmp_path / "ema_worker.py"
    worker.write_text(EMA_WORKER.format(repo=REPO, h=H, nb=N_BATCHES,
                                        bs=BATCH, ep=EPOCHS))
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
        pytest.fail("2-process EMA training timed out:\n"
                    + "\n----\n".join(o[-2000:] for o in outs))

    fps = {}
    for o in outs:
        lines = [l for l in o.splitlines() if l.startswith("EMAFP")]
        assert len(lines) == 1, f"worker output:\n{o[-3000:]}"
        _, pi, ema, par = lines[0].split()
        fps[int(pi)] = (float(ema), float(par))
    assert fps[0] == fps[1]                    # replicated EMA + params
    assert fps[0][0] != fps[0][1]              # EMA lags the raw params
