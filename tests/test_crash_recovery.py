"""Hard-crash (SIGKILL) recovery — the failure mode preemption can't cover.

tests/test_preemption.py proves the SIGTERM path (step-granular save in
the grace window). A SIGKILL/power-loss leaves NO grace window: recovery
must come from the periodic checkpoints the epoch driver already writes
(train/loop.py save_periodic_fn; the reference's own every-N-epochs
policy, train_flow.py:84-117). This test proves that story end-to-end
with real processes:

1. a victim process trains with per-epoch full-dict checkpoints and is
   SIGKILLed mid-run (no handler, no flush — the kernel just removes it);
2. the surviving checkpoint LOADS cleanly (Orbax writes are atomic:
   tmp-dir + rename, so a kill between epochs can't leave a torn tree
   where the final directory exists);
3. a resume process restores {params, opt_state, epoch} and continues —
   and because per-step train keys are position-addressed
   (fold_in(root, epoch, step)) and epoch batch order derives from the
   epoch index, the resumed run's final parameters are BIT-EQUAL to an
   uninterrupted control run's.
"""
import os
import signal
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMMON = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})

    import numpy as np
    import jax.numpy as jnp
    from ratio_guided_multimodal_fm_tpu.core.prng import RNG
    from ratio_guided_multimodal_fm_tpu.models.unet import FlexibleUNet
    from ratio_guided_multimodal_fm_tpu.train.loop import train_epochs
    from ratio_guided_multimodal_fm_tpu.train.steps import (
        create_fm_state, make_fm_train_step)
    from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
        load_checkpoint, save_checkpoint)

    H, N_BATCHES, BATCH, EPOCHS = 8, 3, 32, 4

    def data_iter(epoch):
        rng = np.random.RandomState(100 + epoch)
        for _ in range(N_BATCHES):
            yield jnp.asarray(rng.randn(BATCH, H, H, 1).astype(np.float32))

    def fresh():
        fm = FlexibleUNet(in_channels=1, img_size=H, model_channels=8,
                          channel_mult=(1, 2), num_res_blocks=1)
        state = create_fm_state(fm, jax.random.PRNGKey(0), (H, H, 1),
                                lr=1e-3)
        return state, make_fm_train_step(fm, donate=False)

    def dump_params(state, path):
        leaves = jax.tree_util.tree_leaves(state.params)
        np.savez(path, *[np.asarray(l) for l in leaves])
""")

CONTROL_TAIL = textwrap.dedent("""
    state, step = fresh()
    state, best, hist = train_epochs(
        state, step, data_iter, EPOCHS, RNG(5), patience=100)
    assert len(hist) == EPOCHS
    dump_params(state, sys.argv[1])
    print("CONTROL_DONE", flush=True)
""")

VICTIM_TAIL = textwrap.dedent("""
    ckpt_dir = sys.argv[1]
    state, step = fresh()

    def save_periodic(s, epoch, best):
        tree = {"params": s.params, "opt_state": s.opt_state,
                "epoch": epoch, "best_loss": best}
        save_checkpoint(f"{ckpt_dir}/ckpt_ep{epoch}", tree)
        print(f"SAVED {epoch}", flush=True)

    train_epochs(state, step, data_iter, EPOCHS, RNG(5), patience=100,
                 save_periodic_fn=save_periodic, save_every=1)
    print("VICTIM_FINISHED", flush=True)   # must not be reached
""")

RESUME_TAIL = textwrap.dedent("""
    ckpt_dir, out_path = sys.argv[1], sys.argv[2]
    state, step = fresh()
    raw = load_checkpoint(f"{ckpt_dir}/ckpt_ep2")
    target = dict(raw)
    target["params"] = state.params
    target["opt_state"] = state.opt_state
    restored = load_checkpoint(f"{ckpt_dir}/ckpt_ep2", target=target)
    state = state.replace(params=restored["params"],
                          opt_state=restored["opt_state"])
    completed = int(raw["epoch"])          # epochs fully done pre-crash
    assert completed == 2
    state, best, hist = train_epochs(
        state, step, data_iter, EPOCHS, RNG(5), patience=100,
        start_epoch=completed, start_best=float(raw["best_loss"]))
    assert len(hist) == EPOCHS - completed
    dump_params(state, out_path)
    print("RESUME_DONE", flush=True)
""")


def _run(tail, args, timeout=240):
    script = COMMON.format(repo=REPO) + tail
    return subprocess.run(
        [sys.executable, "-c", script, *map(str, args)],
        capture_output=True, text=True, timeout=timeout,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})


@pytest.mark.multiprocess
@pytest.mark.slow
def test_sigkill_recovery_matches_uninterrupted(tmp_path):
    # 1. Control: uninterrupted 4-epoch run.
    ctrl = _run(CONTROL_TAIL, [tmp_path / "control.npz"])
    assert ctrl.returncode == 0, ctrl.stderr[-2000:]
    assert "CONTROL_DONE" in ctrl.stdout

    # 2. Victim: SIGKILL as soon as the epoch-2 checkpoint is durable.
    ckpt_dir = tmp_path / "ckpts"
    ckpt_dir.mkdir()
    script = COMMON.format(repo=REPO) + VICTIM_TAIL
    proc = subprocess.Popen(
        [sys.executable, "-c", script, str(ckpt_dir)],
        stdout=subprocess.PIPE, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    killed = False
    try:
        for line in proc.stdout:
            if line.strip() == "SAVED 2":
                proc.send_signal(signal.SIGKILL)   # no grace window
                killed = True
                break
            assert "VICTIM_FINISHED" not in line
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert killed, "victim finished before the kill point"
    assert proc.returncode == -signal.SIGKILL

    # 3. The surviving checkpoint is complete and loadable, and a resumed
    #    run reproduces the uninterrupted run bit-for-bit.
    assert (ckpt_dir / "ckpt_ep2").is_dir()
    res = _run(RESUME_TAIL, [ckpt_dir, tmp_path / "resumed.npz"])
    assert res.returncode == 0, res.stderr[-2000:]
    assert "RESUME_DONE" in res.stdout

    ctrl_leaves = np.load(tmp_path / "control.npz")
    res_leaves = np.load(tmp_path / "resumed.npz")
    assert list(ctrl_leaves.files) == list(res_leaves.files)
    for name in ctrl_leaves.files:
        np.testing.assert_array_equal(ctrl_leaves[name], res_leaves[name])
