"""Preemption-safe training (train/preemption.py + loop.py, SURVEY §5.3):
a preempted run saves a step-granular resumable checkpoint, and resuming
reproduces the uninterrupted run's parameters bit-for-bit (per-epoch
seeded loaders make the mid-epoch skip exact)."""
import os
import signal

import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.core.prng import RNG
from ratio_guided_multimodal_fm_tpu.models.unet import FlexibleUNet
from ratio_guided_multimodal_fm_tpu.train.checkpoint import load_checkpoint
from ratio_guided_multimodal_fm_tpu.train.loop import (
    train_flow_matching_epochs,
)
from ratio_guided_multimodal_fm_tpu.train.preemption import (
    PreemptionGuard,
    request_preemption,
)
from ratio_guided_multimodal_fm_tpu.train.steps import (
    create_fm_state,
    make_fm_train_step,
)

H = 8
N_BATCHES = 4


def _data_iter_fn(epoch):
    rng = np.random.RandomState(100 + epoch)   # per-epoch seeded, like
    for _ in range(N_BATCHES):                 # _EpochLoader
        yield jnp.asarray(rng.randn(8, H, H, 1).astype(np.float32))


def _fresh():
    fm = FlexibleUNet(in_channels=1, img_size=H, model_channels=8,
                      channel_mult=(1, 2), num_res_blocks=1)
    state = create_fm_state(fm, jax.random.PRNGKey(0), (H, H, 1), lr=1e-3)
    return state, make_fm_train_step(fm)


def test_guard_restores_handlers():
    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as g:
        assert not g.preempted
        request_preemption()
        assert g.preempted
    assert signal.getsignal(signal.SIGTERM) is before


def test_preempt_saves_and_resume_matches_uninterrupted(tmp_path):
    ck = str(tmp_path / "preempt")

    # uninterrupted reference run: 3 epochs
    state_ref, _, _ = train_flow_matching_epochs(
        _fresh()[0], _fresh()[1], _data_iter_fn, 3, RNG(7),
        log_fn=lambda *_: None)

    # run that gets preempted mid-epoch-1 (after 2 steps of epoch index 1)
    state, step = _fresh()
    count = {"n": 0}

    def counting_step(st, x1, key):
        count["n"] += 1
        if count["n"] == N_BATCHES + 2:        # epoch 1, step 2
            request_preemption()
        return step(st, x1, key)

    state_p, _, hist = train_flow_matching_epochs(
        state, counting_step, _data_iter_fn, 3, RNG(7),
        preempt_path=ck, log_fn=lambda *_: None)
    assert hist[-1]["preempted"] and hist[-1]["preempted_at_step"] == 2
    assert os.path.isdir(ck)

    saved = load_checkpoint(ck)
    assert int(saved["epoch"]) == 1 and int(saved["step"]) == 2

    # resume: fresh state/opt restored from the checkpoint, mid-epoch skip
    state_r, _ = _fresh()
    restored = load_checkpoint(ck, target={
        "params": state_r.params, "opt_state": state_r.opt_state,
        "epoch": 0, "step": 0})
    state_r = state_r.replace(params=restored["params"],
                              opt_state=restored["opt_state"])
    # per-step keys are position-addressed fold_ins, so a fresh RNG with
    # the same seed aligns automatically
    state_r, _, _ = train_flow_matching_epochs(
        state_r, step, _data_iter_fn, 3, RNG(7),
        start_epoch=1, start_step=2, log_fn=lambda *_: None)

    for a, b in zip(jax.tree_util.tree_leaves(state_ref.params),
                    jax.tree_util.tree_leaves(state_r.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
