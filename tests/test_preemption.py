"""Preemption-safe training (train/preemption.py + loop.py, SURVEY §5.3):
a preempted run saves a step-granular resumable checkpoint, and resuming
reproduces the uninterrupted run's parameters bit-for-bit (per-epoch
seeded loaders make the mid-epoch skip exact)."""
import os
import signal

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
    # the outermost exit consumes the flag
    with PreemptionGuard() as g2:
        assert not g2.preempted


def test_guard_preserves_pending_preemption():
    """A SIGTERM that lands BEFORE the driver enters its guard (startup
    window covered by preemption.arm) must be honored at the first step,
    and a nested guard must not erase an outer guard's pending flag."""
    request_preemption()             # pre-entry signal (arm()-window case)
    with PreemptionGuard() as g:
        assert g.preempted           # not erased by __enter__
    with PreemptionGuard() as outer:
        request_preemption()
        with PreemptionGuard() as inner:
            assert inner.preempted
        assert outer.preempted       # inner exit didn't consume it


def test_preempt_saves_and_resume_matches_uninterrupted(tmp_path):
    ck = str(tmp_path / "preempt")

    # uninterrupted reference run: 3 epochs
    state_ref, _, hist_ref = train_flow_matching_epochs(
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
    from ratio_guided_multimodal_fm_tpu.train.loop import restore_preempt
    state_r, _ = _fresh()
    state_r, resume = restore_preempt(ck, state_r)
    assert (resume["start_epoch"], resume["start_step"]) == (1, 2)
    # per-step keys are position-addressed fold_ins, so a fresh RNG with
    # the same seed aligns automatically
    state_r, _, hist_r = train_flow_matching_epochs(
        state_r, step, _data_iter_fn, 3, RNG(7),
        log_fn=lambda *_: None, **resume)

    for a, b in zip(jax.tree_util.tree_leaves(state_ref.params),
                    jax.tree_util.tree_leaves(state_r.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Epoch-level OUTCOMES match too: the restart epoch's average covers
    # all N_BATCHES steps (pre-preempt sums carried in the checkpoint),
    # not just the post-resume ones — so best-checkpoint / early-stop
    # decisions can't diverge from the uninterrupted run.
    ref = {h["epoch"]: h["loss"] for h in hist_ref}
    res = {h["epoch"]: h["loss"] for h in hist_r}
    assert set(res) == {2, 3}                       # epochs 2,3 re-run
    for e in res:
        assert res[e] == pytest.approx(ref[e], rel=1e-6)


def test_preempt_on_last_step_keeps_epoch_summary(tmp_path):
    """Preempted on an epoch's LAST step: the resumed run starts with
    zero remaining steps in that epoch but must still produce its
    summary/best-save from the carried sums instead of silently dropping
    the fully-computed epoch."""
    ck = str(tmp_path / "preempt_last")

    state_ref, _, hist_ref = train_flow_matching_epochs(
        _fresh()[0], _fresh()[1], _data_iter_fn, 2, RNG(7),
        log_fn=lambda *_: None)

    state, step = _fresh()
    count = {"n": 0}

    def counting_step(st, x1, key):
        count["n"] += 1
        if count["n"] == N_BATCHES:          # epoch 0's last step
            request_preemption()
        return step(st, x1, key)

    _, _, hist = train_flow_matching_epochs(
        state, counting_step, _data_iter_fn, 2, RNG(7),
        preempt_path=ck, log_fn=lambda *_: None)
    assert hist[-1]["preempted_at_step"] == N_BATCHES

    from ratio_guided_multimodal_fm_tpu.train.loop import restore_preempt
    state_r, _ = _fresh()
    state_r, resume = restore_preempt(ck, state_r)
    assert resume["start_step"] == N_BATCHES
    state_r, _, hist_r = train_flow_matching_epochs(
        state_r, step, _data_iter_fn, 2, RNG(7),
        log_fn=lambda *_: None, **resume)

    ref = {h["epoch"]: h["loss"] for h in hist_ref}
    res = {h["epoch"]: h["loss"] for h in hist_r}
    assert set(res) == {1, 2}                # epoch 1's summary NOT dropped
    for e in res:
        assert res[e] == pytest.approx(ref[e], rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state_ref.params),
                    jax.tree_util.tree_leaves(state_r.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_epoch_loader_position_addressed():
    """_EpochLoader.epoch(e) must reproduce epoch e's batch order in a
    FRESH process (the real-CLI resume path; a stateful __iter__ counter
    starting at 0 would replay epoch 0's permutation instead)."""
    from ratio_guided_multimodal_fm_tpu.data.mnist_dataset import (
        get_flow_dataloader,
    )
    from ratio_guided_multimodal_fm_tpu.data.prefetch import PrefetchLoader

    mk = lambda: get_flow_dataloader(batch_size=64, train=True,  # noqa:E731
                                     root="./data", seed=5)
    a = mk()
    # advance the stateful counter like a prior process that ran 2 epochs
    for _ in range(2):
        for _b in a:
            break
    b = mk()   # fresh process
    xa = next(iter(a.epoch(2)))["x"]
    xb = next(iter(b.epoch(2)))["x"]
    np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
    # stateful __iter__ of the fresh loader (its epoch 0) must differ
    x0 = next(iter(b))["x"]
    assert not np.array_equal(np.asarray(xa), np.asarray(x0))
    # PrefetchLoader delegates position-addressing
    xp = next(iter(PrefetchLoader(mk()).epoch(2)))["x"]
    np.testing.assert_array_equal(np.asarray(xp), np.asarray(xa))


def test_generic_driver_ratio_preempt_resume(tmp_path):
    """train_epochs (the generic driver behind the ratio CLIs) preempts
    and resumes bit-exactly, including the BatchNorm batch_stats
    collection in the resumable checkpoint (restore_preempt round-trip)."""
    from ratio_guided_multimodal_fm_tpu.models import RatioEstimatorMNISTSVHN
    from ratio_guided_multimodal_fm_tpu.train.loop import (
        restore_preempt,
        train_epochs,
    )
    from ratio_guided_multimodal_fm_tpu.train.steps import (
        create_ratio_state,
        make_ratio_train_step,
    )

    ck = str(tmp_path / "preempt_ratio")

    def fresh():
        model = RatioEstimatorMNISTSVHN(feature_dim=16, hidden_dim=32)
        state = create_ratio_state(model, jax.random.PRNGKey(0),
                                   (32, 32, 1), (32, 32, 3),
                                   has_batch_stats=True)
        raw = make_ratio_train_step(model, "disc", has_batch_stats=True,
                                    donate=False)
        return state, lambda s, b, k: raw(s, b["x"], b["y"], b["is_real"], k)

    def data_iter(epoch):
        rng = np.random.RandomState(200 + epoch)
        for _ in range(N_BATCHES):
            yield {
                "x": jnp.asarray(rng.randn(8, 32, 32, 1).astype(np.float32)),
                "y": jnp.asarray(rng.randn(8, 32, 32, 3).astype(np.float32)),
                "is_real": jnp.asarray(
                    (rng.rand(8) < 0.5).astype(np.float32)),
            }

    state_ref, _, hist_ref = train_epochs(
        fresh()[0], fresh()[1], data_iter, 3, RNG(9),
        loss_key="loss", log_fn=lambda *_: None)
    assert "acc_real" in hist_ref[0]          # metrics flow into history

    state, step = fresh()
    count = {"n": 0}

    def counting_step(st, b, key):
        count["n"] += 1
        if count["n"] == N_BATCHES + 2:        # epoch 1, step 2
            request_preemption()
        return step(st, b, key)

    _, _, hist = train_epochs(
        state, counting_step, data_iter, 3, RNG(9),
        loss_key="loss", preempt_path=ck, log_fn=lambda *_: None)
    assert hist[-1]["preempted"] and hist[-1]["preempted_at_step"] == 2
    saved = load_checkpoint(ck)
    assert "batch_stats" in saved              # BN state is in the ckpt

    state_r, _ = fresh()
    state_r, resume = restore_preempt(ck, state_r)
    assert (resume["start_epoch"], resume["start_step"]) == (1, 2)
    assert resume["start_partial_count"] == 2      # carried partial sums
    assert "loss" in (resume["start_partial_sums"] or {})
    state_r, _, _ = train_epochs(
        state_r, step, data_iter, 3, RNG(9),
        loss_key="loss", log_fn=lambda *_: None, **resume)

    for tree_a, tree_b in ((state_ref.params, state_r.params),
                           (state_ref.batch_stats, state_r.batch_stats)):
        for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                        jax.tree_util.tree_leaves(tree_b)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_skips_extract():
    """On resume, skipped batches must not be extracted (extract is where
    the host→device transfer lives — paying it for discarded batches on a
    tunneled backend was pure waste)."""
    from ratio_guided_multimodal_fm_tpu.train.loop import (
        epoch_data_iter,
        train_epochs,
    )

    class L:
        def epoch(self, e):
            rng = np.random.RandomState(300 + e)
            return iter([rng.randn(4, H, H, 1).astype(np.float32)
                         for _ in range(N_BATCHES)])

    calls = {"n": 0}

    def extract(b):
        calls["n"] += 1
        return jnp.asarray(b)

    state, step = _fresh()
    train_epochs(state, step, epoch_data_iter(L(), extract), 1, RNG(3),
                 start_step=2, log_fn=lambda *_: None)
    assert calls["n"] == N_BATCHES - 2


def test_resume_preserves_early_stop_state(tmp_path):
    """The preempt checkpoint carries best_loss + patience_counter so a
    resumed run can't overwrite the saved best model with a worse one."""
    ck = str(tmp_path / "preempt2")
    best = str(tmp_path / "best")
    state, step = _fresh()

    count = {"n": 0}

    def counting_step(st, x1, key):
        count["n"] += 1
        if count["n"] == 2 * N_BATCHES + 1:     # epoch 2, step 1
            request_preemption()
        return step(st, x1, key)

    _, _, hist = train_flow_matching_epochs(
        state, counting_step, _data_iter_fn, 4, RNG(7),
        best_path=best, preempt_path=ck, log_fn=lambda *_: None)
    assert hist[-1]["preempted"]
    saved = load_checkpoint(ck)
    assert np.isfinite(float(saved["best_loss"]))   # 2 epochs completed
    # the two completed epochs' best is carried into the checkpoint
    completed = [h["loss"] for h in hist if "loss" in h]
    assert float(saved["best_loss"]) == min(completed)
    assert int(saved["patience_counter"]) == (
        0 if completed[-1] == min(completed) else 1)
