"""Reflow distillation (flow/reflow.py + cli/reflow.py).

Pins: coupling generation exactness on an analytic field, the
given-coupling loss identity, and THE distillation property — after
reflow, a 2-step student integration lands where the 50-step teacher
does, far closer than a 2-step teacher shortcut.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ratio_guided_multimodal_fm_tpu.flow.cfm import ode_scan
from ratio_guided_multimodal_fm_tpu.flow.reflow import (
    generate_couplings,
    make_reflow_train_step,
    reflow_loss,
)
from ratio_guided_multimodal_fm_tpu.models import FlexibleUNet
from ratio_guided_multimodal_fm_tpu.train.steps import create_fm_state

H = 12


def test_generate_couplings_constant_field():
    """v(x,t) = c ⇒ x1 = x0 + c exactly, any solver/step count; batching
    covers the full request (rounded UP to the gen batch)."""
    c = 0.37
    apply_fn = lambda p, x, t: jnp.full_like(x, p["c"])
    x0, x1 = generate_couplings(apply_fn, {"c": c}, jax.random.PRNGKey(0),
                                num_pairs=10, shape=(3, 3, 1), num_steps=7,
                                gen_batch_size=4)
    assert len(x0) == 12 and len(x1) == 12  # 3 batches of 4
    np.testing.assert_allclose(x1, x0 + c, rtol=1e-5, atol=1e-5)
    assert abs(float(x0.mean())) < 0.2  # prior draw, not zeros


def test_reflow_loss_zero_for_exact_field():
    """If the model already outputs u = x1 - x0 along the chord, the loss
    is 0; a wrong field gives a positive loss."""
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(8, 4).astype(np.float32))
    x1 = jnp.asarray(rng.randn(8, 4).astype(np.float32))
    u = x1 - x0

    exact = lambda x, t: u            # closed over the true coupling
    loss = reflow_loss(exact, jax.random.PRNGKey(1), x0, x1)
    assert float(loss) < 1e-10
    loss2 = reflow_loss(lambda x, t: jnp.zeros_like(x),
                        jax.random.PRNGKey(1), x0, x1)
    assert float(loss2) > 0.1


@pytest.mark.slow
def test_reflow_straightens_trajectories():
    """Distill a CURVED analytic teacher and verify the 2-step student
    matches the true endpoint far better than the 2-step teacher — the
    distillation claim, with the curvature controlled so the test can
    discriminate. Teacher: dx/dt = -3(1-t)·x ⇒ x1 = e^{-1.5}·x0 exactly,
    but Euler-2 lands at -0.125·x0 (it overshoots through zero). The
    1-rectified field is CONSTANT along each (x0,x1) chord, so any step
    count integrates the student exactly up to its fit error.

    (A trained-blob-teacher variant of this test could not discriminate:
    its trajectories are already near-straight — 2-step MSE 0.02 — so the
    student's fit error drowned the curvature signal.)"""
    A = float(np.exp(-1.5))

    def teacher_apply(params, x, t):      # params unused (analytic field)
        return -3.0 * (1.0 - t).reshape(-1, 1, 1, 1) * x

    # midpoint coupling generation: euler-50 carries ~6% error on this
    # stiff field; the 2nd-order teacher integration nails the analytic map
    x0c, x1c = generate_couplings(teacher_apply, {}, jax.random.PRNGKey(5),
                                  num_pairs=1024, shape=(H, H, 1),
                                  num_steps=50, gen_batch_size=256,
                                  solver="midpoint")
    np.testing.assert_allclose(x1c, A * x0c, atol=0.02)

    model = FlexibleUNet(in_channels=1, img_size=H, model_channels=8,
                         channel_mult=(1, 2), num_res_blocks=1, dropout=0.0)
    student = create_fm_state(model, jax.random.PRNGKey(2), (H, H, 1),
                              lr=3e-3)
    rstep = make_reflow_train_step(model, donate=False)
    rng2 = np.random.default_rng(0)
    for e in range(20):
        perm = rng2.permutation(1024)
        for s in range(0, 1024, 128):
            idx = perm[s:s + 128]
            student, loss = rstep(student, jnp.asarray(x0c[idx]),
                                  jnp.asarray(x1c[idx]),
                                  jax.random.PRNGKey(1000 + 100 * e + s))

    # fresh prior draws, shared across the integrations
    x0 = jax.random.normal(jax.random.PRNGKey(77), (64, H, H, 1))
    ref = A * x0                                     # exact endpoint
    t_fn = lambda x, t: teacher_apply({}, x, t)
    s_fn = lambda x, t: model.apply({"params": student.params}, x, t)
    teacher2 = ode_scan(t_fn, x0, num_steps=2)
    student2 = ode_scan(s_fn, x0, num_steps=2)

    err_teacher2 = float(jnp.mean((teacher2 - ref) ** 2))
    err_student2 = float(jnp.mean((student2 - ref) ** 2))
    assert err_teacher2 > 0.05                       # the curvature is real
    assert err_student2 < 0.3 * err_teacher2, (
        f"reflow did not straighten: student-2step {err_student2:.4f} vs "
        f"teacher-2step {err_teacher2:.4f}")


@pytest.mark.slow
def test_reflow_cli_end_to_end(tmp_path, monkeypatch):
    """cli.reflow on a tiny seeded teacher checkpoint, then cli.sample
    --reflow consumes the distilled checkpoint (checkpoints/ is cwd-rel)."""
    monkeypatch.chdir(tmp_path)
    import jax.numpy as jnp

    from ratio_guided_multimodal_fm_tpu.cli import reflow as reflow_cli
    from ratio_guided_multimodal_fm_tpu.cli.common import fm_model
    from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
        checkpoint_exists,
        get_checkpoint_path,
        save_checkpoint,
    )

    model = fm_model("unet")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 1)),
                        jnp.zeros((1,)))["params"]
    save_checkpoint(get_checkpoint_path("flow", "x", None, "best"), params)

    reflow_cli.main(["--modality", "x", "--pairs", "32",
                     "--gen_batch_size", "16", "--teacher_steps", "4",
                     "--epochs", "1", "--batch_size", "16",
                     "--device", "cpu"])
    out = get_checkpoint_path("flow", "x", None, "reflow", "best")
    assert checkpoint_exists(out)

    from ratio_guided_multimodal_fm_tpu.train.checkpoint import load_params
    distilled = load_params(out, params)
    assert jax.tree_util.tree_structure(distilled) == \
        jax.tree_util.tree_structure(params)
