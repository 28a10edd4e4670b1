"""Reflow-distill a trained flow for few-step sampling (flow/reflow.py).

Beyond the reference surface: the reference integrates every sampler with
100 Euler steps (flow_utils.py:85-100); reflow straightens a trained
flow's trajectories so 4-8 Euler steps (or 2-4 midpoint steps) match the
teacher's 100-step quality. The distilled checkpoint lands next to the
teacher with a `_reflow` name part, and every sample/evaluate/serve CLI
picks it up via `--reflow` (combine with `--num_steps 8` / `--solver
midpoint --num_steps 4` for the speedup).

Usage:
  # experiment 1 (train both flows' students):
  python -m ratio_guided_multimodal_fm_tpu.cli.reflow --modality x
  python -m ratio_guided_multimodal_fm_tpu.cli.reflow --modality y \
      --transform_type rotate90
  # experiment 2:
  python -m ratio_guided_multimodal_fm_tpu.cli.reflow \
      --experiment mnist_svhn --flow mnist32
  python -m ratio_guided_multimodal_fm_tpu.cli.reflow \
      --experiment mnist_svhn --flow svhn
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from ratio_guided_multimodal_fm_tpu.cli.common import (
    add_common_flags,
    add_solver_flag,
    count_params,
    dtype_of,
    fm_model,
    init_runtime,
    load_params_or_exit,
)
from ratio_guided_multimodal_fm_tpu.core.prng import set_seed
from ratio_guided_multimodal_fm_tpu.flow.reflow import (
    generate_couplings,
    make_reflow_train_step,
)
from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
    get_checkpoint_path,
    save_train_checkpoint,
)
from ratio_guided_multimodal_fm_tpu.train.steps import create_fm_state


def _resolve(args):
    """(model, sample_shape, teacher_path, student_path) for the target."""
    dtype = dtype_of(args)
    if args.experiment == "mnist_svhn":
        from ratio_guided_multimodal_fm_tpu.models import (
            FlowMatchingUNetMNIST,
            FlowMatchingUNetSVHN,
        )
        kw = {"dtype": dtype} if dtype is not None else {}
        if args.flow == "mnist32":
            return (FlowMatchingUNetMNIST(img_size=32, **kw), (32, 32, 1),
                    "checkpoints/flow_mnist32_best",
                    "checkpoints/flow_mnist32_reflow_best")
        return (FlowMatchingUNetSVHN(**kw), (32, 32, 3),
                "checkpoints/flow_svhn_best",
                "checkpoints/flow_svhn_reflow_best")
    model = fm_model(args.model, dtype=dtype)
    if args.modality == "x":
        return (model, (28, 28, 1),
                get_checkpoint_path("flow", "x", None, "best"),
                get_checkpoint_path("flow", "x", None, "reflow", "best"))
    return (model, (28, 28, 1),
            get_checkpoint_path("flow", "y", args.transform_type, "best"),
            get_checkpoint_path("flow", "y", args.transform_type,
                                "reflow", "best"))


def run_reflow(model, sample_shape, teacher_path, student_path, args):
    teacher_template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1,) + tuple(sample_shape)),
        jnp.zeros((1,)))["params"]
    teacher = load_params_or_exit(teacher_path, teacher_template,
                                  "Teacher flow", "train the base flow first")
    apply_fn = lambda p, x, t: model.apply({"params": p}, x, t)  # noqa: E731

    key = jax.random.PRNGKey(args.seed)
    step = make_reflow_train_step(model)
    params = teacher
    for r in range(args.rounds):
        kgen = jax.random.fold_in(key, 1000 + r)
        t0 = time.perf_counter()
        x0, x1 = generate_couplings(
            apply_fn, params, kgen, args.pairs, sample_shape,
            num_steps=args.teacher_steps, solver=args.solver,
            gen_batch_size=args.gen_batch_size)
        print(f"[round {r + 1}/{args.rounds}] {len(x0)} couplings in "
              f"{time.perf_counter() - t0:.1f}s "
              f"({args.teacher_steps}-step {args.solver} teacher)")

        # Student warm-starts from the current teacher (standard reflow:
        # the velocity field barely changes, only the coupling does).
        state = create_fm_state(model, jax.random.PRNGKey(args.seed + r),
                                sample_shape, lr=args.lr)
        state = state.replace(params=params)
        if r == 0:
            print(f"Model parameters: {count_params(state.params):,}")

        n = (len(x0) // args.batch_size) * args.batch_size
        best = float("inf")
        best_params = state.params
        for epoch in range(args.epochs):
            rng = np.random.default_rng(args.seed + 31 * r + epoch)
            perm = rng.permutation(len(x0))[:n]
            losses = []
            te = time.perf_counter()
            for s in range(0, n, args.batch_size):
                idx = perm[s:s + args.batch_size]
                state, loss = step(
                    state, jnp.asarray(x0[idx]), jnp.asarray(x1[idx]),
                    jax.random.fold_in(key, r * 100000 + epoch * 1000
                                       + s // args.batch_size))
                losses.append(loss)
            mean_loss = float(np.mean([np.asarray(l) for l in losses]))
            dt = time.perf_counter() - te
            print(f"  epoch {epoch + 1}/{args.epochs}: loss {mean_loss:.4f} "
                  f"({n // args.batch_size} steps, {dt:.1f}s)")
            if mean_loss < best:
                best = mean_loss
                best_params = state.params
        params = best_params

    final = create_fm_state(model, jax.random.PRNGKey(0), sample_shape,
                            lr=args.lr).replace(params=params)
    save_train_checkpoint(student_path, final, args.epochs, best)
    print(f"Saved reflowed flow: {student_path} (best loss {best:.4f})")
    return best


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Reflow-distill a trained flow for few-step sampling")
    parser.add_argument("--experiment", type=str, default="mnist_transform",
                        choices=["mnist_transform", "mnist_svhn"])
    parser.add_argument("--modality", type=str, default="x",
                        choices=["x", "y"],
                        help="experiment-1 flow to distill")
    parser.add_argument("--transform_type", type=str, default="rotate90")
    parser.add_argument("--model", type=str, default="unet",
                        choices=["unet", "original"])
    parser.add_argument("--flow", type=str, default="mnist32",
                        choices=["mnist32", "svhn"],
                        help="experiment-2 flow to distill")
    parser.add_argument("--pairs", type=int, default=20480,
                        help="teacher couplings to generate per round")
    parser.add_argument("--gen_batch_size", type=int, default=512)
    parser.add_argument("--teacher_steps", type=int, default=100,
                        help="ODE steps for teacher coupling generation")
    parser.add_argument("--rounds", type=int, default=1,
                        help="reflow iterations (2-reflow re-couples from "
                             "the round-1 student)")
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=1e-4)
    add_solver_flag(parser)
    add_common_flags(parser)
    args = parser.parse_args(argv)

    init_runtime(args)
    set_seed(args.seed)
    model, shape, teacher_path, student_path = _resolve(args)
    run_reflow(model, shape, teacher_path, student_path, args)


if __name__ == "__main__":
    main()
