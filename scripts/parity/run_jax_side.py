"""JAX/TPU side of the quality-parity experiment.

Trains the same stack as run_torch_reference.py — identical data (the
frozen IDX files), identical hyperparameters (classifier 3 epochs lr 1e-3,
flows 10 epochs lr 1e-4 B=128, ratio disc 10 epochs) — via this framework's
own CLIs, then runs the evaluate sweep at the same settings
(512 samples, N_mc=256, 100 steps, γ ∈ {0, 0.5, 1.0}) with --save_samples.

Stages are resumable (skipped when their checkpoint exists). Run from the
repo root (TPU by default; JAX_PLATFORMS=cpu to force CPU):

    python scripts/parity/run_jax_side.py --workdir parity_runs/jax
"""
from __future__ import annotations

import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, REPO)

_SMOKE = bool(int(os.environ.get("PARITY_SMOKE", "0")))
# Same env knobs as run_torch_reference.py — the two sides must train with
# identical protocol for the golden-curve comparison.
EPOCHS_CLS = 1 if _SMOKE else int(os.environ.get("PARITY_EPOCHS_CLS", "3"))
EPOCHS_FLOW = 1 if _SMOKE else int(os.environ.get("PARITY_EPOCHS_FLOW", "5"))
EPOCHS_RATIO = 1 if _SMOKE else int(os.environ.get("PARITY_EPOCHS_RATIO", "10"))
NUM_SAMPLES = 8 if _SMOKE else int(os.environ.get("PARITY_N", "512"))
NUM_STEPS = 4 if _SMOKE else 100
MC_BATCH = 16 if _SMOKE else 256
TRANSFORM = "rotate90"
SEED = 42


def _run_main(module_name: str, argv: list[str]) -> None:
    import importlib

    mod = importlib.import_module(module_name)
    t0 = time.time()
    mod.main(argv)
    print(f"[parity-jax] {module_name} {argv} done in {time.time()-t0:.0f}s",
          flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="parity_runs/jax")
    ap.add_argument("--data-root", default=os.path.join(REPO, "data"))
    ap.add_argument("--eval-only", action="store_true")
    args = ap.parse_args()

    workdir = os.path.abspath(os.path.join(REPO, args.workdir))
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)
    data = ["--data_root", os.path.abspath(args.data_root)]

    P = "ratio_guided_multimodal_fm_tpu.cli"
    if not args.eval_only:
        if not os.path.isdir("checkpoints/mnist_classifier"):
            _run_main(f"{P}.train_classifier",
                      ["--epochs", str(EPOCHS_CLS), "--seed", str(SEED)] + data)
        if not os.path.isdir("checkpoints/flow_x_best"):
            _run_main(f"{P}.train_flow",
                      ["--modality", "x", "--epochs", str(EPOCHS_FLOW),
                       "--seed", str(SEED)] + data)
        if not os.path.isdir(f"checkpoints/flow_y_{TRANSFORM}_best"):
            _run_main(f"{P}.train_flow",
                      ["--modality", "y", "--transform_type", TRANSFORM,
                       "--epochs", str(EPOCHS_FLOW), "--seed", str(SEED)]
                      + data)
        if not os.path.isdir(f"checkpoints/ratio_disc_{TRANSFORM}_best"):
            _run_main(f"{P}.train_ratio",
                      ["--loss_type", "disc", "--transform_type", TRANSFORM,
                       "--epochs", str(EPOCHS_RATIO), "--seed", str(SEED)]
                      + data)

    _run_main(f"{P}.evaluate",
              ["--transform_type", TRANSFORM,
               "--guidance_methods", "none", "mc_feng",
               "--guidance_strengths", "0.0", "0.5", "1.0",
               "--num_samples", str(NUM_SAMPLES),
               "--num_steps", str(NUM_STEPS),
               "--mc_batch_size", str(MC_BATCH),
               "--save_samples", "--seed", "1234"] + data)
    print("[parity-jax] results at", os.path.join(workdir, "outputs"),
          flush=True)


if __name__ == "__main__":
    main()
