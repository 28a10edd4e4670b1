"""Run the torch reference (/root/reference) end-to-end on the frozen
synthetic-MNIST IDX dataset to produce the GOLDEN quality curve
(coherence vs guidance strength) for the parity comparison.

Stages (each resumable — skipped when its artifact exists):
  1. classifier  — src/train_classifier.py main()        (3 epochs)
  2. flow x      — src/train_flow.py --modality x        (10 epochs)
  3. flow y      — src/train_flow.py --modality y rotate90
  4. ratio       — src/train_ratio.py --loss_type disc   (10 epochs)
  5. eval        — reference sample_bimodal_guided + evaluate_coherence
                   over (none,0), (mc_feng,0.5), (mc_feng,1.0);
                   saves generated samples as .npz (for cross-evaluation
                   with the JAX classifier) and the golden curve JSON.

The reference repo is missing src/data/mnist_dataset.py (SURVEY §0); the
shim scripts/parity/torch_mnist_dataset.py is registered in sys.modules
before any reference import. Nothing is written to /root/reference.

Run from the repo root:
    python scripts/parity/run_torch_reference.py --workdir parity_runs/torch
"""
from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
REFERENCE = "/root/reference"

_SMOKE = bool(int(os.environ.get("PARITY_SMOKE", "0")))
# Protocol knobs (identical on the JAX side — run_jax_side.py reads the
# same env vars). Defaults sized so the single-core torch run finishes in
# one session: the curve's value is the *identical protocol*, not any
# specific training budget.
EPOCHS_CLS = 1 if _SMOKE else int(os.environ.get("PARITY_EPOCHS_CLS", "3"))
EPOCHS_FLOW = 1 if _SMOKE else int(os.environ.get("PARITY_EPOCHS_FLOW", "5"))
EPOCHS_RATIO = 1 if _SMOKE else int(os.environ.get("PARITY_EPOCHS_RATIO", "10"))
NUM_SAMPLES = 8 if _SMOKE else int(os.environ.get("PARITY_N", "512"))
NUM_STEPS = 4 if _SMOKE else 100
MC_BATCH = 16 if _SMOKE else 256
# Sampling is chunked so a multi-hour single-core torch run is resumable
# and can be cut short at any accumulated sample count.
CHUNK = 8 if _SMOKE else int(os.environ.get("PARITY_CHUNK", "64"))
CONFIGS = [("none", 0.0), ("mc_feng", 0.5), ("mc_feng", 1.0)]
TRANSFORM = "rotate90"
SEED = 42


def _run_main(module_name: str, argv: list[str]) -> None:
    mod = importlib.import_module(module_name)
    old = sys.argv
    sys.argv = [module_name] + argv
    t0 = time.time()
    try:
        mod.main()
    finally:
        sys.argv = old
    print(f"[parity] {module_name} {argv} done in {time.time()-t0:.0f}s",
          flush=True)


def stage_train(args) -> None:
    if not os.path.exists("checkpoints/mnist_classifier.pth"):
        _run_main("src.train_classifier",
                  ["--epochs", str(EPOCHS_CLS), "--device", "cpu"])
    else:
        print("[parity] classifier exists, skipping", flush=True)

    if not os.path.exists("checkpoints/flow_x_best.pth"):
        _run_main("src.train_flow",
                  ["--modality", "x", "--epochs", str(EPOCHS_FLOW),
                   "--device", "cpu", "--seed", str(SEED)])
    else:
        print("[parity] flow_x exists, skipping", flush=True)

    if not os.path.exists(f"checkpoints/flow_y_{TRANSFORM}_best.pth"):
        _run_main("src.train_flow",
                  ["--modality", "y", "--transform_type", TRANSFORM,
                   "--epochs", str(EPOCHS_FLOW), "--device", "cpu",
                   "--seed", str(SEED)])
    else:
        print("[parity] flow_y exists, skipping", flush=True)

    if not os.path.exists(f"checkpoints/ratio_disc_{TRANSFORM}_best.pth"):
        _run_main("src.train_ratio",
                  ["--loss_type", "disc", "--transform_type", TRANSFORM,
                   "--epochs", str(EPOCHS_RATIO), "--device", "cpu",
                   "--seed", str(SEED)])
    else:
        print("[parity] ratio exists, skipping", flush=True)


def stage_eval(args) -> None:
    import numpy as np
    import torch

    from src.evaluate import evaluate_coherence
    from src.models.classifier import MNISTClassifier
    from src.models.ratio_estimator import RatioEstimator
    from src.models.unet import FlowMatchingUNet
    from src.utils import set_seed
    from src.utils.flow_utils import sample_bimodal_guided

    device = "cpu"
    classifier = MNISTClassifier()
    classifier.load_state_dict(
        torch.load("checkpoints/mnist_classifier.pth", map_location=device))
    fm_x, fm_y = FlowMatchingUNet(), FlowMatchingUNet()
    fm_x.load_state_dict(
        torch.load("checkpoints/flow_x_best.pth", map_location=device))
    fm_y.load_state_dict(
        torch.load(f"checkpoints/flow_y_{TRANSFORM}_best.pth",
                   map_location=device))
    ratio = RatioEstimator(loss_type="disc")
    ratio.load_state_dict(
        torch.load(f"checkpoints/ratio_disc_{TRANSFORM}_best.pth",
                   map_location=device))

    os.makedirs("outputs", exist_ok=True)
    results = []
    n_chunks = (NUM_SAMPLES + CHUNK - 1) // CHUNK
    for method, gamma in CONFIGS:
        tag = f"{method}_gamma{gamma}"
        npz_path = f"outputs/samples_{tag}.npz"
        if os.path.exists(npz_path):
            z = np.load(npz_path)
            sx = torch.from_numpy(z["x"])
            sy = torch.from_numpy(z["y"])
            print(f"[parity] {tag}: reusing saved samples", flush=True)
        else:
            xs, ys = [], []
            for ci in range(n_chunks):
                cpath = f"outputs/chunks_{tag}_{ci:03d}.npz"
                if os.path.exists(cpath):
                    z = np.load(cpath)
                    xs.append(z["x"])
                    ys.append(z["y"])
                    continue
                print(f"[parity] sampling {tag} chunk {ci+1}/{n_chunks} ...",
                      flush=True)
                set_seed(1234 + ci)
                t0 = time.time()
                cx, cy = sample_bimodal_guided(
                    fm_x=fm_x, fm_y=fm_y,
                    ratio_estimator=None if method == "none" else ratio,
                    guidance_method=method, guidance_strength=gamma,
                    num_samples=CHUNK, num_steps=NUM_STEPS,
                    device=device, mc_batch_size=MC_BATCH)
                print(f"[parity] {tag} chunk {ci+1}/{n_chunks} sampled in "
                      f"{time.time()-t0:.0f}s", flush=True)
                np.savez_compressed(cpath, x=cx.numpy(), y=cy.numpy())
                xs.append(cx.numpy())
                ys.append(cy.numpy())
            sx = torch.from_numpy(np.concatenate(xs, axis=0))
            sy = torch.from_numpy(np.concatenate(ys, axis=0))
            np.savez_compressed(npz_path, x=sx.numpy(), y=sy.numpy())
        metrics = evaluate_coherence(sx, sy, classifier, device, TRANSFORM)
        results.append({
            "implementation": "torch_reference",
            "method": method,
            "guidance_strength": gamma,
            "transform_type": TRANSFORM,
            **metrics,
        })
        print(f"[parity] {tag}: coherence={metrics['coherence_acc']:.4f}",
              flush=True)
        with open("outputs/golden_curve.json", "w") as f:
            json.dump(results, f, indent=2)

    dst = os.path.join(REPO, "docs", "results_r2")
    os.makedirs(dst, exist_ok=True)
    with open(os.path.join(dst, "torch_reference_curve.json"), "w") as f:
        json.dump({
            "dataset": "synthetic MNIST IDX 20000 train (seed 0)",
            "epochs": {"classifier": EPOCHS_CLS, "flows": EPOCHS_FLOW,
                       "ratio": EPOCHS_RATIO},
            "num_samples": NUM_SAMPLES, "num_steps": NUM_STEPS,
            "mc_batch_size": MC_BATCH,
            "results": results,
        }, f, indent=2)
    print("[parity] golden curve written to docs/results_r2/", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="parity_runs/torch")
    ap.add_argument("--data-root", default=os.path.join(REPO, "data"))
    ap.add_argument("--eval-only", action="store_true")
    args = ap.parse_args()

    workdir = os.path.abspath(os.path.join(REPO, args.workdir))
    os.makedirs(workdir, exist_ok=True)
    os.makedirs(os.path.join(workdir, "checkpoints"), exist_ok=True)
    data_link = os.path.join(workdir, "data")
    if not os.path.lexists(data_link):
        os.symlink(os.path.abspath(args.data_root), data_link)
    os.chdir(workdir)

    sys.path.insert(0, REFERENCE)
    # Register the shims BEFORE any reference import resolves them:
    # torchvision is not installed here, and src/data/mnist_dataset.py is
    # missing from the reference repo (SURVEY §0).
    sys.path.insert(0, HERE)
    importlib.import_module("torchvision_shim").install()
    shim = importlib.import_module("torch_mnist_dataset")
    import src.data  # noqa: F401  (real package, so src.data.* resolves)
    sys.modules["src.data.mnist_dataset"] = shim

    if not args.eval_only:
        stage_train(args)
    stage_eval(args)


if __name__ == "__main__":
    main()
