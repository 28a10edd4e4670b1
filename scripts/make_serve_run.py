"""Materialize a run dir with random-init checkpoints for cli/serve.py.

The serve loadtest (scripts/serve_loadtest.py) measures throughput/latency,
which are weight-independent — so a fresh clone can create its
$SERVE_RUN_DIR (default `serve_run`) with this helper instead of training
first:

    python scripts/make_serve_run.py                 # exp-1 rotate90
    python scripts/make_serve_run.py --experiment mnist_svhn
    SERVE_RUN_DIR=serve_run python scripts/serve_loadtest.py

For QUALITY evaluation point the server at a trained run dir instead
(e.g. the tpu_queue_r3g.sh exp-1 full-budget stack).

Checkpoint names follow the reference convention (path_utils.py:7-32):
flow_x_best / flow_y_<transform>_best / ratio_<loss>_<transform>_best for
exp-1; the mnist_svhn names from cli/sample_mnist_svhn.py for exp-2.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")   # init-only; no TPU needed


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", default=os.environ.get("SERVE_RUN_DIR", "serve_run"))
    p.add_argument("--experiment", choices=["mnist_transform", "mnist_svhn"],
                   default="mnist_transform")
    p.add_argument("--transform_type", default="rotate90")
    p.add_argument("--loss_type", default="disc")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--with_classifier", action="store_true",
                   help="also write the eval classifier checkpoint(s) so "
                        "cli.evaluate/evaluate_mnist_svhn run against the "
                        "dir (random-init: plumbing tests, not quality)")
    p.add_argument("--with_ema", action="store_true",
                   help="also write flow_*_ema_best AND ratio_*_ema_best "
                        "siblings (copies of the random init) so the "
                        "--ema / --ratio_ema paths resolve")
    args = p.parse_args(argv)

    from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
        get_checkpoint_path, save_checkpoint)

    base = os.path.join(args.run_dir, "checkpoints")
    os.makedirs(base, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)

    if args.experiment == "mnist_transform":
        from ratio_guided_multimodal_fm_tpu.cli.common import fm_model
        from ratio_guided_multimodal_fm_tpu.models import RatioEstimatorMNIST

        model = fm_model("unet")
        x = jnp.zeros((1, 28, 28, 1))
        kx, ky, kr = jax.random.split(key, 3)
        px = model.init(kx, x, jnp.zeros((1,)))["params"]
        py = model.init(ky, x, jnp.zeros((1,)))["params"]
        ratio = RatioEstimatorMNIST(loss_type=args.loss_type)
        pr = ratio.init(kr, x, x)["params"]
        saves = [
            (get_checkpoint_path("flow", "x", None, "best", base_dir=base), px),
            (get_checkpoint_path("flow", "y", args.transform_type, "best",
                                 base_dir=base), py),
            (get_checkpoint_path("ratio", args.loss_type, args.transform_type,
                                 "best", base_dir=base), pr),
        ]
        if args.with_ema:
            saves += [
                (get_checkpoint_path("flow", "x", None, "ema", "best",
                                     base_dir=base), px),
                (get_checkpoint_path("flow", "y", args.transform_type, "ema",
                                     "best", base_dir=base), py),
                (get_checkpoint_path("ratio", args.loss_type,
                                     args.transform_type, "ema", "best",
                                     base_dir=base), pr),
            ]
        if args.with_classifier:
            from ratio_guided_multimodal_fm_tpu.models import MNISTClassifier
            pc = MNISTClassifier().init(jax.random.PRNGKey(args.seed + 1),
                                        x)["params"]
            saves.append((os.path.join(base, "mnist_classifier"), pc))
    else:
        from ratio_guided_multimodal_fm_tpu.models import (
            FlowMatchingUNetMNIST, FlowMatchingUNetSVHN,
            RatioEstimatorMNISTSVHN)

        km, ks, kr = jax.random.split(key, 3)
        xm = jnp.zeros((1, 32, 32, 1))
        xs = jnp.zeros((1, 32, 32, 3))
        pm = FlowMatchingUNetMNIST().init(km, xm, jnp.zeros((1,)))["params"]
        ps = FlowMatchingUNetSVHN().init(ks, xs, jnp.zeros((1,)))["params"]
        ratio = RatioEstimatorMNISTSVHN(loss_type=args.loss_type)
        rv = ratio.init(kr, xm, xs)
        saves = [
            (get_checkpoint_path("flow", "mnist32", "best", base_dir=base), pm),
            (get_checkpoint_path("flow", "svhn", "best", base_dir=base), ps),
            (get_checkpoint_path("ratio", args.loss_type, "mnist_svhn", "best",
                                 base_dir=base),
             {"params": rv["params"], "batch_stats": rv["batch_stats"]}),
        ]
        if args.with_ema:
            saves += [
                (get_checkpoint_path("flow", "mnist32", "ema", "best",
                                     base_dir=base), pm),
                (get_checkpoint_path("flow", "svhn", "ema", "best",
                                     base_dir=base), ps),
                (get_checkpoint_path("ratio", args.loss_type, "mnist_svhn",
                                     "ema", "best", base_dir=base),
                 {"params": rv["params"], "batch_stats": rv["batch_stats"]}),
            ]
        if args.with_classifier:
            from ratio_guided_multimodal_fm_tpu.models import (
                MNISTClassifier32, SVHNClassifier)
            kc1, kc2 = jax.random.split(jax.random.PRNGKey(args.seed + 1))
            pcm = MNISTClassifier32().init(kc1, xm)["params"]
            cv = SVHNClassifier().init(kc2, xs)
            saves += [
                (os.path.join(base, "mnist32_classifier"), pcm),
                (os.path.join(base, "svhn_classifier"),
                 {"params": cv["params"], "batch_stats": cv["batch_stats"]}),
            ]

    for path, tree in saves:
        save_checkpoint(path, tree)
        print("wrote", path)
    print(f"done — run the server with cwd={args.run_dir}")


if __name__ == "__main__":
    main()
