"""Import a reference PyTorch checkpoint (.pth) into an Orbax checkpoint.

Bridges a reference user's trained weights into this framework:

    python -m ratio_guided_multimodal_fm_tpu.cli.import_torch \
        --torch_checkpoint checkpoints/flow_y_rotate90_best.pth \
        --model unet_mnist \
        --out checkpoints/flow_y_rotate90_best

The output is a params-only Orbax checkpoint (plus batch_stats for the
BatchNorm families) in the framework's dual-format convention
(train/checkpoint.py), loadable by every sample/evaluate/serve CLI via the
same `--*_checkpoint` flags used for natively trained weights. Model kinds
mirror the reference families (interop/torch_import.py):

    unet_mnist        FlowMatchingUNet / FlowMatchingUNetMNIST (28 or 32 px)
    unet_svhn         FlowMatchingUNetSVHN
    fm_original       FlowMatchingModel (--model original in train_flow.py)
    ratio             RatioEstimator / FlexibleRatioEstimator (exp 1)
    ratio_mnist_svhn  RatioEstimatorMNISTSVHN (exp 2; writes batch_stats)
    classifier_mnist / classifier_mnist32 / classifier_svhn

Output equivalence with the torch models is asserted by
tests/test_torch_import.py (identical weights -> identical outputs).
"""
from __future__ import annotations

import argparse
import os
import sys

import jax

from ratio_guided_multimodal_fm_tpu.interop import (
    TORCH_IMPORTERS,
    import_state_dict,
)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Convert a reference torch .pth into an Orbax checkpoint")
    p.add_argument("--torch_checkpoint", type=str, required=True,
                   help=".pth file: raw state_dict or the reference's full "
                        "train dict {'model_state_dict': ...}")
    p.add_argument("--model", type=str, required=True,
                   choices=sorted(TORCH_IMPORTERS),
                   help="reference model family of the checkpoint")
    p.add_argument("--out", type=str, required=True,
                   help="output Orbax checkpoint directory")
    p.add_argument("--unsafe_pickle", action="store_true",
                   help="allow full-pickle .pth files (whole nn.Module "
                        "pickles). Default loads with weights_only=True, "
                        "which covers state_dicts and the reference's train "
                        "dicts without executing pickled code")
    args = p.parse_args(argv)

    # Pure host-side conversion — never let the Orbax save initialize an
    # accelerator backend (on the axon tunnel that would claim the single
    # TPU chip and can wedge a concurrent job).
    jax.config.update("jax_platforms", "cpu")

    try:
        import torch
    except ImportError:
        print("error: converting .pth files requires torch on the host "
              "(CPU build is enough)", file=sys.stderr)
        return 2

    from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
        save_checkpoint,
    )

    sd = torch.load(args.torch_checkpoint, map_location="cpu",
                    weights_only=not args.unsafe_pickle)
    if hasattr(sd, "state_dict"):            # a whole nn.Module was pickled
        sd = sd.state_dict()
    variables = import_state_dict(sd, args.model)

    n = sum(v.size for v in jax.tree_util.tree_leaves(variables["params"]))
    out = os.path.abspath(args.out)
    save_checkpoint(out, variables if "batch_stats" in variables
                    else variables["params"])
    extra = " (+batch_stats)" if "batch_stats" in variables else ""
    print(f"imported {args.model}: {n:,} params{extra} -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
