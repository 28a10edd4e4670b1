"""Train FM on SVHN (experiment 2, modality y).

Flag-parity with ref src/train_flow_svhn.py:84-101 including --resume;
checkpoints flow_svhn_{best|epochN}. The reference needed a rank-flexible
CFM subclass for RGB (train_flow_svhn.py:58-81); our interpolant is
rank-agnostic so no special case exists.
"""
from __future__ import annotations

import argparse

from ratio_guided_multimodal_fm_tpu.cli.common import (
    arm_preemption,
    init_runtime,
    wrap_loader,
    add_common_flags
)
from ratio_guided_multimodal_fm_tpu.cli.train_flow_mnist32 import run_flow_training
from ratio_guided_multimodal_fm_tpu.core.prng import set_seed
from ratio_guided_multimodal_fm_tpu.data.mnist_svhn import get_svhn_flow_dataloader
from ratio_guided_multimodal_fm_tpu.models import FlowMatchingUNetSVHN


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train FM on SVHN")
    parser.add_argument("--epochs", type=int, default=50)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--save_every", type=int, default=10)
    parser.add_argument("--patience", type=int, default=10)
    parser.add_argument("--resume", type=str, default=None,
                        help="Path to checkpoint to resume from "
                             "(e.g., checkpoints/flow_svhn_best)")
    parser.add_argument("--ema_decay", type=float, default=None,
                        help="Polyak-average the weights with this decay "
                             "(e.g. 0.999); best saves also write "
                             "flow_svhn_ema_best, loadable with --ema")
    parser.add_argument("--preempt_path", type=str, default=None,
                        help="Preemption-safe training: on SIGTERM, save a "
                             "step-granular resumable checkpoint here and "
                             "exit; if it exists at startup, resume from it")
    from ratio_guided_multimodal_fm_tpu.cli.common import add_fused_flag
    add_fused_flag(parser)
    from ratio_guided_multimodal_fm_tpu.cli.common import add_fast_rng_flag
    add_fast_rng_flag(parser)
    add_common_flags(parser)
    args = parser.parse_args(argv)

    init_runtime(args)
    arm_preemption()   # SIGTERM-safe from startup (train CLIs only)
    set_seed(args.seed)
    print(f"Random seed: {args.seed}")
    loader = wrap_loader(get_svhn_flow_dataloader(
        args.batch_size, True, args.data_root, seed=args.seed), args)
    model = FlowMatchingUNetSVHN()
    from ratio_guided_multimodal_fm_tpu.data.mnist_svhn import _svhn
    run_flow_training(model, (32, 32, 3), loader, args, "flow_svhn",
                      dataset=_svhn(args.data_root, True)[0])


if __name__ == "__main__":
    main()
