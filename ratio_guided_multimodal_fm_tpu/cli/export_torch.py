"""Export an Orbax checkpoint as a reference PyTorch .pth state_dict.

The inverse of cli/import_torch.py — closes the migration round-trip, so
weights trained on TPU here drop back into the reference's own torch
tooling (`foubari/ratio_guided_Multimodal_FM` loads them via its
dual-format `load_checkpoint`, utils/__init__.py:25-51):

    python -m ratio_guided_multimodal_fm_tpu.cli.export_torch \
        --checkpoint checkpoints/flow_y_rotate90_best \
        --model unet_mnist \
        --out flow_y_rotate90_best.pth

Accepts every on-disk format this framework writes: params-only
checkpoints, {params, batch_stats} trees (BatchNorm families), full train
dicts {params, opt_state, epoch, best_loss[, batch_stats]}, and the
EMA sibling checkpoints (flow_*_ema_best — params-only by construction).
Model kinds mirror the reference families (interop/torch_export.py).

Output equivalence with the reference torch models is asserted by
tests/test_torch_export.py (exported weights -> identical outputs).
"""
from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np


def main(argv=None):
    from ratio_guided_multimodal_fm_tpu.interop.torch_export import (
        TORCH_EXPORTERS,
        export_state_dict,
    )

    p = argparse.ArgumentParser(
        description="Convert an Orbax checkpoint into a reference torch .pth")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="Orbax checkpoint directory (params-only, "
                        "params+batch_stats, or full train dict)")
    p.add_argument("--model", type=str, required=True,
                   choices=sorted(TORCH_EXPORTERS),
                   help="reference model family of the checkpoint")
    p.add_argument("--out", type=str, required=True,
                   help="output .pth path (torch.save of the state_dict)")
    args = p.parse_args(argv)

    # Pure host-side conversion — never claim the TPU chip (axon tunnel is
    # single-client; a concurrent training job would wedge).
    jax.config.update("jax_platforms", "cpu")

    try:
        import torch
    except ImportError:
        print("error: writing .pth files requires torch on the host "
              "(CPU build is enough)", file=sys.stderr)
        return 2

    from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
        load_checkpoint,
    )

    # export_state_dict sniffs the format itself (bare params tree,
    # {params[, batch_stats]}, or a full train dict whose extra keys —
    # opt_state, epoch, ... — it ignores)
    sd = export_state_dict(load_checkpoint(os.path.abspath(args.checkpoint)),
                           args.model)
    out = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) if hasattr(
        v, "shape") and v.shape else torch.tensor(v)
        for k, v in sd.items()}, out)

    n = sum(int(np.prod(v.shape)) for k, v in sd.items()
            if k.endswith((".weight", ".bias")))
    print(f"exported {args.model}: {n:,} params -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
