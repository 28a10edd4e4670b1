"""Interop: import reference PyTorch checkpoints into this framework."""
from ratio_guided_multimodal_fm_tpu.interop.torch_import import (  # noqa: F401
    import_state_dict,
    TORCH_IMPORTERS,
)
