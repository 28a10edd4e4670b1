"""Interop: move checkpoints between this framework and the reference's
PyTorch format — import (.pth -> Flax trees) and export (Flax -> .pth)."""
from ratio_guided_multimodal_fm_tpu.interop.torch_import import (  # noqa: F401
    import_state_dict,
    TORCH_IMPORTERS,
)
from ratio_guided_multimodal_fm_tpu.interop.torch_export import (  # noqa: F401
    export_state_dict,
    TORCH_EXPORTERS,
)
