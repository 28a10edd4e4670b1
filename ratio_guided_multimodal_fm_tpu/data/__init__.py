from ratio_guided_multimodal_fm_tpu.data.sources import load_mnist, load_svhn
from ratio_guided_multimodal_fm_tpu.data.transforms import (
    apply_transform,
    inverse_transform,
    TRANSFORM_NAMES,
)
from ratio_guided_multimodal_fm_tpu.data.pipeline import (
    Pairing,
    flow_batches,
    paired_batches,
    ratio_batches,
    to_unit_range,
)
from ratio_guided_multimodal_fm_tpu.data.mnist_dataset import (
    get_flow_dataloader,
    get_ratio_dataloader,
)
from ratio_guided_multimodal_fm_tpu.data.mnist_svhn import (
    get_mnist_svhn_dataloader,
    get_mnist_svhn_ratio_dataloader,
    get_svhn_flow_dataloader,
    get_mnist32_flow_dataloader,
)
