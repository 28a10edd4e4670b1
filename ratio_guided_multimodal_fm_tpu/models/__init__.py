from ratio_guided_multimodal_fm_tpu.models.unet import (
    FlexibleUNet,
    FlowMatchingUNet,
    FlowMatchingUNetMNIST,
    FlowMatchingUNetSVHN,
)
from ratio_guided_multimodal_fm_tpu.models.flow_matching import FlowMatchingModel
from ratio_guided_multimodal_fm_tpu.models.ratio import (
    FlexibleRatioEstimator,
    RatioEstimatorMNIST,
    RatioEstimator,
    RatioEstimatorMNISTSVHN,
    log_ratio_from_scores,
)
from ratio_guided_multimodal_fm_tpu.models.classifiers import (
    Classifier64,
    MNISTClassifier,
    MNISTClassifier32,
    SVHNClassifier,
)
