from ratio_guided_multimodal_fm_tpu.eval.coherence import (
    evaluate_coherence,
    evaluate_coherence_dual,
)
from ratio_guided_multimodal_fm_tpu.eval.fid import fid_from_features, compute_fid
from ratio_guided_multimodal_fm_tpu.eval.viz import (
    visualize_pairs,
    visualize_pairs_mnist_svhn,
)
