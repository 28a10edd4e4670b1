from ratio_guided_multimodal_fm_tpu.core.prng import set_seed, RNG
from ratio_guided_multimodal_fm_tpu.core.dtypes import Policy, DEFAULT_POLICY
