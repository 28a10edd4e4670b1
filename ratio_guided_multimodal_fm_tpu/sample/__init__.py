from ratio_guided_multimodal_fm_tpu.sample.guided import (
    GuidedSamplerConfig,
    sample_bimodal_guided,
    make_guided_sampler,
    make_guided_sampler_p,
    mc_feng_guidance,
    generate_mc_set,
)
from ratio_guided_multimodal_fm_tpu.sample.smc import (
    SMCSamplerConfig,
    make_smc_sampler,
    make_smc_sampler_p,
    sample_bimodal_smc,
)
