from ratio_guided_multimodal_fm_tpu.sample.guided import (
    GuidedSamplerConfig,
    sample_bimodal_guided,
    make_guided_sampler,
    make_guided_sampler_p,
    mc_feng_guidance,
    generate_mc_set,
)
