from ratio_guided_multimodal_fm_tpu.ops.guidance_pallas import (
    flash_guidance,
    fused_guidance_pallas,
    pallas_available,
)
