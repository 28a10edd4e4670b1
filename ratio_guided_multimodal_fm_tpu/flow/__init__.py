from ratio_guided_multimodal_fm_tpu.flow.cfm import (
    SOLVERS,
    interpolate,
    cfm_loss,
    euler_sample,
    ode_scan,
    ode_scan_pair,
)
from ratio_guided_multimodal_fm_tpu.flow.reflow import (
    generate_couplings,
    make_reflow_train_step,
    reflow_loss,
)
from ratio_guided_multimodal_fm_tpu.flow.losses import (
    disc_loss,
    rulsif_loss,
    get_ratio_loss,
    masked_ratio_loss,
)
