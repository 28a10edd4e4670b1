from ratio_guided_multimodal_fm_tpu.train.steps import (
    FMTrainState,
    RatioTrainState,
    make_fm_train_step,
    make_ratio_train_step,
    make_classifier_train_step,
)
from ratio_guided_multimodal_fm_tpu.train.checkpoint import (
    get_checkpoint_path,
    save_checkpoint,
    load_checkpoint,
    checkpoint_exists,
)
from ratio_guided_multimodal_fm_tpu.train.loop import (
    EarlyStopper,
    restore_preempt,
    train_epochs,
    train_flow_matching_epochs,
)
