"""Training infrastructure: optimizers, schedules, jitted steps, loops."""

from unet_implementations_tpu.training.train_state import (  # noqa: F401
    TrainState,
    create_train_state,
    sgd_nesterov,
    adam_l2,
    poly_lr,
    cosine_lr,
    set_learning_rate,
    get_learning_rate,
)
from unet_implementations_tpu.training.steps import (  # noqa: F401
    make_accum_train_step,
    make_segmentation_loss_fn,
    make_segmentation_train_step,
    make_segmentation_eval_step,
    make_reconstruction_train_step,
    make_reconstruction_eval_step,
)
from unet_implementations_tpu.training.early_stopping import EarlyStopping  # noqa: F401
