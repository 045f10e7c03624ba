from stereoanywhere_tpu.train.loss import stereoanywhere_loss  # noqa: F401
from stereoanywhere_tpu.train.trainer import Trainer, TrainState, make_train_step  # noqa: F401
