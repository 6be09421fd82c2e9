from aivc_tpu.train.loss import gop_rd_loss  # noqa: F401
from aivc_tpu.train.trainer import make_optimizer, make_train_step  # noqa: F401
