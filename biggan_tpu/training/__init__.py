from biggan_tpu.training.train_state import GANTrainState, create_train_state  # noqa: F401
from biggan_tpu.training.train_step import make_train_step  # noqa: F401
