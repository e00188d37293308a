from etch_tpu.train.losses import compute_losses  # noqa: F401
from etch_tpu.train.state import TrainState, create_train_state, train_step  # noqa: F401
