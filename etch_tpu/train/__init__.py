from etch_tpu.train.losses import compute_losses  # noqa: F401
from etch_tpu.train.state import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    make_train_step_dynamic,
    make_eval_step,
)
