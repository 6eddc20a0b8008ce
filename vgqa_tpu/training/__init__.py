from .checkpoint import CheckpointManager  # noqa: F401
from .optimizer import label_params, make_optimizer, make_schedule, update_ema  # noqa: F401
from .train_step import TrainState, create_train_state, make_train_step  # noqa: F401
