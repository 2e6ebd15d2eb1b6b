from .state import TrainState  # noqa: F401
from .optim import build_optimizer, poly_schedule  # noqa: F401
from .step import make_train_step, make_eval_step, make_loss_fn  # noqa: F401
from .checkpoint import CheckpointManager  # noqa: F401
from .loop import Session  # noqa: F401
