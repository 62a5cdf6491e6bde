from .trainer import (  # noqa: F401
    TrainState,
    build_optimizer,
    make_mesh,
    make_train_step,
    make_eval_step,
    init_state,
)
