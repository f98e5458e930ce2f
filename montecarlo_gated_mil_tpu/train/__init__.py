from montecarlo_gated_mil_tpu.train.criteria import (  # noqa: F401
    bce_on_probs,
    cross_entropy,
    make_criterion,
)
from montecarlo_gated_mil_tpu.train.loops import (  # noqa: F401
    mc_test,
    mc_validate,
    test,
    train_epoch,
    train_epoch_plain,
    validate,
)
from montecarlo_gated_mil_tpu.train.optim import make_optimizer, make_schedule  # noqa: F401
from montecarlo_gated_mil_tpu.train.state import (  # noqa: F401
    Checkpointer,
    EarlyStopping,
    TrainState,
    make_train_step,
)
