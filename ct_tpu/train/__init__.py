from ct_tpu.train.solver import (  # noqa: F401
    build_optimizer, warmup_multistep_schedule,
)
from ct_tpu.train.step import TrainState, make_train_step  # noqa: F401
