from fewbit_tpu.train.data import load_glue, synthetic_glue  # noqa: F401
from fewbit_tpu.train.loop import (  # noqa: F401
    TrainConfig, TrainState, create_train_state, make_eval_step,
    make_optimizer, make_schedule, make_train_step, restore_checkpoint,
    save_checkpoint)
