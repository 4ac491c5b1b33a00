from gansynth_tpu.train.state import TrainState, create_train_state  # noqa: F401
from gansynth_tpu.train.schedule import (  # noqa: F401
    ProgressiveSchedule,
    schedule_from_config,
)
from gansynth_tpu.train.step import (  # noqa: F401
    cached_batch_indices,
    make_cached_superstep,
    make_superstep,
    make_train_step,
)
