from gansynth_tpu.train.state import TrainState, create_train_state  # noqa: F401
from gansynth_tpu.train.schedule import ProgressiveSchedule  # noqa: F401
from gansynth_tpu.train.step import make_train_step  # noqa: F401
