from object_detection_torch2_tpu.train.optimizer import adam_torch, exponential_epoch_schedule  # noqa: F401
from object_detection_torch2_tpu.train.state import TrainState, partition_params  # noqa: F401
from object_detection_torch2_tpu.train.trainer import Trainer  # noqa: F401
