from object_detection_torch2_tpu.metrics.ap import average_precision  # noqa: F401
from object_detection_torch2_tpu.metrics.assign import detection_matches  # noqa: F401
