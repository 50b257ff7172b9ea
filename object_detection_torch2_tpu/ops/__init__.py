from object_detection_torch2_tpu.ops.scores import calc_scores  # noqa: F401
from object_detection_torch2_tpu.ops.nms import non_maximum_suppression  # noqa: F401
