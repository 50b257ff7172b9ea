from object_detection_torch2_tpu.ops.scores import (  # noqa: F401
    calc_scores,
    expand_detections,
    top_k_detections,
)
from object_detection_torch2_tpu.ops.nms import non_maximum_suppression  # noqa: F401
