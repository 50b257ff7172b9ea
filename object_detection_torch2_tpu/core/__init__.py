from object_detection_torch2_tpu.core import anchors, boxes, multibox  # noqa: F401
