from object_detection_torch2_tpu.data.labelmap import LabelMap  # noqa: F401
