from object_detection_torch2_tpu.models.ssd import SSD  # noqa: F401
from object_detection_torch2_tpu.models.vgg16 import VGG16  # noqa: F401
