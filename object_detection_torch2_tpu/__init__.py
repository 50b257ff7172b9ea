"""object_detection_torch2_tpu — a TPU-native (JAX/Flax/XLA/Pallas) object-detection
framework providing the full capabilities of the reference `rs1004/object-detection-torch2`
(a from-scratch PyTorch SSD300 pipeline on PASCAL VOC 2007+2012).

The compute path is pure JAX: the SSD forward, anchor matching, MultiBox loss with
hard-negative mining, box decode, scoring, and NMS all compile into fused XLA programs.
Scaling is expressed with `jax.sharding.Mesh` + NamedSharding data parallelism
(see `object_detection_torch2_tpu.parallel`).

Numeric semantics intentionally reproduce the reference, including its documented
quirks (see SURVEY.md §7): H-major transposed anchor grid (Q4), match threshold 0.25,
no variance scaling in box deltas (Q6), class-agnostic NMS, one-class-kept scores,
and the recall-equivalent "average precision" metric (Q5, with a strict AP available).
"""

__version__ = "0.1.0"

from object_detection_torch2_tpu.core import anchors, boxes, multibox  # noqa: F401
from object_detection_torch2_tpu.data.labelmap import LabelMap  # noqa: F401
