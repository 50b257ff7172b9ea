"""Library-level Predictor: batched detect with ragged final batch."""

import jax
import jax.numpy as jnp
import numpy as np

from object_detection_torch2_tpu.infer import Predictor
from object_detection_torch2_tpu.models.ssd import SSD


def test_predictor_ragged_batches():
    model = SSD(num_classes=21)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)), train=False)
    pred = Predictor(model, variables, batch_size=2)

    images = np.random.default_rng(0).integers(0, 255, (3, 300, 300, 3)).astype(np.uint8)
    dets = pred.predict(images)
    assert len(dets) == 3  # padding image discarded
    for d in dets:
        assert d.boxes.ndim == 2 and d.boxes.shape[1] == 4
        assert len(d.boxes) == len(d.class_ids) == len(d.scores)
        if len(d.class_ids):
            assert d.class_ids.min() >= 0 and d.class_ids.max() <= 19
            assert (d.scores > 0).all()
