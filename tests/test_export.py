"""Weight interop: framework -> torch-layout -> framework roundtrips losslessly."""

import jax
import numpy as np

from object_detection_torch2_tpu.models.convert import (
    ssd_variables_from_torch,
    vgg16_variables_from_torch,
)
from object_detection_torch2_tpu.utils.testing import synth_state_dict_from_manifest
from tools.export_torch import ssd_state_dict, vgg16_state_dict


def _roundtrip(goldens, golden_name, to_torch, from_torch):
    g = goldens(golden_name)
    # layout conversion is size-independent; cap dims so the VGG classifier's
    # ~240M synthetic params don't dominate suite runtime
    shapes = np.minimum(np.asarray(g["manifest_shapes"]), 128)
    sd = synth_state_dict_from_manifest(g["manifest_keys"], shapes)
    variables = from_torch(sd)
    sd2 = to_torch(variables)
    # every original tensor (minus counters) survives bit-exactly
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        assert k in sd2, f"missing key {k}"
        np.testing.assert_array_equal(np.asarray(sd2[k]), v, err_msg=k)
    variables2 = from_torch({k: np.asarray(v) for k, v in sd2.items()})
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(variables),
        jax.tree_util.tree_leaves_with_path(variables2),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ssd_export_roundtrip(goldens):
    _roundtrip(goldens, "ssd_forward", ssd_state_dict, ssd_variables_from_torch)


def test_vgg16_export_roundtrip(goldens):
    _roundtrip(goldens, "vgg_forward", vgg16_state_dict, vgg16_variables_from_torch)
