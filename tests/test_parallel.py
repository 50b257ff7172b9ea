"""Data-parallel mesh: sharding correctness and single-vs-multi-device equivalence."""

import jax.numpy as jnp
import numpy as np

from object_detection_torch2_tpu.parallel import batch_sharding, make_mesh, replicated_sharding, shard_batch
from tests.test_train import _tiny_setup


def test_mesh_has_8_virtual_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 CPU devices
    assert mesh.axis_names == ("data",)


def test_shard_batch_layout():
    mesh = make_mesh()
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    xs = shard_batch(mesh, x)
    assert xs.sharding == batch_sharding(mesh)
    # each device holds exactly one row
    assert xs.addressable_shards[0].data.shape == (1, 4)
    np.testing.assert_array_equal(np.asarray(xs), x)


def test_dp_equals_single_device():
    """The DP-sharded train step must produce the same loss and parameters as
    the unsharded one (the all-reduce is exact for this reduction)."""
    trainer1, state1, images, targets = _tiny_setup(mesh=None)
    mesh = make_mesh()
    trainer8, state8, _, _ = _tiny_setup(mesh=mesh)

    # identical init (same seed) — confirm
    np.testing.assert_array_equal(
        np.asarray(state1.params["det_4_3"]["kernel"]), np.asarray(state8.params["det_4_3"]["kernel"])
    )

    im8, tg8 = trainer8.place_batch(images, targets)
    losses1, losses8 = [], []
    for _ in range(3):
        state1, l1 = trainer1.train_step(state1, jnp.asarray(images), jnp.asarray(targets))
        state8, l8 = trainer8.train_step(state8, im8, tg8)
        losses1.append(float(l1))
        losses8.append(float(l8))
    np.testing.assert_allclose(losses1, losses8, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state1.params["det_4_3"]["kernel"]),
        np.asarray(state8.params["det_4_3"]["kernel"]),
        rtol=1e-5,
        atol=1e-7,
    )


def test_replicated_state_sharding():
    mesh = make_mesh()
    _, state, _, _ = _tiny_setup(mesh=mesh)
    kernel = state.params["det_4_3"]["kernel"]
    assert kernel.sharding == replicated_sharding(mesh)
