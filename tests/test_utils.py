"""Utilities: TensorBoard event writer, report, renderer, labelmap."""

import struct
from pathlib import Path

import numpy as np
import pytest

from object_detection_torch2_tpu.data.labelmap import LabelMap
from object_detection_torch2_tpu.utils.render import hls_palette, render_detections
from object_detection_torch2_tpu.utils.report import write_report
from object_detection_torch2_tpu.utils.tb import SummaryWriter, _masked_crc, crc32c


def test_crc32c_vector():
    assert crc32c(b"123456789") == 0xE3069283  # standard Castagnoli test vector


def test_labelmap():
    lm = LabelMap("PascalVOC")
    assert len(lm) == 20
    assert lm.name2id("dog") == 11
    assert lm.id2name(0) == "aeroplane"
    assert lm.id2name(19) == "tvmonitor"


def test_tb_writer_framing(tmp_path):
    w = SummaryWriter(log_dir=str(tmp_path))
    w.add_scalar("loss/train", 1.25, 3)
    w.add_scalar("lr", 1e-3, 3)
    w.close()

    files = list(Path(tmp_path).glob("events.out.tfevents.*"))
    assert len(files) == 1
    data = files[0].read_bytes()

    # walk the TFRecord framing, validating both CRCs of every record
    records = []
    off = 0
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        header = data[off : off + 8]
        (len_crc,) = struct.unpack_from("<I", data, off + 8)
        assert len_crc == _masked_crc(header)
        payload = data[off + 12 : off + 12 + length]
        (data_crc,) = struct.unpack_from("<I", data, off + 12 + length)
        assert data_crc == _masked_crc(payload)
        records.append(payload)
        off += 12 + length + 4
    assert off == len(data)
    assert len(records) == 3  # file_version + 2 scalars
    assert b"brain.Event:2" in records[0]
    assert b"loss/train" in records[1]
    assert struct.pack("<f", 1.25) in records[1]
    assert b"lr" in records[2]


def test_hls_palette_matches_seaborn():
    seaborn = pytest.importorskip("seaborn")
    ours = hls_palette(21)
    ref = seaborn.color_palette("hls", n_colors=21)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-6)


def test_render_detections_smoke():
    lm = LabelMap("PascalVOC")
    image = np.zeros((300, 300, 3), np.float32)
    locs = np.array([[0.5, 0.5, 0.4, 0.3], [0.2, 0.2, 0.1, 0.1]], np.float32)
    confs = np.zeros((2, 21), np.float32)
    confs[0, 12] = 0.9  # dog
    confs[1, 0] = 0.8  # void -> must be skipped
    img = render_detections(image, locs, confs, lm, imsize=300)
    arr = np.asarray(img)
    assert arr.shape == (300, 300, 3)
    assert arr.sum() > 0  # something was drawn
    # void box region untouched (top-left corner area away from dog box)
    assert arr[280:, :10].sum() == 0


def test_render_skips_offscreen_boxes():
    """Boxes entirely outside the image must be skipped, not crash PIL
    (clipping inverts the rectangle — latent edge case in the reference)."""
    lm = LabelMap("PascalVOC")
    image = np.zeros((300, 300, 3), np.float32)
    locs = np.array([[-0.5, 0.5, 0.2, 0.2], [1.4, 1.4, 0.1, 0.1]], np.float32)
    confs = np.zeros((2, 21), np.float32)
    confs[:, 5] = 0.9
    img = render_detections(image, locs, confs, lm, imsize=300)
    assert np.asarray(img).shape == (300, 300, 3)


def test_write_report(tmp_path):
    lm = LabelMap("PascalVOC")
    aps = np.linspace(0, 0.95, 20)
    path = write_report(tmp_path, {"imsize": 300, "batch_size": 2}, aps, float(np.mean(aps)), lm)
    text = path.read_text()
    assert "# EVALUATION REPORT" in text
    assert "|imsize|300|" in text
    assert "|aeroplane|0.0|" in text
    assert "|**mean**|**0.475**|" in text
    assert path.name.startswith("report_")


def test_fetch_pipeline_order_and_flush():
    """FetchPipeline yields every pushed item exactly once, in order, with a
    `depth`-item lag; jax Arrays get their D2H started at push time."""
    import jax.numpy as jnp

    from object_detection_torch2_tpu.utils.hostsync import FetchPipeline

    pipe = FetchPipeline(depth=2)
    got = []
    for i in range(5):
        done = pipe.push((jnp.full((4,), i), i))
        if done is not None:
            got.append(done)
    assert [i for _, i in got] == [0, 1, 2]  # item i pops at push i+depth
    got.extend(pipe.flush())
    assert [i for _, i in got] == [0, 1, 2, 3, 4]
    for arr, i in got:
        np.testing.assert_array_equal(np.asarray(arr), np.full((4,), i))


def test_fetch_pipeline_empty_flush():
    from object_detection_torch2_tpu.utils.hostsync import FetchPipeline

    assert list(FetchPipeline().flush()) == []


def test_compilation_cache_env(tmp_path, monkeypatch):
    """enable_compilation_cache honors JAX_COMPILATION_CACHE_DIR, including the
    empty-string disable convention."""
    import jax

    from object_detection_torch2_tpu.utils.cache import enable_compilation_cache

    before = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "xla"))
        assert enable_compilation_cache() == str(tmp_path / "xla")
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla")
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "")
        assert enable_compilation_cache() is None
    finally:
        jax.config.update("jax_compilation_cache_dir", before)
