"""Data layer: VOC parsing, collate padding, records packing, loader, augmentation."""

from pathlib import Path

import jax
import numpy as np
import pytest

from object_detection_torch2_tpu.data.augment import augment_batch, to_tensor_batch
from object_detection_torch2_tpu.data.loader import DataLoader
from object_detection_torch2_tpu.data.records import RecordDataset, pack_voc
from object_detection_torch2_tpu.data.voc import PascalVOCDataset, collate

FIXTURE = Path(__file__).parent / "fixtures" / "voc" / "VOCtest"


@pytest.fixture(scope="module")
def ds():
    return PascalVOCDataset("detection", [FIXTURE], "trainval.txt", imsize=96)


def test_detection_dataset(ds):
    assert len(ds) == 4
    img, gt = ds[0]
    assert img.shape == (96, 96, 3) and img.dtype == np.uint8
    assert gt.shape == (2, 25)
    # 000001: dog (id 11 -> one-hot idx 16 incl. void shift) at center-form coords
    dog = gt[0]
    np.testing.assert_allclose(dog[0], (48 + 195) / 2 / 500, rtol=1e-6)  # cx
    np.testing.assert_allclose(dog[3], (371 - 240) / 375, rtol=1e-6)  # h
    assert dog[4 + 11 + 1] == 1.0 and dog[4:].sum() == 1.0


def test_empty_annotation(ds):
    img, gt = ds[3]  # 000004 has no objects
    assert gt.shape == (0, 25)


def test_classification_dataset():
    ds = PascalVOCDataset("classification", [FIXTURE], "trainval.txt", imsize=64)
    assert len(ds) == 6  # one sample per object
    img, gt = ds[0]
    assert img.shape == (64, 64, 3)
    assert gt.shape == (20,) and gt.sum() == 1.0


def test_invalid_purpose():
    with pytest.raises(ValueError):
        PascalVOCDataset("segmentation", [FIXTURE], "trainval.txt", 96)


def test_collate_pads_static(ds):
    batch = [ds[i] for i in range(4)]
    images, gts = collate(batch, max_gt=8)
    assert images.shape == (4, 96, 96, 3)
    assert gts.shape == (4, 8, 25)
    assert gts[3].sum() == 0  # empty image fully padded
    assert (gts[2, 3:] == 0).all()  # 3 real boxes, rest zero


def test_collate_warns_on_gt_truncation(ds):
    """The reference never drops GT (pad_sequence to the batch max —
    src/utils.py:8-16); the static bound must not lose boxes silently."""
    import warnings

    batch = [ds[i] for i in range(3)]
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        _, gts = collate(batch, max_gt=2)  # image 2 has 3 boxes
    assert gts.shape[1] == 2
    assert any("truncating to max_gt=2" in str(w.message) for w in caught)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        collate(batch, max_gt=8)  # roomy bound: silent
    assert not caught


def test_records_roundtrip(tmp_path, ds):
    rec = pack_voc([FIXTURE], "trainval.txt", tmp_path / "rec", imsize=96, max_gt=8, log_every=0)
    assert len(rec) == 4
    images, gts = rec.batch(np.array([0, 2]))
    img0, gt0 = ds[0]
    np.testing.assert_array_equal(images[0], img0)
    np.testing.assert_allclose(gts[0, :2], gt0)
    assert rec.meta["seen_max_gt"] == 3
    # reopen from disk
    rec2 = RecordDataset(tmp_path / "rec")
    np.testing.assert_array_equal(rec2.batch(np.array([1]))[0], rec.batch(np.array([1]))[0])


def test_loader_shapes_and_epoch_shuffle(tmp_path):
    rec = pack_voc([FIXTURE], "trainval.txt", tmp_path / "rec2", imsize=96, max_gt=8, log_every=0)
    dl = DataLoader(rec, batch_size=2, shuffle=True, seed=1, max_gt=8)
    batches = list(dl)
    assert len(batches) == len(dl) == 2
    images, gts = batches[0]
    assert images.shape == (2, 96, 96, 3) and gts.shape == (2, 8, 25)


def test_augment_batch_flip_semantics():
    rng = jax.random.PRNGKey(0)
    images = np.zeros((4, 32, 32, 3), np.uint8)
    images[:, :, :16, 0] = 255  # left half red
    gts = np.zeros((4, 2, 25), np.float32)
    gts[:, 0, :4] = [0.25, 0.5, 0.2, 0.2]
    gts[:, 0, 5] = 1.0
    out_img, out_gt = augment_batch(rng, images, gts, p_jitter=0.0, p_flip=1.0, p_erase=0.0)
    assert out_img.shape == (4, 32, 32, 3) and out_img.dtype == np.float32
    # flipped: red now on the right, cx reflected, padded row untouched
    assert np.asarray(out_img)[0, 0, -1, 0] > 0.9 and np.asarray(out_img)[0, 0, 0, 0] < 0.1
    np.testing.assert_allclose(np.asarray(out_gt)[:, 0, 0], 0.75, atol=1e-6)
    assert np.asarray(out_gt)[:, 1].sum() == 0


def test_augment_batch_jitter_and_erase_bounds():
    rng = jax.random.PRNGKey(1)
    images = np.random.default_rng(0).integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    gts = np.zeros((2, 1, 25), np.float32)
    out_img, _ = augment_batch(rng, images, gts, p_jitter=1.0, p_flip=0.5, p_erase=1.0, max_iter=3)
    arr = np.asarray(out_img)
    assert arr.min() >= 0.0 and arr.max() <= 1.0
    # erasing must have zeroed some pixels
    assert (arr == 0).sum() > 0


def test_to_tensor_batch():
    images = np.full((1, 4, 4, 3), 255, np.uint8)
    out = np.asarray(to_tensor_batch(images))
    np.testing.assert_allclose(out, 1.0)


def test_synth_voc_tree_parses(tmp_path):
    """tools/synth_voc.py output must round-trip through PascalVOCDataset in
    both purposes (the generalization proof depends on this)."""
    from tools.synth_voc import generate

    from object_detection_torch2_tpu.data.voc import PascalVOCDataset

    generate(tmp_path, n_train=3, n_test=2, seed=1)
    ds = PascalVOCDataset("detection", [str(tmp_path)], "trainval.txt", 300)
    assert len(ds) == 3
    image, gt = ds[0]
    assert image.shape == (300, 300, 3) and image.dtype == np.uint8
    assert gt.shape[1] == 4 + 21 and len(gt) >= 1
    # boxes normalized and inside the image; one-hot rows sum to 1 (non-void)
    assert (gt[:, :4] >= 0).all() and (gt[:, :4] <= 1).all()
    assert (gt[:, 4:].sum(axis=1) == 1).all() and (gt[:, 4] == 0).all()

    test_ds = PascalVOCDataset("classification", [str(tmp_path)], "test.txt", 100)
    crop, onehot = test_ds[0]
    assert crop.shape == (100, 100, 3) and onehot.shape == (20,)


def test_loader_num_workers_equivalence():
    """Multiprocess decode workers (data/ingest.py — the reference's
    num_workers concurrency, src/train.py:23) must yield batch-for-batch
    identical arrays to the in-thread path, in the same order."""
    ds = PascalVOCDataset("detection", [FIXTURE], "trainval.txt", imsize=96)
    dl0 = DataLoader(ds, batch_size=2, shuffle=True, seed=3, max_gt=8, num_workers=0)
    dl2 = DataLoader(ds, batch_size=2, shuffle=True, seed=3, max_gt=8, num_workers=2)
    try:
        for (im0, gt0), (im2, gt2) in zip(dl0, dl2, strict=True):
            np.testing.assert_array_equal(np.asarray(im0), np.asarray(im2))
            np.testing.assert_array_equal(np.asarray(gt0), np.asarray(gt2))
        # second epoch reuses the persistent pool (new shuffle order)
        for (im0, gt0), (im2, gt2) in zip(dl0, dl2, strict=True):
            np.testing.assert_array_equal(np.asarray(im0), np.asarray(im2))
    finally:
        dl2.close()


def test_pack_voc_num_workers_equivalence(tmp_path):
    """pack_voc with decode workers writes byte-identical records."""
    r0 = pack_voc([FIXTURE], "trainval.txt", tmp_path / "w0", imsize=96, max_gt=8, log_every=0)
    r2 = pack_voc([FIXTURE], "trainval.txt", tmp_path / "w2", imsize=96, max_gt=8, log_every=0,
                  num_workers=2)
    np.testing.assert_array_equal(np.asarray(r0.images), np.asarray(r2.images))
    np.testing.assert_array_equal(np.asarray(r0.gts), np.asarray(r2.gts))
    assert r0.meta["seen_max_gt"] == r2.meta["seen_max_gt"]


def test_loader_propagates_producer_errors():
    """A decode error mid-epoch must raise in the consumer, not silently
    truncate the epoch (the prefetch thread used to swallow it)."""
    import pytest

    from object_detection_torch2_tpu.data.loader import DataLoader

    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                raise OSError("corrupt image")
            return np.zeros((8, 8, 3), np.uint8), np.zeros((1, 25), np.float32)

    loader = DataLoader(Broken(), batch_size=2, max_gt=1)
    with pytest.raises(OSError, match="corrupt image"):
        list(loader)
