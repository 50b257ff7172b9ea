"""Shared CLI plumbing for train/inference/evaluate entry points."""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from object_detection_torch2_tpu.data.labelmap import LabelMap
from object_detection_torch2_tpu.models.convert import merge_variables, ssd_trunk_from_vgg16_variables
from object_detection_torch2_tpu.models.ssd import SSD
from object_detection_torch2_tpu.train import checkpoint as ckpt
from object_detection_torch2_tpu.utils.cache import enable_compilation_cache


def enable_cli_caches():
    """Persistent XLA compile cache — SSD300 compiles take minutes; repeats
    should not. Called from each CLI's main() (NOT at import time) so library
    importers of cli.common keep their own jax config (advisor r2)."""
    enable_compilation_cache()


# reference data roots were hardcoded (reference: train.py:43, 50); here they are flags
DEFAULT_TRAIN_DIRS = ["/work/data/VOCdevkit/VOC2007", "/work/data/VOCdevkit/VOC2012"]
DEFAULT_TEST_DIRS = ["/work/data/VOCdevkit/VOC2007"]

DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def add_common_args(parser, batch_size_default: int):
    parser.add_argument("--imsize", type=int, default=300)
    parser.add_argument("--batch_size", type=int, default=batch_size_default)
    parser.add_argument("--num_workers", type=int, default=8,
                        help="decode worker processes for the raw-VOC path (reference "
                             "parity default 8, src/train.py:23); the --records_dir fast "
                             "path is memmap-bound and ignores this")
    parser.add_argument("--result_dir", type=str, default="./result")
    parser.add_argument("--weights", type=str, default="weights.msgpack")
    # TPU-native extensions
    parser.add_argument("--data_dirs", type=str, nargs="+", default=None)
    parser.add_argument("--records_dir", type=str, default=None, help="packed records (data/records.py)")
    parser.add_argument("--dtype", type=str, choices=list(DTYPES), default="bfloat16")
    parser.add_argument("--max_gt", type=int, default=64)
    parser.add_argument("--num_devices", type=int, default=None)
    parser.add_argument(
        "--bn_mode",
        choices=["batch", "running"],
        default="batch",
        help="parity default 'batch': the reference never calls .eval() (quirk Q9)",
    )


def add_serving_args(parser):
    """Flags shared by the serving CLIs (inference/evaluate) beyond
    add_common_args."""
    parser.add_argument("--trunk_int8", action="store_true",
                        help="serve the frozen VGG trunk's blocks 2-5 on the MXU int8 path "
                             "(models/quant.py); activation scales are read from "
                             "<result_dir>/detection/quant.json (written by train.py --trunk_int8)")
    parser.add_argument("--full_int8", action="store_true",
                        help="serve the WHOLE model on the int8 path (trunk + extras + "
                             "detector heads — at inference everything is frozen, "
                             "models/quant.py FULL_QUANT_LAYERS). Scales come from "
                             "<result_dir>/detection/quant_full.json, auto-calibrated over "
                             "the first --calib_batches batches of this run's dataset when "
                             "absent/stale. Check the measured mAP A/B (INT8_BUDGET.json "
                             "full_int8 section) before enabling in production")
    parser.add_argument("--calib_batches", type=int, default=8,
                        help="batches for --full_int8 auto-calibration")
    parser.add_argument("--calib_margin", type=float, default=1.25,
                        help="headroom factor on --full_int8 calibrated abs-maxes")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host data-parallel serving: jax.distributed.initialize() "
                             "(auto-detected on TPU pods; gloo on CPU clusters), mesh over ALL "
                             "global devices, each process loads/fetches only its slice of "
                             "every batch; eval metrics are all-gathered at the end "
                             "(metrics/ap.py merge_accumulators_across_processes)")


def init_serving_distributed(args):
    """Initialize jax.distributed for --distributed serving (before any
    device query). Returns (process_index, process_count)."""
    import jax

    if getattr(args, "distributed", False):
        from object_detection_torch2_tpu.parallel import init_distributed

        init_distributed()
    return jax.process_index(), jax.process_count()


def serving_mesh(args):
    """Data-parallel mesh for the serving CLIs (inference/evaluate): all local
    devices by default, capped by --num_devices, reduced to the largest count
    that divides --batch_size (batches shard evenly; a 1-device mesh is the
    single-chip case). The reference serves strictly single-device
    (reference: src/inference.py:42, src/evaluate.py:103).

    Multi-process (--distributed): the mesh spans ALL global devices —
    batch_size must divide exactly over them (per-process slices and
    per-device shards must be equal-shaped; no silent device-count
    reduction)."""
    import jax

    from object_detection_torch2_tpu.parallel import make_mesh

    avail = len(jax.devices())
    if jax.process_count() > 1:
        n = args.num_devices or avail
        if n != avail:
            raise ValueError(f"--num_devices {n} unsupported with --distributed (global mesh "
                             f"uses all {avail} devices)")
        if args.batch_size % avail:
            raise ValueError(f"--distributed: batch_size {args.batch_size} must divide over "
                             f"all {avail} global devices")
        return make_mesh(avail)
    n = min(args.num_devices or avail, avail)
    while args.batch_size % n:
        n -= 1
    if n < min(args.num_devices or avail, avail):
        print(f"note: serving on {n} device(s) — batch_size {args.batch_size} "
              f"does not divide over {args.num_devices or avail}")
    return make_mesh(n)


def build_ssd(args, weights_path: Path):
    """SSD model + variables, honoring the reference's auto-load order
    (reference: ssd.py:25, 79-84): full SSD weights if present, else VGG16
    classification weights for the trunk, else random init."""
    labelmap = LabelMap("PascalVOC")
    num_classes = len(labelmap) + 1
    model = SSD(num_classes=num_classes, dtype=DTYPES[args.dtype])

    variables = None
    if weights_path.exists():
        print("weights loaded.")
        variables = ckpt.load_weights(weights_path)
    else:
        import jax

        rng = jax.random.PRNGKey(0)
        variables = model.init(rng, jnp.zeros((1, args.imsize, args.imsize, 3)), train=False)
        variables = {"params": dict(variables["params"]), "batch_stats": dict(variables["batch_stats"])}
        vgg_path = Path(args.result_dir) / "classification" / args.weights
        if vgg_path.exists():
            print("vgg16 trunk weights loaded.")
            vgg_vars = ckpt.load_weights(vgg_path)
            variables = merge_variables(variables, ssd_trunk_from_vgg16_variables(vgg_vars))
    return model, variables, labelmap


def apply_trunk_int8(args, model, variables):
    """Serving-side --trunk_int8: clone the model onto the int8 trunk path and
    inject the calibrated 'quant' collection (written by train.py's
    auto-calibration) into the variables."""
    from object_detection_torch2_tpu.models.quant import load_quant

    qp = Path(args.result_dir) / "detection" / "quant.json"
    if not qp.exists():
        raise SystemExit(f"--trunk_int8: {qp} not found — run train.py --trunk_int8 "
                         f"(auto-calibrates and saves it) first")
    variables = dict(variables)
    variables["quant"] = {k: jnp.asarray(v, jnp.float32) for k, v in load_quant(qp).items()}
    return model.clone(trunk_int8=True), variables


def apply_full_int8(args, model, variables, batches):
    """Serving-side --full_int8: clone the model onto the full int8 path
    (trunk + extras + heads) and inject calibrated scales. Scales are read
    from <result_dir>/detection/quant_full.json when present and complete,
    else calibrated over `batches` (an iterable of uint8 image batches from
    the run's own dataset — the serving distribution, standard PTQ practice)
    and saved there."""
    import json as _json

    from object_detection_torch2_tpu.models.quant import (
        FULL_QUANT_LAYERS,
        calibrate_full,
        missing_layers,
        save_quant,
    )

    qp = Path(args.result_dir) / "detection" / "quant_full.json"
    scales = None
    if qp.exists():
        scales = _json.loads(qp.read_text())
        stale = missing_layers(scales, FULL_QUANT_LAYERS)
        if stale:
            print(f"quant_full.json is stale (no amax for {stale}) — recalibrating")
            scales = None
        else:
            print("full-int8 scales loaded.")
    if scales is None:
        scales = calibrate_full(model, variables, batches, margin=args.calib_margin)
        qp.parent.mkdir(parents=True, exist_ok=True)
        save_quant(qp, scales)
        print(f"full-int8 scales calibrated ({args.calib_batches} batches, "
              f"margin {args.calib_margin}) -> {qp}")
    variables = dict(variables)
    variables["quant"] = {k: jnp.asarray(v, jnp.float32) for k, v in scales.items()}
    return model.clone(full_int8=True), variables


def calib_image_batches(loader, n_batches: int):
    """First n_batches image batches of a DataLoader (fresh iterator — the
    caller's main loop re-iterates from the start), for int8 calibration."""
    it = iter(loader)
    for _ in range(n_batches):
        try:
            images, _ = next(it)
        except StopIteration:
            return
        yield np.asarray(images)


def batched(iterable_len: int, batch_size: int):
    for start in range(0, iterable_len, batch_size):
        yield start, min(start + batch_size, iterable_len)


def pad_batch(images: np.ndarray, batch_size: int):
    """Pad a short final batch to the static batch size (avoids a recompile);
    returns (padded, real_count)."""
    n = images.shape[0]
    if n == batch_size:
        return images, n
    pad = np.repeat(images[-1:], batch_size - n, axis=0)
    return np.concatenate([images, pad], axis=0), n


def pad_rows(arr: np.ndarray, rows: int) -> np.ndarray:
    """Pad to `rows` rows (repeat-last, or zeros when empty — a process whose
    final --distributed slice is empty still contributes equal-shaped pad
    rows; they are masked out downstream via n_real)."""
    n = arr.shape[0]
    if n == rows:
        return arr
    filler = (np.zeros((rows - n, *arr.shape[1:]), arr.dtype) if n == 0
              else np.repeat(arr[-1:], rows - n, axis=0))
    return np.concatenate([arr, filler], axis=0)
