"""Int8 post-training quantization for the frozen VGG trunk.

Why this exists: the flagship recipe trains heads+extras only — the VGG trunk
is frozen by reference parity (reference: src/model/ssd.py:160-179 excludes
the trunk from `train_params()`, and :31-32 sets requires_grad=False). Frozen
weights are inference-only constants even during training, so the trunk's
convs can run on the v5e MXU's double-rate int8 path (394 TOPS vs 197 bf16
TFLOP/s). Measured on this model's trunk shapes (tools/bench_int8_conv.py):
s8xs8->s32 `lax.conv_general_dilated` runs 1.9-2.4x faster than bf16.

Scheme (standard symmetric PTQ):
- weights: per-output-channel symmetric scales, sw[c] = amax(|W[...,c]|)/127,
  quantized IN-GRAPH from the frozen f32 params every step (the trunk is
  ~7.6M params — microseconds — and keeping the quantization in-graph means
  checkpoints, converters and the .pth bridge are untouched).
- activations: per-tensor symmetric scales from offline abs-max calibration
  (models/ssd.py `quant_calibrate` mode). Static scales are the whole perf
  point: the quantize is a pure elementwise tail (div/round/clip/convert)
  that XLA fuses into the producer's BN-normalize+ReLU kernel, so the
  inter-layer activation lands in HBM as int8 (half the bf16 bytes) with NO
  extra pass. A dynamic (abs-max-of-this-tensor) scale would force the float
  tensor to materialize first. Every quantized input sits after batch-stat
  BatchNorm (quirk Q9: batch stats always), so its distribution is
  self-normalized per batch and static scales hold (see BF16/INT8 budget
  notes in README).
- accumulation: int32 (preferred_element_type), dequantized in the conv
  epilogue by the fused scalar sx*sw[c], then bias/BN/ReLU proceed in the
  model's float compute dtype exactly as the bf16 path.

No gradient ever flows through these ops: the trunk is upstream of all
trainable parameters, and grads of heads/extras only need the trunk's OUTPUT
activations. `Trainer.init_state` enforces the frozen-trunk precondition.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp

# Quantized trunk layers: conv_1_2 and blocks 2-5 (all 3x3/s1/p1, C_in >= 64).
# conv_1_1 itself stays float (C_in=3 — no MXU win to quantize, and its input
# is the image), but quantizing conv_1_2's INPUT halves conv_1_1's output
# store — the store-bound layer's dominant cost (184 MB bf16 at bs32) — since
# the quantize fuses into bn_1_1+relu's epilogue and the activation lands in
# HBM as int8. In the paired-x layout conv_1_2 runs the staggered int8 conv
# (models/ssd.py conv12_staggered_int8), bit-identical to the plain int8 conv.
QUANT_LAYERS = ("1_2", "2_1", "2_2", "3_1", "3_2", "3_3", "4_1", "4_2", "4_3", "5_1", "5_2", "5_3")

# Serving-side FULL-model quantization (SSD.full_int8): at inference
# *everything* is frozen, not just the trunk (reference: src/inference.py:55-69
# serves under no_grad with no parameter updates), so the extra layers and the
# six detector heads are int8-eligible by the same constants-only argument.
# Heads have no BN/ReLU after them — their int8 error lands directly on the
# box/class logits, which is why full_int8 is gated on a measured mAP budget
# (tools/bench_infer.py --full_int8 A/B) rather than assumed safe.
EXTRA_QUANT_LAYERS = ("6_1", "7_1", "8_1", "8_2", "9_1", "9_2", "10_1", "10_2", "11_1", "11_2")
HEAD_QUANT_LAYERS = ("det_4_3", "det_7_1", "det_8_2", "det_9_2", "det_10_2", "det_11_2")
FULL_QUANT_LAYERS = QUANT_LAYERS + EXTRA_QUANT_LAYERS + HEAD_QUANT_LAYERS


def weight_scales(w: jax.Array) -> jax.Array:
    """(kh,kw,cin,cout) -> per-output-channel symmetric scales (cout,) f32."""
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2)) / 127.0
    return jnp.maximum(s, jnp.float32(1e-12))


def quantize_weight(w: jax.Array, scales: jax.Array) -> jax.Array:
    """Symmetric round-to-nearest-even int8 weights; scales broadcast (cout,)."""
    q = jnp.round(w.astype(jnp.float32) / scales)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def quantize_act(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Per-tensor symmetric int8 activation quantization (saturating)."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def int8_conv(x8: jax.Array, w8: jax.Array, stride: int = 1, pad: int = 1) -> jax.Array:
    """s8 x s8 -> s32 conv on the MXU int8 path (NHWC/HWIO)."""
    return jax.lax.conv_general_dilated(
        x8, w8, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def fake_quant_conv(x, w, scale, stride: int = 1, pad: int = 1):
    """Float simulation of quantize->int8 conv->dequant: same rounding, same
    clipping, conv in f32 over the dequantized operands. NOT bitwise equal to
    the int32 path (an f32 accumulator rounds once partial sums exceed 2^24;
    tests use an exact numpy int32 oracle instead) — this is the reference
    for ACCURACY comparisons, quantization error included, arithmetic error
    negligible."""
    sw = weight_scales(w)
    xq = quantize_act(x, scale).astype(jnp.float32) * scale
    wq = quantize_weight(w, sw).astype(jnp.float32) * sw
    return jax.lax.conv_general_dilated(
        xq, wq, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )


def calibrate_trunk(model, variables: dict, batches, use_batch_stats: bool = True,
                    margin: float = 1.0, up_to: str | None = "5_3") -> dict:
    """Run abs-max activation calibration over `batches` (already-preprocessed
    float/uint8 image arrays as the model consumes them, e.g. augmented
    training batches) and return the 'quant' collection: {amax_<layer>: float}.

    Uses the model's float path (quant_calibrate=True) so the observed
    distributions are exactly what the int8 path will quantize. Batch stats
    are read but their running-stat updates are DISCARDED (calibration must
    not advance training state). `margin` scales the recorded amaxes
    (headroom for distribution drift; 1.0 = pure abs-max). Every quantized
    layer sits in the trunk, so the forward runs only up to `up_to`
    (default '5_3' — extras/heads never execute during calibration)."""
    calib = model.clone(quant_calibrate=True, trunk_int8=False, full_int8=False)

    @jax.jit
    def step(quant, images):
        vars_in = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
        if quant is not None:
            vars_in["quant"] = quant
        _, upd = calib.apply(vars_in, images, train=False,
                             use_batch_stats=use_batch_stats, up_to=up_to,
                             mutable=["quant", "batch_stats"])
        return upd["quant"]

    quant = None
    for images in batches:
        images = jnp.asarray(images)
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        quant = step(quant, images)
    if quant is None:
        raise ValueError("calibrate_trunk needs at least one batch")
    return {k: float(v) * margin for k, v in quant.items()}


def calibrate_full(model, variables: dict, batches, use_batch_stats: bool = True,
                   margin: float = 1.0) -> dict:
    """Full-model activation calibration (trunk + extras + heads) for the
    serving-side `full_int8` path: same mechanics as `calibrate_trunk`, with
    the forward run through the detector heads (up_to=None) so every
    FULL_QUANT_LAYERS input records its abs-max."""
    quant = calibrate_trunk(model, variables, batches,
                            use_batch_stats=use_batch_stats, margin=margin, up_to=None)
    return check_calibrated(quant, layers=FULL_QUANT_LAYERS)


def save_quant(path, quant: dict) -> None:
    Path(path).write_text(json.dumps(quant, indent=1, sort_keys=True))


def load_quant(path) -> dict:
    quant = json.loads(Path(path).read_text())
    check_calibrated(quant)
    return quant


def missing_layers(quant: dict | None, layers=QUANT_LAYERS) -> list:
    """Quantized layers without a positive calibrated amax — non-empty for a
    quant.json written before the layer set grew (e.g. pre-'1_2' files)."""
    if not quant:
        return list(layers)
    return [l for l in layers if not (float(quant.get(f"amax_{l}", 0.0)) > 0.0)]


def check_calibrated(quant: dict | None, layers=QUANT_LAYERS) -> dict:
    """Raise unless every quantized layer has a positive calibrated amax."""
    if not quant:
        raise ValueError("trunk_int8 requires calibrated activation scales "
                         "(models/quant.py calibrate_trunk; cli: --quant_calibrate)")
    missing = missing_layers(quant, layers)
    if missing:
        raise ValueError(
            f"trunk_int8: uncalibrated/zero amax for layers {missing}. If this "
            f"quant.json predates an extension of QUANT_LAYERS it is stale — "
            f"delete it and rerun train.py --trunk_int8 (which recalibrates "
            f"and rewrites it), or recalibrate via models/quant.calibrate_trunk"
        )
    return quant


def saturation_rates(model, variables: dict, quant: dict, batches,
                     use_batch_stats: bool = True, up_to: str | None = "5_3",
                     layers=QUANT_LAYERS) -> dict:
    """Measured clip rates: for each quantized layer, the fraction of input
    activation entries whose |x| exceeds the calibrated amax — exactly the
    entries the int8 path saturates at ±127. A drifting input distribution
    (e.g. augmentation harsher than the calibration batches) shows up here as
    a rising rate; near-zero rates mean the static scales hold.

    Runs the float calibrate path (which sows each quantized input into
    'intermediates') and reduces ON DEVICE per batch. `quant` is the
    post-margin scales as used in production (quant.json contents)."""
    calib = model.clone(quant_calibrate=True, trunk_int8=False, full_int8=False)
    amaxes = {l: jnp.float32(quant[f"amax_{l}"]) for l in layers}

    @jax.jit
    def step(images):
        vars_in = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
        _, upd = calib.apply(vars_in, images, train=False,
                             use_batch_stats=use_batch_stats, up_to=up_to,
                             mutable=["quant", "batch_stats", "intermediates"])
        over, count = {}, {}
        for l in layers:
            (x,) = upd["intermediates"][f"qin_{l}"]
            over[l] = jnp.sum(jnp.abs(x.astype(jnp.float32)) > amaxes[l])
            count[l] = x.size
        return over, count

    total_over = {l: 0 for l in layers}
    total_n = {l: 0 for l in layers}
    for images in batches:
        images = jnp.asarray(images)
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        over, count = step(images)
        for l in layers:
            total_over[l] += int(over[l])
            total_n[l] += int(count[l])
    return {l: total_over[l] / max(total_n[l], 1) for l in layers}
