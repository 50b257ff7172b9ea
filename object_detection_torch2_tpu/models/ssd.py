"""SSD300 detector as a Flax module, TPU-first (NHWC, bf16-capable, jit-friendly).

Architecture reproduces the reference (reference: src/model/ssd.py:22-106):

- vgg16_bn trunk with canonical layer names `conv_L_S` / `bn_L_S` (`pool_5` dropped,
  ssd.py:38-40). The `'M_P'` pools (pool_3, and pool_5 in plain VGG16) are
  MaxPool2d(k=2, s=2, padding=1) — the pad on pool_3 is what yields 38x38 at
  conv4_3 for 300x300 input (reference: src/model/vgg16.py:25-30).
- extra layers 6-11, each Conv+BN+ReLU (ssd.py:49-66). Note: layer 6 is a plain
  3x3 conv (no dilation) and every extra layer has BatchNorm — both deliberate
  deviations from the SSD paper that the reference makes.
- six 3x3 detector heads tapped after the ReLU of 4_3 / 7_1 / 8_2 / 9_2 / 10_2 /
  11_2, H-major flattened and concatenated to (N, 8732, num_classes+4)
  (ssd.py:70-77, 86-106 with bug B1 fixed to its intended dispatch — SURVEY.md).

TPU notes: activations flow NHWC so the head outputs reshape directly into the
reference's H-major anchor order (torch's permute(0,2,3,1) is the identity here).
Convs run in `dtype` (bfloat16 recommended on TPU — MXU-native); BatchNorm and the
final outputs stay float32 for numeric stability.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from object_detection_torch2_tpu.models.bn import BatchNormTPU

# ImageNet normalization (reference: src/model/vgg16.py:19-20)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# VGG16-bn conv blocks: block L -> (channels per conv, pool spec after block).
# Pool 'M' = valid 2x2/2; 'M_P' = 2x2/2 with padding 1 (reference: vgg16.py:25-30).
# Block 5's pool is dropped in SSD (reference: ssd.py:38-40).
VGG_BLOCKS = (
    (1, (64, 64), "M"),
    (2, (128, 128), "M"),
    (3, (256, 256, 256), "M_P"),
    (4, (512, 512, 512), "M"),
    (5, (512, 512, 512), None),
)

# Extra layers: (name, kernel, out_channels, stride, padding) (reference: ssd.py:49-54)
EXTRA_LAYERS = (
    ("6_1", 3, 1024, 1, 1),
    ("7_1", 1, 1024, 1, 0),
    ("8_1", 1, 256, 1, 0),
    ("8_2", 3, 512, 2, 1),
    ("9_1", 1, 128, 1, 0),
    ("9_2", 3, 256, 2, 1),
    ("10_1", 1, 128, 1, 0),
    ("10_2", 3, 256, 1, 0),
    ("11_1", 1, 128, 1, 0),
    ("11_2", 3, 256, 1, 0),
)

# Detection taps: layer suffix -> anchors-per-cell A (reference: ssd.py:70-77)
DETECTOR_TAPS = (("4_3", 4), ("7_1", 6), ("8_2", 6), ("9_2", 6), ("10_2", 4), ("11_2", 4))

# torch kaiming_normal_(mode='fan_out', nonlinearity='relu') (reference: ssd.py:144-146)
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def normalize_image(x: jax.Array) -> jax.Array:
    """(x - mean) / std per channel, NHWC, computed in float32 (reference: vgg16.py:103-115)."""
    x = x.astype(jnp.float32)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x - mean) / std


def max_pool_torch(x: jax.Array, pad: int) -> jax.Array:
    """2x2/2 max pool with torch's symmetric -inf padding semantics."""
    padding = ((pad, pad), (pad, pad)) if pad else "VALID"
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2), padding=padding)


class _ConvParams(nn.Module):
    """Parameter container with nn.Conv's exact param layout (kernel HWIO +
    bias), for layers whose computation applies TRANSFORMED weights (the
    paired-x block below). Checkpoints/converters see the standard layout."""

    kernel_shape: tuple
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", kaiming_out, self.kernel_shape, self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.kernel_shape[-1],), self.param_dtype)
        return kernel, bias


def pair_conv_weights(w: jax.Array) -> jax.Array:
    """Rewrite a stride-1 pad-1 3x3 conv kernel (3,3,cin,cout) into its exact
    equivalent (3,3,2*cin,2*cout) over the paired-x layout (N,H,W/2,2C), where
    channel slot q*C+c holds pixel phase q (x = 2j+q).

    Output pixel x=2j+p tap dx reads input pixel 2j+p+dx = cell j+s, phase q
    with (s, q) = divmod(p+dx, 2); kernel cell index kx = s+1 (pad 1). Half the
    paired kernel is structurally zero — the 2x FLOPs run on full 128-lane
    tiles instead of half-empty C=64 tiles, which profiling shows is >2x faster
    (and the padded-lane HBM footprint of every block-1 activation halves)."""
    _, _, cin, cout = w.shape
    wp = jnp.zeros((3, 3, 2 * cin, 2 * cout), w.dtype)
    for p in (0, 1):
        for dx in (-1, 0, 1):
            s, q = divmod(p + dx, 2)
            wp = wp.at[:, s + 1, q * cin:(q + 1) * cin, p * cout:(p + 1) * cout].set(w[:, dx + 1])
    return wp


def stagger_conv12_weights(w: jax.Array) -> jax.Array:
    """Rewrite a stride-1 pad-1 3x3 kernel (3,3,cin,cout) into the STAGGERED
    4-tap form (3,2,2*cin,2*cout) over the paired-x layout.

    pair_conv_weights' window must cover both output phases' taps at the same
    pair index, which forces a width-3 pair window where HALF the kernel is
    structural zeros (2x FLOPs). The stagger instead assigns output half A the
    even-phase result of pair j and output half B the ODD-phase result of pair
    j-1 — both consume exactly the window (P_{j-1}, P_j), so a width-2 pair
    window suffices and only 2 of 8 tap-blocks are zero: 4/3 of the dense
    FLOPs, still full 128-lane tiles, native XLA conv codegen. The
    one-pair-offset halves are realigned by two slices of a (W/2+1)-wide
    result (see conv12_staggered), which XLA fuses into the consumer."""
    _, _, cin, cout = w.shape
    w4 = jnp.zeros((3, 2, 2 * cin, 2 * cout), w.dtype)
    # half A: y_{2j} = K[-1] x_{2j-1} + K[0] x_{2j} + K[+1] x_{2j+1}
    w4 = w4.at[:, 0, cin:, :cout].set(w[:, 0])  # x_{2j-1} = P_{j-1}.odd
    w4 = w4.at[:, 1, :cin, :cout].set(w[:, 1])  # x_{2j}   = P_j.even
    w4 = w4.at[:, 1, cin:, :cout].set(w[:, 2])  # x_{2j+1} = P_j.odd
    # half B: y_{2j-1} = K[-1] x_{2j-2} + K[0] x_{2j-1} + K[+1] x_{2j}
    w4 = w4.at[:, 0, :cin, cout:].set(w[:, 0])  # x_{2j-2} = P_{j-1}.even
    w4 = w4.at[:, 0, cin:, cout:].set(w[:, 1])  # x_{2j-1} = P_{j-1}.odd
    w4 = w4.at[:, 1, :cin, cout:].set(w[:, 2])  # x_{2j}   = P_j.even
    return w4


def conv12_staggered(xp: jax.Array, w: jax.Array, b: jax.Array,
                     precision=jax.lax.Precision.HIGHEST, pad_pairs: int = 1) -> jax.Array:
    """conv_1_2 on the paired-x layout via the staggered 4-tap kernel: one
    width-padded VALID conv producing W/2+pad_pairs pair columns, then half A
    keeps columns [0, W/2) and half B keeps [1, W/2] (realigning its one-pair
    stagger). Exact same math as the block-sparse paired conv at 2/3 the
    FLOPs; the SAME-padding edge columns come from the width padding.

    pad_pairs >= 1 right-pads the intermediate width: 1 is the minimal exact
    form (151 columns at 300); larger values round the conv's output width up
    (e.g. 2 -> 152 = 8*19, a whole (8,128) sublane tile count) — identical
    result, the extra zero-input columns are sliced away before the concat."""
    wpl = xp.shape[2]
    cout = w.shape[-1]
    w4 = stagger_conv12_weights(w).astype(xp.dtype)
    out = jax.lax.conv_general_dilated(
        xp, w4, (1, 1), ((1, 1), (1, pad_pairs)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )
    y = jnp.concatenate([out[:, :, :wpl, :cout], out[:, :, 1:wpl + 1, cout:]], axis=-1)
    return y + jnp.tile(b, 2).astype(xp.dtype)


def conv12_staggered_int8(xp: jax.Array, w: jax.Array, b: jax.Array, sx: jax.Array,
                          dtype, pad_pairs: int = 1) -> jax.Array:
    """conv12_staggered on the MXU int8 path: quantize the paired input with
    its calibrated static scale (the quantize fuses into bn_1_1+relu's
    epilogue, so conv_1_1's store-bound output lands in HBM as int8 — half
    the bf16 bytes), quantize the BASE 3x3 kernel per-output-channel and
    stagger the int8 weights (the stagger only places blocks; its structural
    zeros are exact in int8), s8xs8->s32 conv, per-channel dequant + bias.

    Bit-identical to the plain-layout int8 conv (models/quant.py int8_conv on
    the unpaired tensor): the staggered form accumulates the same int8
    products in int32, and the dequant multiplies the same f32 scale values
    (tile(sw, 2) maps each paired slot to its base channel's scale)."""
    from object_detection_torch2_tpu.models import quant

    wpl = xp.shape[2]
    cout = w.shape[-1]
    sw = quant.weight_scales(w)
    w48 = stagger_conv12_weights(quant.quantize_weight(w, sw))
    y32 = jax.lax.conv_general_dilated(
        quant.quantize_act(xp, sx), w48, (1, 1), ((1, 1), (1, pad_pairs)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    # Dequant the FULL padded-width tensor, slice after (advisor r4 suggested
    # slicing the two wpl-wide windows first to skip epilogue work on the
    # pad_pairs throwaway columns — MEASURED on v5e: that formulation drops
    # the int8 train step 2098 -> 1522 img/s/chip. Slicing before the multiply
    # splits the dequant into two consumers, which breaks XLA's fusion of the
    # dequant into the conv epilogue and materializes the raw int32 conv
    # output to HBM at 4 B/elem; the <3% of wasted pad-column multiplies are
    # noise next to that. bf16 control unchanged, so this fusion is the whole
    # difference.)
    y = (y32.astype(jnp.float32) * (sx * jnp.tile(sw, 2))).astype(dtype)
    y = jnp.concatenate([y[:, :, :wpl, :cout], y[:, :, 1:wpl + 1, cout:]], axis=-1)
    return y + jnp.tile(b, 2).astype(dtype)


class SSD(nn.Module):
    """SSD300. Input (N, H, W, 3) in [0, 1]; output (N, 8732, num_classes + 4) float32.

    `train` gates BatchNorm running-stat updates (mutable 'batch_stats') and
    `use_batch_stats` selects batch vs running statistics. The reference never
    calls `.eval()` (quirk Q9, SURVEY.md), so its inference also normalizes with
    *batch* statistics — `use_batch_stats=None` follows that parity default
    (always batch stats); pass False explicitly for conventional inference.
    """

    num_classes: int = 21
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # 'highest' keeps f32 convs in true f32 (XLA's default lowers them to bf16
    # passes); irrelevant when dtype=bfloat16, which is the TPU fast path.
    precision: Any = jax.lax.Precision.HIGHEST
    # Run block 1 in the paired-x layout (two adjacent width-pixels folded into
    # channels): C=64 at 300x300 otherwise half-fills the TPU's 128-lane tiles,
    # leaving every block-1 conv/BN/pool at ~40-50% efficiency and doubling its
    # HBM footprint (profiled: conv_1_2 2.76ms at 39% MFU vs the same-FLOPs
    # conv_2_2 at 98%). Same math (see pair_conv_weights), same params/stats
    # layout, ulp-level reassociation drift only. Auto-disabled for odd sizes.
    paired_block1: bool = True
    # conv_1_2 via the Pallas 4-tap kernel (ops/conv12_pallas.py): 4/3 of the
    # dense FLOPs instead of the XLA block-sparse form's 2x, all K=128 MXU
    # dots. Measured on v5e (tools/bench_conv12.py, bs32 bf16): XLA paired
    # 3.35 ms vs kernel 10.9 ms — the 6-dot form pays ~13 VMEM traversals of
    # the f32 accumulator, which swamps the FLOP saving, so the XLA paired
    # conv stays the production default. None = auto = currently OFF
    # everywhere (flip to True to force; CPU tests force it with interpret).
    conv12_kernel: bool | None = None
    # conv_1_2 via the STAGGERED 4-tap XLA conv (stagger_conv12_weights): the
    # same 4/3-FLOP formulation as the Pallas kernel but expressed as ONE
    # native XLA conv + two fused slices — keeps XLA's implicit-im2col conv
    # codegen (the reason it beat Pallas) while dropping the paired form's 2x
    # structural-zero FLOPs. See tools/bench_conv12.py for the v5e wall-time
    # comparison of all three formulations.
    conv12_stagger: bool = True
    # Width padding for the staggered conv's intermediate (pair columns =
    # W/2 + pad_pairs; extra columns sliced away — bitwise-identical result,
    # tests/test_conv12_staggered.py). 1 = minimal (151 at 300, odd);
    # 2 rounds to 152 = 8*19 whole sublane tiles. Measured on v5e (bs32 bf16,
    # tools/bench_conv12.py --pad_pairs 1 2 4): 2.908 / 2.902 / 2.870 ms —
    # 4 (=154 columns) is the default (+1.3% on this conv).
    conv12_pad_pairs: int = 4
    # Run the frozen trunk's convs (conv_1_2 + blocks 2-5) on the MXU's
    # double-rate int8 path (v5e: 394 TOPS int8 vs 197 TFLOP/s bf16; measured
    # 1.9-2.4x on these shapes, tools/bench_int8_conv.py). conv_1_2 uses the
    # staggered int8 form (conv12_staggered_int8) — quantizing its input also
    # halves store-bound conv_1_1's output write. Weights are quantized in-graph from
    # the frozen f32 params (per-out-channel symmetric); activations use
    # static per-tensor scales from a calibrated 'quant' variable collection
    # ({amax_<layer>}) that MUST be supplied in `variables` (see
    # models/quant.py). BN/ReLU stay float; checkpoints are unchanged.
    # Legitimate only because the trunk is frozen (reference parity:
    # src/model/ssd.py:160-179) — Trainer.init_state enforces that.
    trunk_int8: bool = False
    # SERVING-ONLY: run the extras and detector heads on the int8 path too
    # (implies the trunk int8 path). At inference everything is frozen, not
    # just the trunk — the reference serves under no_grad with no updates
    # (src/inference.py:55-69) — so extras/heads are int8-eligible by the same
    # constants-only argument (models/quant.py FULL_QUANT_LAYERS). Requires a
    # FULL calibration (quant.calibrate_full); never legal in Trainer (extras/
    # heads are the TRAINABLE params — Trainer rejects it).
    full_int8: bool = False
    # conv_1_2 on the int8 staggered path when the trunk is int8. Measured on
    # v5e bs32 K=8 (bench.py BENCH_TRUNK_INT8=1): blocks-2-5-only int8 with
    # bf16 conv_1_2 ran 2097.7 img/s/chip (r4 commit e63e008); adding the
    # int8 conv_1_2 (this knob) measured 1799.7 — the theorized win (halving
    # conv_1_1's store by quantizing into bn_1_1's epilogue) LOSES ~14% in
    # practice, see NOTES_ROUND5.md. Default False = the measured-faster
    # config; calibration still records amax_1_2 so the knob is free to flip.
    conv12_int8: bool = False
    # Calibration mode: run the float path but record each quantized-input
    # abs-max into the mutable 'quant' collection (models/quant.py
    # calibrate_trunk drives this; with up_to=None the extras/head inputs are
    # recorded too — calibrate_full).
    quant_calibrate: bool = False

    def _conv_bn_relu(self, x, name_suffix, features, kernel, stride, pad, train, use_batch_stats,
                      batch_mask=None):
        x = nn.Conv(
            features=features,
            kernel_size=(kernel, kernel),
            strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            precision=self.precision,
            kernel_init=kaiming_out,
            name=f"conv_{name_suffix}",
        )(x)
        x = BatchNormTPU(
            use_running_average=not use_batch_stats,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name=f"bn_{name_suffix}",
        )(x, mask=batch_mask)
        return nn.relu(x)

    def _conv_bn_relu_q(self, x, name_suffix, features, use_batch_stats, batch_mask=None,
                        kernel_size: int = 3, stride: int = 1, pad: int = 1):
        """Conv on the int8 MXU path (see `trunk_int8`/`full_int8` above):
        quantize the input with its calibrated static scale (a pure
        elementwise tail XLA fuses into the producer's BN+ReLU kernel, so the
        activation lands in HBM as int8), s8xs8->s32 conv, per-out-channel
        dequant + bias in the epilogue; BN/ReLU unchanged in float. In
        `quant_calibrate` mode runs the float conv and records the input
        abs-max instead. Params are held by _ConvParams under nn.Conv's exact
        layout — checkpoints and converters see no difference. Serves the
        trunk (3x3/s1/p1) and, under `full_int8`, the extra layers' shapes."""
        from object_detection_torch2_tpu.models import quant

        cin = x.shape[-1]
        kernel, bias = _ConvParams((kernel_size, kernel_size, cin, features), self.param_dtype,
                                   name=f"conv_{name_suffix}")()
        amax = self.variable("quant", f"amax_{name_suffix}",
                             lambda: jnp.zeros((), jnp.float32))
        if not (self.trunk_int8 or self.full_int8):  # calibration/init — float conv, record amax
            if self.quant_calibrate and not self.is_initializing():
                amax.value = jnp.maximum(amax.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
                # quantized-input capture for saturation-rate diagnostics
                # (quant.saturation_rates); dropped unless 'intermediates' is
                # explicitly made mutable by the caller
                self.sow("intermediates", f"qin_{name_suffix}", x)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), (stride, stride),
                ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=self.precision,
            ) + bias.astype(self.dtype)
        else:
            sx = jnp.maximum(amax.value, 1e-12) / 127.0
            sw = quant.weight_scales(kernel)
            y32 = quant.int8_conv(quant.quantize_act(x, sx), quant.quantize_weight(kernel, sw),
                                  stride=stride, pad=pad)
            y = (y32.astype(jnp.float32) * (sx * sw)).astype(self.dtype) + bias.astype(self.dtype)
        y = BatchNormTPU(
            use_running_average=not use_batch_stats, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=f"bn_{name_suffix}",
        )(y, mask=batch_mask)
        return nn.relu(y)

    def _block1_paired(self, x, use_batch_stats, batch_mask, up_to=None):
        """conv_1_1 -> bn -> relu -> conv_1_2 -> bn -> relu -> pool_1, computed
        in the paired-x layout (N, H, W/2, 2C). Parameters and batch_stats keep
        their standard shapes/paths (checkpoint-identical to the plain path);
        only the compute layout differs. pool_1 (2x2/2 'M') is the max over the
        h-pair and the two x phases."""
        from object_detection_torch2_tpu.ops.conv12_pallas import conv12_paired, pick_tile_h

        n, h, w, c = x.shape
        xp = x.reshape(n, h, w // 2, 2 * c)
        use_kernel = self.conv12_kernel
        if use_kernel is None:
            # auto = OFF: the kernel measured 3.2x SLOWER than the XLA paired
            # conv (see the conv12_kernel field note); kept as an explicit
            # opt-in until a formulation beats XLA
            use_kernel = False
        if use_kernel and pick_tile_h(h, w // 2) is None:
            use_kernel = False
        for sub, cin, cout in ((1, 3, 64), (2, 64, 64)):
            kernel, bias = _ConvParams((3, 3, cin, cout), self.param_dtype, name=f"conv_1_{sub}")()
            if sub == 2 and (self.trunk_int8 or self.full_int8 or self.quant_calibrate):
                # conv_1_2 is frozen too: int8-eligible (quant.QUANT_LAYERS).
                # The int8 path always uses the staggered form (exact math,
                # bit-identical to the plain int8 conv) regardless of the
                # float-path kernel/stagger perf knobs.
                amax = self.variable("quant", "amax_1_2",
                                     lambda: jnp.zeros((), jnp.float32))
                if (self.trunk_int8 or self.full_int8) and self.conv12_int8:
                    sx = jnp.maximum(amax.value, 1e-12) / 127.0
                    xp = conv12_staggered_int8(xp, kernel, bias, sx, self.dtype,
                                               pad_pairs=self.conv12_pad_pairs)
                    xp = BatchNormTPU(
                        use_running_average=not use_batch_stats, momentum=0.9,
                        epsilon=1e-5, dtype=self.dtype, fold=2, name="bn_1_2",
                    )(xp, mask=batch_mask)
                    xp = nn.relu(xp)
                    break
                if self.quant_calibrate and not self.is_initializing():
                    # record, run float (also reached when conv12_int8=False
                    # keeps conv_1_2 on the bf16 path under an int8 trunk —
                    # then amax must NOT be written: 'quant' is immutable there)
                    amax.value = jnp.maximum(amax.value,
                                             jnp.max(jnp.abs(xp.astype(jnp.float32))))
                    self.sow("intermediates", "qin_1_2", xp)
            if sub == 2 and use_kernel:
                xp = conv12_paired(xp.astype(self.dtype), kernel, bias).astype(self.dtype)
            elif sub == 2 and self.conv12_stagger:
                xp = conv12_staggered(xp.astype(self.dtype), kernel.astype(self.dtype),
                                      bias, precision=self.precision,
                                      pad_pairs=self.conv12_pad_pairs)
            else:
                wp = pair_conv_weights(kernel).astype(self.dtype)
                xp = jax.lax.conv_general_dilated(
                    xp.astype(self.dtype), wp, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=self.precision,
                ) + jnp.tile(bias, 2).astype(self.dtype)
            xp = BatchNormTPU(
                use_running_average=not use_batch_stats, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, fold=2, name=f"bn_1_{sub}",
            )(xp, mask=batch_mask)
            xp = nn.relu(xp)
            if up_to == "1_1" and sub == 1:
                return xp  # '1_2' falls through so the prefix includes pool_1
        # pool_1 = max over the h-pair (a (2,1)/(2,1) window pool, layout-
        # friendly) then over the two x phases (a channel-slice max). A naive
        # 6-D reshape+max here costs ~5ms in layout-change copies at bs32.
        xp = nn.max_pool(xp, window_shape=(2, 1), strides=(2, 1), padding="VALID")
        cc = xp.shape[-1]
        return jnp.maximum(xp[..., : cc // 2], xp[..., cc // 2:])

    def _head_conv_q(self, x, suffix, num_anchors):
        """Detector head on the int8 path (full_int8 serving) or recording its
        input abs-max (quant_calibrate). No BN/ReLU after a head — the dequant
        epilogue lands directly on the (boxes, logits) output. Params via
        _ConvParams under nn.Conv's exact layout, so checkpoints trained on
        the float path load unchanged."""
        from object_detection_torch2_tpu.models import quant

        cin = x.shape[-1]
        cout = num_anchors * (self.num_classes + 4)
        kernel, bias = _ConvParams((3, 3, cin, cout), self.param_dtype,
                                   name=f"det_{suffix}")()
        amax = self.variable("quant", f"amax_det_{suffix}",
                             lambda: jnp.zeros((), jnp.float32))
        if not self.full_int8:  # quant_calibrate (or init): record, run float
            if self.quant_calibrate and not self.is_initializing():
                amax.value = jnp.maximum(amax.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
                self.sow("intermediates", f"qin_det_{suffix}", x)
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=self.precision,
            ) + bias.astype(self.dtype)
        sx = jnp.maximum(amax.value, 1e-12) / 127.0
        sw = quant.weight_scales(kernel)
        y32 = quant.int8_conv(quant.quantize_act(x, sx), quant.quantize_weight(kernel, sw))
        return (y32.astype(jnp.float32) * (sx * sw)).astype(self.dtype) + bias.astype(self.dtype)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True, use_batch_stats: bool | None = None,
                 batch_mask: jax.Array | None = None, up_to: str | None = None):
        """`batch_mask` (N,) marks real rows of a padded (ragged final) batch so
        batch statistics exclude the pad rows — see models/bn.py docstring.

        `up_to` (static; profiling/debug only): return the activation right
        after the named layer ('1_1'..'5_3' trunk convs incl. the block's pool
        when it is the block's last conv, '6_1'..'11_2' extras) instead of the
        detector outputs — tools/bench_layers.py differences successive
        prefixes to attribute forward wall time per layer in real fusion
        context."""
        if use_batch_stats is None:
            use_batch_stats = True  # parity default: reference never leaves train-mode BN (Q9)
        n = x.shape[0]

        x = normalize_image(x).astype(self.dtype)

        taps = dict(DETECTOR_TAPS)
        feature_maps = {}

        # VGG trunk (reference: ssd.py:22-44); block 1 takes the paired-x fast
        # path when the spatial size allows (see paired_block1 above)
        blocks = VGG_BLOCKS
        if self.paired_block1 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = self._block1_paired(x, use_batch_stats, batch_mask, up_to=up_to)
            if up_to in ("1_1", "1_2"):
                return x
            blocks = VGG_BLOCKS[1:]
        quantize = self.trunk_int8 or self.full_int8 or self.quant_calibrate
        for block, channels, pool in blocks:
            for sub, ch in enumerate(channels, start=1):
                suffix = f"{block}_{sub}"
                # frozen, int8-eligible; conv_1_2 int8 execution is gated on
                # conv12_int8 (measured slower — see the knob), but the
                # calibrate pass still records amax_1_2 so the knob stays free
                if quantize and (block >= 2 or (suffix == "1_2"
                                                and (self.quant_calibrate or self.conv12_int8))):
                    x = self._conv_bn_relu_q(x, suffix, ch, use_batch_stats, batch_mask)
                else:
                    x = self._conv_bn_relu(x, suffix, ch, 3, 1, 1, train, use_batch_stats, batch_mask)
                if suffix in taps:
                    feature_maps[suffix] = x
                if up_to == suffix and sub < len(channels):
                    return x
            if pool is not None:
                x = max_pool_torch(x, pad=1 if pool == "M_P" else 0)
            if up_to == f"{block}_{len(channels)}":
                return x

        # extra layers (reference: ssd.py:46-68); under full_int8 (or a full
        # calibration pass) they run the quantized-conv variant
        for suffix, kernel, ch, stride, pad in EXTRA_LAYERS:
            if self.full_int8 or self.quant_calibrate:
                x = self._conv_bn_relu_q(x, suffix, ch, use_batch_stats, batch_mask,
                                         kernel_size=kernel, stride=stride, pad=pad)
            else:
                x = self._conv_bn_relu(x, suffix, ch, kernel, stride, pad, train, use_batch_stats, batch_mask)
            if suffix in taps:
                feature_maps[suffix] = x
            if up_to == suffix:
                return x

        # detector heads + H-major flatten/concat (reference: ssd.py:70-77, 100-105)
        outputs = []
        for suffix, num_anchors in DETECTOR_TAPS:
            if self.full_int8 or self.quant_calibrate:
                y = self._head_conv_q(feature_maps[suffix], suffix, num_anchors)
            else:
                y = nn.Conv(
                    features=num_anchors * (self.num_classes + 4),
                    kernel_size=(3, 3),
                    padding=((1, 1), (1, 1)),
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    precision=self.precision,
                    kernel_init=kaiming_out,
                    name=f"det_{suffix}",
                )(feature_maps[suffix])
            # NHWC -> (N, H*W*A, C+4): rows ordered h-major, then w, then anchor —
            # identical to torch's permute(0, 2, 3, 1).reshape (reference: ssd.py:103)
            outputs.append(y.reshape(n, -1, self.num_classes + 4))

        return jnp.concatenate(outputs, axis=1).astype(jnp.float32)

    @staticmethod
    def is_trainable(path: tuple) -> bool:
        """Trainable-parameter predicate matching `SSD.train_params` (reference:
        src/model/ssd.py:160-179): extra layers (6_1 onward) and detector heads;
        the VGG trunk (blocks 1-5) is frozen."""
        name = path[0] if path else ""
        name = getattr(name, "key", name)
        if name.startswith("det_"):
            return True
        for prefix in ("conv_", "bn_"):
            if name.startswith(prefix):
                layer = int(name[len(prefix):].split("_")[0])
                return layer >= 6
        return False
