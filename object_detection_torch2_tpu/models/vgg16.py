"""VGG16-bn classifier as a Flax module (reference: src/model/vgg16.py).

Used as the SSD backbone / transfer source. Reproduces the reference exactly:

- conv cfg [64,64,'M',128,128,'M',256,256,256,'M_P',512,512,512,'M',512,512,512,'M_P']
  where 'M_P' = MaxPool2d(2, 2, padding=1) (reference: vgg16.py:25-30);
- two classifier heads: 1000-way `classifier` and `num_classes`-way `classifier2`
  for transfer learning; `forward` picks classifier2 iff transfer_learning
  (reference: vgg16.py:42-61, 97-100). Note the reference's transfer path is
  half-wired (quirk Q8, SURVEY.md): train.py never sets transfer_learning=True.
- classification loss: the reference's is missing the minus sign (quirk Q2,
  SURVEY.md; reference: vgg16.py:127-128) — `cross_entropy` below is the proper
  CE by default, with `parity_sign=True` reproducing the reference value.

Quirk Q10 (discovered in this rebuild): the classifier expects a 7x7x512 feature
grid (Linear(512*7*7, ...)), but with the reference's padded pools NO standard
imsize gives 7x7 — 300 gives 10x10 and 224 gives 8x8, so the reference's
classification forward crashes at its own default imsize. An imsize around
184-215 (e.g. 200) yields 7x7 and a working classifier. We mirror the 512*7*7
head for weight-compat and document the constraint.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from object_detection_torch2_tpu.models.bn import BatchNormTPU
from object_detection_torch2_tpu.models.ssd import max_pool_torch, normalize_image

VGG_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M_P", 512, 512, 512, "M", 512, 512, 512, "M_P")

# torch nn.init.normal_(weight, 0, 0.01) for classifier2 (reference: vgg16.py:80-83)
normal_001 = nn.initializers.normal(stddev=0.01)


def _canonical_conv_names(cfg=VGG_CFG):
    """Yield ('conv_L_S' | 'pool_L', channels|pad) walking the cfg, matching the
    canonical naming SSD assigns when re-wrapping vgg16.features (reference: ssd.py:27-44)."""
    block, sub = 1, 1
    out = []
    for v in cfg:
        if v in ("M", "M_P"):
            out.append((f"pool_{block}", 1 if v == "M_P" else 0))
            block += 1
            sub = 1
        else:
            out.append((f"conv_{block}_{sub}", v))
            sub += 1
    return out


class VGG16(nn.Module):
    """Input (N, H, W, 3) in [0, 1]; output (N, 1000) or (N, num_classes) logits."""

    num_classes: int = 20
    transfer_learning: bool = False
    # torch nn.Dropout() default (reference: vgg16.py:45,48,57,60). 0.0 turns
    # the heads' dropout off while keeping train-mode BN — used by the
    # classification trajectory-parity test, where torch and JAX dropout masks
    # could never match bit-for-bit.
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    precision: Any = jax.lax.Precision.HIGHEST  # see models/ssd.py

    def _head(self, x, name, out_features, train, kernel_init):
        for i, feats in enumerate((4096, 4096, out_features), start=1):
            x = nn.Dense(
                feats,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                precision=self.precision,
                kernel_init=kernel_init,
                name=f"{name}_fc{i}",
            )(x)
            if i < 3:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True, use_batch_stats: bool | None = None):
        if use_batch_stats is None:
            use_batch_stats = train
        n = x.shape[0]
        x = normalize_image(x).astype(self.dtype)

        for name, arg in _canonical_conv_names():
            if name.startswith("pool"):
                x = max_pool_torch(x, pad=arg)
            else:
                x = nn.Conv(
                    features=arg,
                    kernel_size=(3, 3),
                    padding=((1, 1), (1, 1)),
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    precision=self.precision,
                    name=name,
                )(x)
                x = BatchNormTPU(
                    use_running_average=not use_batch_stats,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    name=f"bn{name[4:]}",
                )(x)
                x = nn.relu(x)

        # torch flattens NCHW C-major (reference: vgg16.py:96); transpose so the
        # converted Linear weights line up element-for-element.
        x = x.transpose(0, 3, 1, 2).reshape(n, -1)

        # Both heads exist in the reference's state_dict regardless of which one
        # forward uses; materialize both at init so checkpoints stay layout-compatible,
        # but only run the selected head during apply.
        out = None
        if self.is_initializing() or not self.transfer_learning:
            out1 = self._head(x, "classifier", 1000, train, nn.initializers.lecun_normal())
            out = out1 if not self.transfer_learning else out
        if self.is_initializing() or self.transfer_learning:
            out2 = self._head(x, "classifier2", self.num_classes, train, normal_001)
            out = out2 if self.transfer_learning else out
        return out.astype(jnp.float32)


def vgg_trainable_predicate(transfer_learning: bool):
    """Trainable-parameter predicate for classification training: everything
    except the UNSELECTED classifier head.

    torch's Adam skips params whose grad stays None, and the head `forward`
    doesn't run never enters the backward graph — so the (Q12-patched)
    reference would never update or weight-decay it. Excluding it here matches
    that exactly AND avoids allocating Adam moments for ~123M dead params (the
    1000-way head alone is 25088x4096 + 4096x4096 + 4096x1000 Linears)."""
    dead = "classifier_" if transfer_learning else "classifier2_"

    def is_trainable(path: tuple) -> bool:
        name = path[0] if path else ""
        name = getattr(name, "key", name)
        return not str(name).startswith(dead)

    return is_trainable


def cross_entropy(outputs: jax.Array, targets: jax.Array, parity_sign: bool = False) -> jax.Array:
    """Softmax cross-entropy mean over the batch.

    The reference's VGG16.loss is `sum(targets * log_softmax).mean()` — missing
    the minus sign, i.e. the *negative* of cross-entropy (quirk Q2, reference:
    vgg16.py:117-129). Default here is the proper CE; `parity_sign=True`
    reproduces the reference's sign-flipped value for comparison tests.
    """
    ll = jnp.sum(targets * jax.nn.log_softmax(outputs, axis=-1), axis=-1).mean()
    return ll if parity_sign else -ll
