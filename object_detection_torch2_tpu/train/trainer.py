"""Jitted train/eval steps with data-parallel sharding.

The whole reference hot path — normalize, 51-module trunk, 6 heads, matching,
deltas, CE, top-k mining, reduction (SURVEY.md §3.5) — compiles into ONE XLA
program per step here. Parallelism is sharding-driven: batches are placed with
the batch axis sharded over the mesh's 'data' axis, state is replicated, and
jit's "computation follows data" turns the gradient reduction into an ICI
all-reduce automatically. Buffers are donated so parameters/optimizer state
update in place in HBM.

Validation parity note: the reference's validation pass runs under
`torch.no_grad()` but never calls `net.eval()` (reference: src/train.py:127-139),
so BatchNorm uses *batch* statistics AND keeps updating running stats during
validation. `eval_step` reproduces exactly that (returns an updated state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from object_detection_torch2_tpu.core.multibox import multibox_loss
from object_detection_torch2_tpu.models.vgg16 import cross_entropy
from object_detection_torch2_tpu.parallel import mesh as mesh_lib
from object_detection_torch2_tpu.train.state import TrainState, merge_params


class Trainer:
    """Builds and caches the jitted steps for one (model, loss, mesh) combo.

    loss_kind: 'multibox' (SSD detection; requires default_boxes) or
    'cross_entropy' (VGG classification; `ce_parity_sign` reproduces the
    reference's sign-flipped loss Q2 — off by default).
    """

    def __init__(
        self,
        model,
        loss_kind: str = "multibox",
        default_boxes=None,
        alpha: float = 1.0,
        mesh=None,
        ce_parity_sign: bool = False,
        use_batch_stats: bool = True,
        augment: dict | bool = False,
        seed: int = 0,
        quant: dict | None = None,
    ):
        self.model = model
        self.loss_kind = loss_kind
        self.default_boxes = None if default_boxes is None else jnp.asarray(default_boxes)
        self.alpha = alpha
        self.mesh = mesh
        self.ce_parity_sign = ce_parity_sign
        self.use_batch_stats = use_batch_stats
        # Fused on-device augmentation: when set, train_step accepts raw uint8
        # batches and runs jitter/flip/erase INSIDE the step program (single
        # host dispatch per step — dispatch latency through remote runtimes
        # otherwise dominates; the augment runs in the model's compute dtype,
        # see _maybe_augment).
        # The RNG folds state.step into a fixed base key, so the step stays a
        # pure function of (state, batch).
        self.augment_config = ({} if augment is True else dict(augment)) if augment else None
        self._aug_base_key = jax.random.PRNGKey(seed ^ 0x5EED)
        if loss_kind == "multibox" and self.default_boxes is None:
            raise ValueError("multibox loss requires default_boxes")
        # Int8 trunk (models/quant.py): calibrated activation amaxes ride as a
        # closure-captured 'quant' collection — compile-time constants, so XLA
        # folds the dequant scales. Tiny (one scalar per quantized layer).
        if getattr(model, "full_int8", False):
            # full_int8 quantizes the extras/heads — the TRAINABLE params;
            # round/clip would silently zero their gradients (serving-only
            # path: models/quant.py FULL_QUANT_LAYERS rationale)
            raise ValueError("full_int8 is a serving-only path; train with trunk_int8")
        self.quant = None
        if getattr(model, "trunk_int8", False):
            from object_detection_torch2_tpu.models.quant import check_calibrated

            self.quant = {k: jnp.asarray(v, jnp.float32)
                          for k, v in check_calibrated(quant).items()}

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._train_steps = jax.jit(self._train_steps_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl, donate_argnums=(0,), static_argnames=("augment",))

    # ------------------------------------------------------------------ losses
    def _loss(self, outputs, targets):
        if self.loss_kind == "multibox":
            return multibox_loss(outputs, targets, self.default_boxes, self.alpha)
        return cross_entropy(outputs, targets, parity_sign=self.ce_parity_sign)

    # ------------------------------------------------------------------- steps
    def _forward(self, params, frozen, batch_stats, images, rng, train):
        variables = {"params": merge_params(params, frozen), "batch_stats": batch_stats}
        if self.quant is not None:
            variables["quant"] = self.quant
        rngs = {"dropout": rng} if rng is not None else None
        out, mutated = self.model.apply(
            variables,
            images,
            train=train,
            use_batch_stats=self.use_batch_stats,
            mutable=["batch_stats"],
            rngs=rngs,
        )
        # with use_batch_stats=False BatchNorm never writes, so the mutated
        # collection comes back empty — keep the old stats (static check, trace-safe)
        new_bs = mutated.get("batch_stats") or batch_stats
        return out, new_bs

    def _maybe_augment(self, images, targets, key):
        from object_detection_torch2_tpu.data.augment import augment_batch

        if self.augment_config is not None and images.dtype == jnp.uint8:
            # augment pixels in the model's compute dtype (bf16 flagship):
            # the chain is bandwidth-bound and bf16's mantissa matches uint8
            # quantization (see augment_batch docstring). Override with an
            # explicit `dtype` in the augment config.
            cfg = dict(self.augment_config)
            cfg.setdefault("dtype", getattr(self.model, "dtype", jnp.float32))
            return augment_batch(key, images, targets, **cfg)
        if images.dtype == jnp.uint8:
            return images.astype(jnp.float32) / 255.0, targets
        return images, targets

    def _needs_dropout(self):
        # only VGG classification has dropout; SSD's head path has none
        return self.loss_kind == "cross_entropy"

    def _train_step_impl(self, state: TrainState, images, targets, rng=None):
        step_key = jax.random.fold_in(self._aug_base_key, state.step) if rng is None else rng
        aug_key, dropout_key = jax.random.split(step_key)
        images, targets = self._maybe_augment(images, targets, aug_key)
        dropout_rng = dropout_key if self._needs_dropout() else None

        def loss_fn(params):
            outputs, new_bs = self._forward(params, state.frozen, state.batch_stats, images, dropout_rng, True)
            return self._loss(outputs, targets), new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        return state, loss

    def _train_steps_impl(self, state: TrainState, images_k, targets_k):
        """K train steps in ONE compiled program: `lax.scan` over stacked
        (K, B, ...) micro-batches.

        Per-dispatch overhead through a remote PJRT runtime measured ~2.3 ms
        (tools/bench_step_breakdown.py: 21.2 ms walled vs 18.9 ms differenced
        at bs32) — scanning K steps amortizes it to ~2.3/K ms. The body IS
        `_train_step_impl`: the per-step augment RNG already folds `state.step`
        into the base key and `apply_gradients` increments the step inside the
        scan carry, so a K-scan computes exactly the same sequence of steps as
        K single dispatches (test_trainer_scan.py pins the equivalence)."""
        def body(carry, batch):
            images, targets = batch
            new_state, loss = self._train_step_impl(carry, images, targets)
            return new_state, loss

        state, losses = jax.lax.scan(body, state, (images_k, targets_k))
        return state, losses

    def _eval_step_impl(self, state: TrainState, images, targets, rng=None, augment: bool = False):
        # no_grad + train-mode BN (reference validation semantics). NB the
        # reference also leaves dropout ACTIVE during validation (train mode +
        # no_grad — another Q9 facet); we run dropout deterministically here,
        # a deliberate divergence (less noisy val loss).
        if augment and rng is not None:
            images, targets = self._maybe_augment(images, targets, rng)
        elif images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        # train=False only disables dropout; use_batch_stats still selects batch
        # statistics and BatchNormTPU still updates running stats (mutable)
        outputs, new_bs = self._forward(state.params, state.frozen, state.batch_stats, images, None, False)
        return state.replace(batch_stats=new_bs), self._loss(outputs, targets)

    # ----------------------------------------------------------------- helpers
    def init_state(self, rng, sample_images, tx, is_trainable=None, variables=None) -> TrainState:
        """Initialize (or adopt converted) variables and build a TrainState,
        replicated over the mesh if one is set."""
        if variables is None:
            variables = self.model.init({"params": rng, "dropout": rng}, sample_images, train=False)
        if is_trainable is None:
            is_trainable = getattr(type(self.model), "is_trainable", lambda path: True)
        if getattr(self.model, "trunk_int8", False):
            # int8 trunk is inference-only math: a trainable trunk param would
            # silently get zero gradient through round/clip (models/quant.py)
            quantized = [k for k in variables["params"]
                         if is_trainable((k,)) and k.split("_")[0] in ("conv", "bn")
                         and k.split("_")[1].isdigit() and int(k.split("_")[1]) <= 5]
            if quantized:
                raise ValueError(f"trunk_int8 requires a frozen trunk; trainable: {quantized}")
        state = TrainState.create(variables, tx, is_trainable)
        if self.mesh is not None:
            state = mesh_lib.replicate(self.mesh, state)
        return state

    def place_batch(self, *arrays):
        """Host arrays -> device, batch axis sharded over the mesh."""
        arrays = tuple(jnp.asarray(a) for a in arrays)
        if self.mesh is not None:
            arrays = mesh_lib.shard_batch(self.mesh, arrays)
        return arrays

    def train_step(self, state, images, targets, rng=None):
        return self._train_step(state, images, targets, rng)

    def train_steps(self, state, images_k, targets_k):
        """Run K steps from one dispatch; returns (state, (K,) losses).

        images_k/targets_k are (K, B, ...) stacks — place them with
        `shard_batch(mesh, ..., batch_axis=1)` (the DataLoader's
        `stack_steps=K` does this)."""
        return self._train_steps(state, images_k, targets_k)

    def eval_step(self, state, images, targets, rng=None, augment=False):
        return self._eval_step(state, images, targets, rng, augment=augment)
