"""bf16 accuracy budget: measured drift of the flagship bfloat16 default
against the f32 reference training trajectory.

The CLIs default to --dtype bfloat16 (cli/common.py) while the reference
trains pure f32 torch (reference: src/train.py:97-124 — no AMP anywhere).
This tool quantifies what that buys/costs by replaying the executed-reference
trajectory goldens (tools/gen_goldens.py; 20-step and 100-step horizons)
through the Trainer twice — compute dtype f32 and bfloat16, parameters f32 in
both (the flagship recipe: bf16 is the COMPUTE dtype only) — and recording the
per-step loss drift vs the torch reference:

  - f32 drift   = framework difference alone (conv reassociation etc.);
  - bf16 drift  = framework + reduced-precision compute;
  - bf16 - f32  = the isolated cost of bfloat16.

Also compares the post-training eval-mode forward logits of both replays
against the golden. Writes BF16_BUDGET.json and prints a markdown drift table
(README/NOTES material). tests/test_bf16_budget.py pins the 20-step bf16
numbers with headroom so regressions in the bf16 path fail CI.

Usage: python tools/bf16_budget.py            # on the TPU (fast)
       JAX_PLATFORMS=cpu python tools/bf16_budget.py --goldens train_trajectory
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

PROBE_STEPS = (0, 1, 4, 9, 19, 49, 99)


def replay(golden, dtype):
    import jax
    import jax.numpy as jnp

    from object_detection_torch2_tpu.core.anchors import default_boxes
    from object_detection_torch2_tpu.models.convert import ssd_variables_from_torch
    from object_detection_torch2_tpu.models.ssd import SSD
    from object_detection_torch2_tpu.train.optimizer import adam_torch, exponential_epoch_schedule
    from object_detection_torch2_tpu.train.state import TrainState
    from object_detection_torch2_tpu.train.trainer import Trainer
    from object_detection_torch2_tpu.utils.testing import (
        synth_scaled_state_dict_from_manifest,
        synth_trajectory_batch,
    )

    g = golden
    steps, spe, bs = int(g["steps"]), int(g["steps_per_epoch"]), int(g["bs"])
    sd = synth_scaled_state_dict_from_manifest(g["manifest_keys"], g["manifest_shapes"])
    variables = jax.tree.map(jnp.asarray, ssd_variables_from_torch(sd))
    model = SSD(num_classes=21, dtype=dtype)
    tx = adam_torch(
        exponential_epoch_schedule(float(g["lr"]), float(g["gamma"]), spe),
        weight_decay=float(g["weight_decay"]),
    )
    trainer = Trainer(model, loss_kind="multibox", default_boxes=jnp.asarray(default_boxes()))
    state = TrainState.create(variables, tx, SSD.is_trainable)

    losses = []
    for step in range(steps):
        images, targets = synth_trajectory_batch(step, n=bs)
        images = np.transpose(images, (0, 2, 3, 1))
        state, loss = trainer.train_step(state, jnp.asarray(images), jnp.asarray(targets))
        losses.append(float(loss))

    # post-training eval-mode forward (the serving surface after training)
    images0, _ = synth_trajectory_batch(0, n=bs)
    out = SSD(num_classes=21, dtype=dtype).apply(
        {"params": state.all_params, "batch_stats": state.batch_stats},
        jnp.asarray(np.transpose(images0, (0, 2, 3, 1))), train=False, use_batch_stats=False,
    )
    return np.asarray(losses), np.asarray(out[:, :128, :], np.float32)


def drift_row(losses, ref):
    rel = np.abs(losses - ref) / np.maximum(np.abs(ref), 1e-9)
    return rel, {f"step{p + 1}": round(float(rel[p]), 6) for p in PROBE_STEPS if p < len(rel)} | {
        "max": round(float(rel.max()), 6), "argmax": int(rel.argmax()) + 1}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--goldens", nargs="+", default=["train_trajectory", "train_trajectory_100"])
    parser.add_argument("--out", default="BF16_BUDGET.json")
    args = parser.parse_args(argv)

    from object_detection_torch2_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    out_path = REPO / args.out
    # Preserve keys this run does not own (e.g. the generalization_ab record
    # written from the tools/generalization_proof.py --dtype A/B arms).
    record = {}
    if out_path.exists():
        record = {k: v for k, v in json.loads(out_path.read_text()).items()
                  if k not in args.goldens and k not in ("platform", "param_dtype", "note")}
    record.update({"platform": platform, "param_dtype": "float32",
                   "note": "per-step relative loss drift vs the EXECUTED torch f32 reference "
                           "trajectory (tools/gen_goldens.py); bf16 is compute dtype only "
                           "(flagship default, cli/common.py)"})
    table = ["| golden | dtype | step1 | step5 | step20 | step100 | max (at) | eval-fwd maxabs |",
             "|---|---|---|---|---|---|---|---|"]
    for name in args.goldens:
        g = dict(np.load(REPO / "tests" / "goldens" / f"{name}.npz", allow_pickle=False))
        ref = g["losses"]
        entry = {}
        for label, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            losses, out_eval = replay(g, dtype)
            rel, row = drift_row(losses, ref)
            ev = np.abs(out_eval - g["out_eval_after"])
            row["eval_fwd_maxabs"] = round(float(ev.max()), 6)
            row["eval_fwd_mean"] = round(float(ev.mean()), 6)
            entry[label] = row
            entry[f"{label}_losses"] = [round(float(x), 6) for x in losses]

            def cell(p):
                return f"{rel[p]:.1e}" if p < len(rel) else "—"
            table.append(f"| {name} | {label} | {cell(0)} | {cell(4)} | {cell(19)} | {cell(99)} | "
                         f"{rel.max():.1e} (step {rel.argmax() + 1}) | {ev.max():.1e} |")
        record[name] = entry
        record[name]["ref_losses"] = [round(float(x), 6) for x in ref]

    out_path.write_text(json.dumps(record, indent=2) + "\n")
    print("\n".join(table))
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
