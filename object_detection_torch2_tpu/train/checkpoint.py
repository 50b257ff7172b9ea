"""Checkpoint / resume (reference: src/train.py:85-95, 145-152; SURVEY.md §5).

Two layers, mirroring the reference's artifacts plus proper full-state restore:

- `weights.msgpack` + `params.json` — the reference's surface: weights saved
  only when TRAIN loss improves; params.json = {min_loss, lr, last_epoch}.
  (The reference stores torch `weights.pth`; tools/torch_to_npz.py +
  models/convert.py bridge that format.)
- `orbax/` — full TrainState (trainable/frozen params, batch_stats, optimizer
  moments, step). The reference's resume discards optimizer moments and
  restarts LR decay from the saved lr (quirk Q7, reference train.py:85-98);
  restoring from orbax keeps exact optimizer state instead. Both paths exist;
  params.json keeps CLI parity.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np
from flax import serialization


def save_weights(path, variables: dict):
    """Serialize {'params', 'batch_stats'} variables to msgpack."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    host_vars = jax.tree.map(np.asarray, variables)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(host_vars))


def load_weights(path) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def save_params_json(path, min_loss: float, lr: float, last_epoch: int, base_lr: float | None = None,
                     steps_per_epoch: int | None = None):
    """Reference params.json semantics (reference: train.py:150-152).

    `base_lr` and `steps_per_epoch` are TPU extensions the reference file
    doesn't carry: the UNDECAYED schedule base, so an orbax exact resume can
    rebuild the schedule without the user re-passing --lr (the reference 'lr'
    field stores the already-decayed value — quirk Q7), and the epoch length,
    so a resume with a different --batch_size keeps epoch numbering honest.
    Extra keys don't disturb parity readers."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    record = {"min_loss": float(min_loss), "lr": float(lr), "last_epoch": int(last_epoch)}
    if base_lr is not None:
        record["base_lr"] = float(base_lr)
    if steps_per_epoch is not None:
        record["steps_per_epoch"] = int(steps_per_epoch)
    with open(path, "w") as f:
        json.dump(record, f, indent=4)


def load_params_json(path) -> dict | None:
    path = Path(path)
    if not path.exists():
        return None
    with open(path, "r") as f:
        return json.load(f)


# ------------------------------------------------------------------- orbax layer
def latest_orbax_step(ckpt_dir) -> int | None:
    """Latest checkpoint step in an orbax dir, or None if empty/absent.

    Lets callers decide — BEFORE building the optimizer/schedule — whether an
    exact resume will happen. Needed because the restored optax step count
    already carries the LR decay: seeding the schedule from the (already
    decayed) params.json lr on top of it would double-decay (advisor r1)."""
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    if not ckpt_dir.exists():
        return None
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        return mngr.latest_step()


def save_train_state(ckpt_dir, state, step: int | None = None):
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    step = int(state.step) if step is None else step
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        payload = {
            "params": state.params,
            "frozen": state.frozen,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        mngr.save(step, args=ocp.args.StandardSave(payload), force=True)
        mngr.wait_until_finished()


def restore_train_state(ckpt_dir, state):
    """Restore into the structure of an existing (template) TrainState."""
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        step = mngr.latest_step()
        if step is None:
            return None
        template = {
            "params": state.params,
            "frozen": state.frozen,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = mngr.restore(step, args=ocp.args.StandardRestore(template))
    return state.replace(
        params=restored["params"],
        frozen=restored["frozen"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
