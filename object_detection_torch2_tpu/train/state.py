"""Train state: trainable/frozen parameter partition + optimizer state.

The reference freezes the VGG trunk doubly — requires_grad=False (reference:
src/model/ssd.py:31-32) AND exclusion from `train_params()` (ssd.py:160-179).
Here the partition is structural: the params pytree is split into a trainable
subtree (extra layers + heads) and a frozen subtree (VGG trunk); gradients are
only ever computed and optimizer state only ever allocated for the trainable
subtree. BatchNorm running statistics live in `batch_stats` and keep updating
for frozen trunk layers too — matching torch train-mode behavior for frozen
modules (SURVEY.md §7 "BatchNorm under DP").
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import optax


def partition_params(params: dict, is_trainable: Callable[[tuple], bool]):
    """Split a flat-at-top-level params dict into (trainable, frozen) dicts."""
    trainable = {k: v for k, v in params.items() if is_trainable((k,))}
    frozen = {k: v for k, v in params.items() if not is_trainable((k,))}
    return trainable, frozen


def merge_params(trainable: dict, frozen: dict) -> dict:
    return {**trainable, **frozen}


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any  # trainable subtree
    frozen: Any  # frozen subtree (VGG trunk)
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @property
    def all_params(self) -> dict:
        return merge_params(self.params, self.frozen)

    @property
    def variables(self) -> dict:
        return {"params": self.all_params, "batch_stats": self.batch_stats}

    @classmethod
    def create(cls, variables: dict, tx: optax.GradientTransformation, is_trainable) -> "TrainState":
        import jax.numpy as jnp

        trainable, frozen = partition_params(variables["params"], is_trainable)
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=trainable,
            frozen=frozen,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(trainable),
            tx=tx,
        )

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt_state)
