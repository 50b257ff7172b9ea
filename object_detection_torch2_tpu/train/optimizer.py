"""Optimizer with torch-parity semantics (reference: src/train.py:97-98, 154).

The reference uses `optim.Adam(net.train_params(), lr, weight_decay)` +
`ExponentialLR(gamma)` stepped once per epoch. torch Adam semantics:

  - weight decay is L2 folded INTO the gradient before the moment updates
    (not AdamW-style decoupled decay) -> `optax.add_decayed_weights` placed
    BEFORE `scale_by_adam`;
  - update = lr * m_hat / (sqrt(v_hat) + eps) -> `eps_root=0.0`, eps inside the
    denominator after the sqrt, matching optax's formulation exactly.
"""

from __future__ import annotations

import optax


def exponential_epoch_schedule(base_lr: float, gamma: float, steps_per_epoch: int):
    """lr = base_lr * gamma^epoch, stepped per-epoch like torch ExponentialLR
    under the reference's per-epoch `scheduler.step()` (reference: train.py:154)."""

    def schedule(step):
        return base_lr * gamma ** (step // steps_per_epoch)

    return schedule


def adam_torch(
    learning_rate,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """torch.optim.Adam-equivalent transformation. `learning_rate` may be a float
    or a step schedule."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps, eps_root=0.0))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)
