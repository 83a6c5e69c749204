"""Optimizer construction (optax).

Parity: ref ``denoising_model.py:68-91`` — Adam / AdamW / Lion selected by
``train.optimizer`` with lr_G, (beta1, beta2), weight_decay_G.

- torch Adam's ``weight_decay`` is L2 folded into the gradient *before* the
  moment updates -> ``add_decayed_weights`` ahead of ``scale_by_adam``.
- torch AdamW is decoupled decay -> ``optax.adamw``.
- The reference Lion (models/optimizer.py:61-84, Google reference impl) does
  decay -> sign(b1 m + (1-b1) g) update -> momentum; ``optax.lion`` applies
  the identical update order.
"""

from __future__ import annotations

from typing import Callable, Union

import optax

ScalarOrSchedule = Union[float, Callable]


def build_optimizer(
    name: str,
    learning_rate: ScalarOrSchedule,
    beta1: float = 0.9,
    beta2: float = 0.999,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    name = (name or "Adam").lower()
    if name == "adam":
        tx = optax.scale_by_adam(b1=beta1, b2=beta2, eps=1e-8)
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain += [tx, _scale_by_lr(learning_rate)]
        return optax.chain(*chain)
    if name == "adamw":
        return optax.adamw(
            learning_rate, b1=beta1, b2=beta2, eps=1e-8, weight_decay=weight_decay
        )
    if name == "lion":
        return optax.lion(learning_rate, b1=beta1, b2=beta2, weight_decay=weight_decay)
    raise ValueError(f"unknown optimizer {name!r} (Adam | AdamW | Lion)")


def _scale_by_lr(learning_rate: ScalarOrSchedule) -> optax.GradientTransformation:
    if callable(learning_rate):
        return optax.scale_by_schedule(lambda count: -learning_rate(count))
    return optax.scale(-learning_rate)


def build_from_options(train_opt: dict, learning_rate: ScalarOrSchedule):
    """Build from a reference-format ``train:`` dict (YAML surface parity).

    ``train.grad_accum: k`` (ours; absent upstream) wraps the optimizer in
    optax.MultiSteps — gradients average over k micro-steps and the update
    applies every k-th call (LR schedule advances per effective update).
    """
    tx = build_optimizer(
        train_opt.get("optimizer") or "Adam",
        learning_rate,
        beta1=float(train_opt.get("beta1") or 0.9),
        beta2=float(train_opt.get("beta2") or 0.999),
        weight_decay=float(train_opt.get("weight_decay_G") or 0.0),
    )
    k = int(train_opt.get("grad_accum") or 1)
    if k > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=k)
    return tx
