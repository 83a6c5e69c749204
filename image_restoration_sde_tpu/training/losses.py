"""Training losses.

Parity: ``codes/config/deraining/models/modules/loss.py:9-29`` (MatchingLoss)
— elementwise L1/L2 reduced to a per-sample mean, optionally multiplied by
per-sample timestep weights, then averaged over the batch.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def matching_loss(
    predict: jnp.ndarray,
    target: jnp.ndarray,
    loss_type: str = "l1",
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    if loss_type == "l1":
        per_elem = jnp.abs(predict - target)
    elif loss_type == "l2":
        per_elem = (predict - target) ** 2
    else:
        raise ValueError(f"invalid loss type {loss_type!r}")
    per_sample = per_elem.reshape(per_elem.shape[0], -1).mean(axis=1)
    if weights is not None:
        per_sample = weights.reshape(-1) * per_sample
    return per_sample.mean()


def perceptual_matching_loss(
    predict: jnp.ndarray,
    target: jnp.ndarray,
    loss_type: str = "l1",
    weights: Optional[jnp.ndarray] = None,
    lpips_weight: float = 0.01,
    lpips_fn=None,
) -> jnp.ndarray:
    """MatchingLoss + lpips_weight * LPIPS(vgg).

    Parity: ref config/unet-latent/models/modules/loss.py:34-58
    (PerceptualMatchingLoss — defined upstream but the shipped code path
    uses the plain MatchingLoss, latent_model.py:50-51).  The reference adds
    the per-sample lpips term to the (weighted) per-sample pixel loss before
    the batch mean; by linearity of the mean that equals this composition
    with a batch-mean ``lpips_fn``.

    ``lpips_fn`` is injectable: pass
    ``utils.lpips.make_perceptual_loss_fn(pth)`` for the fully in-graph,
    differentiable LPIPS(vgg) term (weights from a user-supplied
    ``lpips.LPIPS(net='vgg').state_dict()`` .pth — no pip package needed),
    or any host metric.  When absent the perceptual term is skipped,
    matching the effective reference behavior.
    """
    loss = matching_loss(predict, target, loss_type, weights)
    if lpips_fn is not None:
        loss = loss + lpips_weight * lpips_fn(predict, target)
    return loss
