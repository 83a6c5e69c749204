"""PRNG-key plumbing shared by the SDE classes and the samplers.

A sampler key is normally ONE key for the whole batch (the reference's
torch loops share a global RNG the same way — sde_utils.py draws
``torch.randn_like`` on batch tensors).  Everything here also accepts a
*per-sample key batch* (leading batch dim): each sample then carries its
own split-per-step stream, so sample i's noise is a function of key i
ONLY — independent of batch composition, batch position, and sampler
chunking.  That property is what bit-reproducible micro-batched serving
builds on (``exporting.py`` ``per_sample_seed`` artifacts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def is_key_batch(key) -> bool:
    """True iff ``key`` is a per-sample batch of PRNG keys.

    A single key is raw uint32 ``(2,)`` (``jax.random.PRNGKey``) or a typed
    scalar key; a batch is the same with a leading batch dim."""
    if key is None:
        return False
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return key.ndim == 1
    return key.ndim == 2


def split_key(key):
    """``jax.random.split`` generalized over a per-sample key batch: returns
    ``(k0, k1)`` with the same leading shape as ``key``."""
    if is_key_batch(key):
        kk = jax.vmap(jax.random.split)(key)
        return kk[:, 0], kk[:, 1]
    k0, k1 = jax.random.split(key)
    return k0, k1


def normal_like(key, x: jnp.ndarray) -> jnp.ndarray:
    """Draw N(0,1) of ``x``'s shape/dtype — per-sample when ``key`` is a
    key batch (sample i's noise depends only on key i)."""
    if is_key_batch(key):
        return jax.vmap(
            lambda k, xi: jax.random.normal(k, xi.shape, xi.dtype)
        )(key, x)
    return jax.random.normal(key, x.shape, x.dtype)


def keys_for_seeds(seeds: jnp.ndarray) -> jnp.ndarray:
    """uint32 ``(B,)`` seed vector -> ``(B, 2)`` per-sample key batch."""
    return jax.vmap(jax.random.PRNGKey)(seeds)
