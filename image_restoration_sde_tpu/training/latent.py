"""Refusion latent-space training: compressor pre-training and latent
diffusion with a frozen compressor.

Parity:

- ``make_compressor_train_step``: the cross-reconstruction objective of the
  unet-latent ``LatentModel`` (ref latent_model.py:141-170):
  ``loss_rec = ||dec(enc(LQ).lat, skips_LQ) - LQ||``,
  ``loss_rep = ||dec(enc(GT).lat, skips_LQ) - GT||``  (GT latent decoded
  with LQ skips — forces the latent to carry the restoration signal),
  ``loss_reg = |mean(L_lq) - mean(LQ)| + |std(L_lq) - 0.5 std(LQ)|``,
  total = rec + rep + 0.001 reg.
- ``make_latent_train_step``: the latent-dehazing/bokeh ``DenoisingModel``
  (ref latent_denoising_model.py:154-176): encode LQ/GT through the FROZEN
  compressor, then the same IR-SDE maximum-likelihood objective on the
  latents; sampling reverses the SDE in latent space and decodes with the
  LQ skips (latent_denoising_model.py:177-191).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..sde.irsde import IRSDE
from . import ema as ema_lib
from .ema import EmaConfig
from .losses import matching_loss
from .trainer import TrainState


def make_compressor_train_step(
    encode_fn: Callable,  # (params, x) -> (latent, skips)
    decode_fn: Callable,  # (params, latent, skips) -> recon
    tx: optax.GradientTransformation,
    loss_type: str = "l1",
    weight: float = 1.0,
    reg_weight: float = 0.001,
) -> Callable:
    """(state, lq, gt, key) -> (state, metrics) — no EMA (ref has none for
    the compressor trainer)."""

    def train_step(state: TrainState, lq, gt, key):
        def loss_fn(params):
            l_lq, h_lq = encode_fn(params, lq)
            l_gt, _h_gt = encode_fn(params, gt)
            rec_llq_hlq = decode_fn(params, l_lq, h_lq)
            rec_lgt_hlq = decode_fn(params, l_gt, h_lq)
            loss_rec = matching_loss(rec_llq_hlq, lq, loss_type)
            loss_rep = matching_loss(rec_lgt_hlq, gt, loss_type)
            loss_reg = jnp.abs(l_lq.mean() - lq.mean()) + jnp.abs(
                l_lq.std() - lq.std() * 0.5
            )
            total = weight * (loss_rec + loss_rep + reg_weight * loss_reg)
            return total, {
                "loss": total,
                "loss_rec": loss_rec,
                "loss_rep": loss_rep,
                "loss_reg": loss_reg,
            }

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_state = ema_lib.update(state.ema, params)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state, ema=ema_state),
            metrics,
        )

    return train_step


def make_latent_train_step(
    sde: IRSDE,
    model_apply: Callable,  # (params, xt, cond, tvec) -> noise (latent-space)
    encode_fn: Callable,  # (latent_params, x) -> (latent, skips); FROZEN
    latent_params: Any,
    tx: optax.GradientTransformation,
    loss_type: str = "l1",
    is_weighted: bool = False,
    weight: float = 1.0,
    ema_cfg: EmaConfig = EmaConfig(),
    ema_enabled: bool = True,
    remat: bool = False,
) -> Callable:
    """(state, lq, gt, key[, cond]) -> (state, metrics): diffusion on latents.

    The compressor's params are closed over with stop_gradient (parity with
    requires_grad=False, ref latent_denoising_model.py:39-43).

    ``cond`` is an optional extra-conditioning pytree forwarded to
    ``model_apply(params, xt, latent_lq, tvec, cond)`` — the bokeh task's
    lens tuple flows through here (ref latent-bokeh
    latent_denoising_model.py:161-174 passes lens_info via sde.noise_fn).
    ``ema_enabled=False`` reproduces the bokeh variant, whose reference
    comments the EMA update out.  ``remat=True`` rematerializes the score
    net's forward in the backward pass (HBM for FLOPs — the 1024px-crop
    recipe's memory lever; the frozen encode holds no gradient state).
    """
    if remat:
        model_apply = jax.checkpoint(model_apply)
    frozen = jax.lax.stop_gradient(latent_params)

    def train_step(state: TrainState, lq, gt, key, cond=None):
        key = jax.random.fold_in(key, state.step)
        # one 2B-batch encode instead of two B-batch calls: the frozen
        # compressor's convs run at double the batch (better MXU fill at
        # the recipe's small per-step batches), same math
        lat, _ = encode_fn(frozen, jnp.concatenate([lq, gt], axis=0))
        latent_lq, latent_gt = jnp.split(jax.lax.stop_gradient(lat), 2, axis=0)
        timesteps, xt = sde.generate_random_states(key, latent_gt, latent_lq)
        tvec = timesteps.reshape(-1)

        def loss_fn(params):
            if cond is None:
                noise = model_apply(params, xt, latent_lq, tvec)
            else:
                noise = model_apply(params, xt, latent_lq, tvec, cond)
            score = sde.score_from_noise(noise, timesteps)
            pred = sde.reverse_sde_step_mean(xt, latent_lq, score, timesteps)
            target = sde.reverse_optimum_step(xt, latent_gt, latent_lq, timesteps)
            w = sde.weights(tvec) if is_weighted else None
            return weight * matching_loss(pred, target, loss_type, w)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_state = ema_lib.update(state.ema, params, ema_cfg) if ema_enabled else state.ema
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state, ema=ema_state),
            {"loss": loss},
        )

    return train_step


def make_latent_sampler(
    sde: IRSDE,
    model_apply: Callable,  # (params, xt, cond, tvec) -> noise
    encode_fn: Callable,  # (latent_params, x) -> (latent, skips)
    decode_fn: Callable,  # (latent_params, latent, skips) -> image
    latent_params: Any,
    mode: str = "sde",
    steps: Optional[int] = None,
    cast_params=None,
    chunk: Optional[int] = None,  # 0 disables chunking (see sampling._sample_chunk)
):
    """jitted ``sample(params, lq, key[, cond]) -> restored image``: encode
    LQ, noise the latent, reverse-diffuse, decode with the LQ skips.  The
    optional ``cond`` pytree (e.g. the bokeh lens tuple) is forwarded to
    ``model_apply`` each step.  ``cast_params``: see
    ``sampling.cast_f32_leaves`` (applies to the score net, which is read
    every step; the one-shot compressor stays f32)."""
    from functools import partial

    from ..sampling import _batch_dim_sharded, _sample_chunk, cast_f32_leaves
    from ..sde import samplers

    def sample_one(params, lq, key, cond):
        latent_lq, hidden = encode_fn(latent_params, lq)
        # key: one PRNGKey, or a (B, 2) per-sample key batch (reproducible
        # serving — see sde.rng / exporting.py per_sample_seed)
        k_init, k_chain = samplers.split_key(key)
        noisy = sde.noise_state(k_init, latent_lq)

        def noise_fn(x, mu, tvec):
            if cond is None:
                return model_apply(params, x, mu, tvec)
            return model_apply(params, x, mu, tvec, cond)

        if mode == "sde":
            latent = samplers.reverse_sde(sde, noise_fn, noisy, latent_lq, k_chain, steps=steps)
        elif mode == "posterior":
            latent = samplers.reverse_posterior(sde, noise_fn, noisy, latent_lq, k_chain, steps=steps)
        else:
            latent = samplers.reverse_ode(sde, noise_fn, noisy, latent_lq, steps=steps)
        H, W = lq.shape[1], lq.shape[2]
        return decode_fn(latent_params, latent, hidden)[:, :H, :W, :]

    @partial(jax.jit, static_argnames="c")
    def _sample(params, lq, key, cond, c):
        if cast_params is not None:
            params = cast_f32_leaves(params, cast_params)
        B = lq.shape[0]
        if c == B:
            return sample_one(params, lq, key, cond)
        # Chunked full-pipeline sampling: at 1024px the compressor's skip
        # pyramid for the WHOLE batch is what blows HBM (batch 16 OOMs,
        # BENCH.md) — lax.map over chunks materializes encode/scan/decode
        # state for one chunk at a time, so any batch runs at the chunk
        # operating point.
        reshard = lambda a: a.reshape(B // c, c, *a.shape[1:])
        lqs = reshard(lq)
        if samplers.is_key_batch(key):
            keys = reshard(key)  # per-sample keys: rows follow lqs
        else:
            keys = jax.random.split(key, B // c)
        conds = None if cond is None else jax.tree_util.tree_map(reshard, cond)
        out = jax.lax.map(
            lambda a: sample_one(params, a[0], a[1], a[2]), (lqs, keys, conds)
        )
        return out.reshape(B, *out.shape[2:])

    def sample(params, lq, key, cond=None):
        B = lq.shape[0]
        c = B if _batch_dim_sharded(lq) else _sample_chunk(B, chunk)
        return _sample(params, lq, key, cond, c=c)

    return sample
