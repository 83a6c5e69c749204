"""Task runners: build (state, step, validate) per YAML ``model`` type.

Replaces the reference's per-task model-wrapper classes (§2.3 of SURVEY):

- ``denoising``          -> PixelDiffusionTask (IR-SDE on pixels; covers
  derain/deblur/deshadow/dehaze + inpainting/sr degradation plugins, and
  the DenoisingSDE variant when ``distortion == denoising``)
- ``latent``             -> CompressorTask (Refusion compressor pretraining)
- ``latent_denoising``   -> LatentDiffusionTask (frozen compressor +
  IR-SDE on latents)

Each runner owns its nets/sde/optimizer and exposes:
``state`` (TrainState), ``step(state, batch, key)`` (device step including
host-side degradation prep), ``validate(state, loader, key, out_dir, step)``
(returns {'psnr': ...}), ``params_trees()`` (label -> params for
checkpointing).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .data.io_utils import save_img
from .models import build_network
from .parallel import make_mesh, process_is_primary, replicate, shard_batch
from .sampling import make_denoising_sampler, make_restoration_sampler, pad_to_bucket, unpad
from .sde import IRSDE, samplers
from .sde.denoising_sde import DenoisingSDE
from .training import (
    build_lr_schedule,
    create_train_state,
    make_denoising_train_step,
    make_train_step,
)
from .training.checkpoint import load_params
from .training.latent import (
    make_compressor_train_step,
    make_latent_sampler,
    make_latent_train_step,
)
from .training.optimizers import build_from_options
from .utils import metrics, options, tensor2img
from .utils.degradations import add_noise, mask_to, upscale


def effective_distortion(opt) -> str:
    """Infer the degradation plugin.  The reference hardcodes it per task
    directory (some shipped configs carry stale ``distortion`` keys, e.g.
    inpainting says 'derain' — ref config/inpainting/options/train/ir-sde.yml);
    we infer from the telltale config fields instead."""
    deg = opt["degradation"] or {}
    if deg.get("mask_root"):
        return "inpainting"
    if opt["distortion"] == "sr":
        return "sr"
    if opt["distortion"] == "denoising":
        return "denoising"
    if opt["distortion"] is None and (opt["datasets"] or {}).get("train", {}).get("mode") == "GT":
        return "denoising"
    return opt["distortion"] or "paired"


def build_task(opt, mesh, seed: int, base_key):
    model_type = opt["model"]
    if model_type == "denoising" and effective_distortion(opt) == "denoising":
        return GaussianDenoisingTask(opt, mesh, seed, base_key)
    if model_type in ("denoising", "sde"):
        return PixelDiffusionTask(opt, mesh, seed, base_key)
    if model_type == "latent":
        return CompressorTask(opt, mesh, seed, base_key)
    if model_type == "latent_denoising":
        if _dataset_mode(opt).startswith("Bokeh"):
            return BokehLatentDiffusionTask(opt, mesh, seed, base_key)
        return LatentDiffusionTask(opt, mesh, seed, base_key)
    raise NotImplementedError(f"model type {model_type!r}")


def _dataset_mode(opt) -> str:
    dsets = opt["datasets"] or {}
    for key in ("train", *dsets.keys()):
        if dsets.get(key):
            return dsets[key].get("mode", "")
    return ""


def _make_irsde(sde_opt) -> IRSDE:
    return IRSDE.create(
        max_sigma=sde_opt["max_sigma"],
        T=int(sde_opt["T"]),
        schedule=sde_opt["schedule"],
        eps=float(sde_opt["eps"]),
    )


def _torch_rules_if_pth(path, which, setting):
    """Key rules for importing a reference ``.pth`` into net ``which`` —
    None for orbax paths (load_params dispatches on the extension)."""
    if path and str(path).endswith(".pth"):
        from .utils.torch_import import rules_for_network

        return rules_for_network(which, setting)
    return None


def _init_params(net, key, shape, n_args=3):
    dummy = jnp.zeros(shape, jnp.float32)
    if n_args == 3:
        return jax.jit(net.init)(key, dummy, dummy, jnp.array([1.0]))
    return jax.jit(net.init)(key, dummy)


class _Base:
    def __init__(self, opt, mesh, seed, base_key):
        self.opt = opt
        self.mesh = mesh
        self.seed = seed
        self.base_key = base_key
        self.deg_rng = np.random.default_rng(seed + 77)
        # test-time configs carry no train: section; a zero-lr placeholder
        # keeps TrainState construction uniform
        train_opt = opt["train"] or options.dict_to_nonedict(
            {"lr_G": 0.0, "lr_scheme": "MultiStepLR", "lr_steps": []}
        )
        self.train_opt = train_opt
        self.lr_schedule = build_lr_schedule(train_opt)
        self.tx = build_from_options(train_opt, self.lr_schedule)

    def _loss_kwargs(self):
        t = self.train_opt
        return dict(
            loss_type=t["loss_type"] or "l1",
            is_weighted=bool(t["is_weighted"]),
            weight=float(t["weight"] or 1.0),
        )

    def _remat(self):
        return bool(self.train_opt.get("remat"))

    def n_params(self):
        return sum(
            sum(p.size for p in jax.tree.leaves(tree)) for tree in self.params_trees().values()
        )

    def _globalize(self, x):
        """Place a host-side sampler input on the computation's device set.

        Single-process: identity (jit commits it to the default device).
        Multi-process: the sampler's params are global mesh arrays, so every
        input must be a global array on the same mesh — each process holds
        the identical full value (unsharded EvalLoader), which is exactly a
        replicated global array.  Required for multi-host-safe validation
        (ref rank-0 val, config/deraining/train.py:261-281)."""
        if jax.process_count() > 1:
            return replicate(jnp.asarray(x), self.mesh)
        return jnp.asarray(x)

    def _save_val_images(self, out_img, out_dir, step, i):
        """Save the first few validation outputs (primary process only).
        For stereo (6ch) outputs, split_eyes writes one PNG per eye — cv2
        cannot encode 6 channels (ref stereo-sr/train.py:282-287 validates
        on the concatenated eyes; PSNR here does the same upstream)."""
        if i < 3 and process_is_primary():
            from .utils.img_utils import split_eyes

            for eye, img in split_eyes(out_img):
                save_img(img, os.path.join(out_dir, f"{step}_{i}{eye}.png"))

    def maybe_load_pretrained(self, resume: bool):
        raise NotImplementedError


class PixelDiffusionTask(_Base):
    """IR-SDE on pixels (ref DenoisingModel, denoising_model.py:25-199)."""

    def __init__(self, opt, mesh, seed, base_key):
        super().__init__(opt, mesh, seed, base_key)
        which, setting = options.network_setting(opt)
        self.stereo = _dataset_mode(opt).startswith("Ste")
        if self.stereo and which == "ConditionalNAFNet":
            # the stereo-sr task dir ships its own ConditionalNAFNet with
            # SCAM fusion under the same class name (SURVEY §2.2)
            which = "StereoConditionalNAFNet"
        self.which, self.setting = which, setting
        self.net = build_network(which, setting)
        self.sde = _make_irsde(opt["sde"])
        gt_size = int(opt["datasets"]["train"]["GT_size"]) if opt["is_train"] else 64
        in_nc = int(setting.get("in_nc") or setting.get("img_channel") or 3)
        if self.stereo:
            in_nc *= 2
        params = _init_params(self.net, base_key, (1, gt_size, gt_size, in_nc))
        self.state = create_train_state(params, self.tx)
        self._train_step = make_train_step(
            self.sde, self.net.apply, self.tx, remat=self._remat(), **self._loss_kwargs()
        )
        self._jit_step = jax.jit(self._train_step, donate_argnums=0)
        mode = opt["sde"]["sampling_mode"] or "sde"
        steps = int(opt["sde"]["sample_T"]) if opt["sde"]["sample_T"] else None
        self.sampler = make_restoration_sampler(self.sde, self.net.apply, mode=mode, steps=steps)

    def params_trees(self):
        return {"G": self.state.params, "EMA": self.state.ema.params}

    def maybe_load_pretrained(self, resume: bool):
        load_path = self.opt["path"]["pretrain_model_G"]
        if load_path and not resume:
            self.state = self.state.replace(
                params=load_params(
                    load_path, self.state.params,
                    torch_rules=_torch_rules_if_pth(load_path, self.which, self.setting),
                )
            )

    def prepare_pair(self, batch) -> Tuple[np.ndarray, np.ndarray]:
        distortion = effective_distortion(self.opt)
        if distortion == "inpainting":
            gt = batch["GT"]
            lq = mask_to(gt, self.opt["degradation"]["mask_root"], rng=self.deg_rng)
            return lq.astype(np.float32), gt
        if distortion == "sr":
            return (
                upscale(batch["LQ"], int(self.opt["degradation"]["scale"])).astype(np.float32),
                batch["GT"],
            )
        return batch["LQ"], batch["GT"]

    def step(self, state, batch, key):
        lq, gt = self.prepare_pair(batch)
        lq, gt = shard_batch((jnp.asarray(lq), jnp.asarray(gt)), self.mesh)
        return self._jit_step(state, lq, gt, key)

    def sample_batch(self, params, tiles, key):
        # _globalize: tiled eval must stay multi-host safe like infer/validate
        # (params may be global mesh arrays; tools/test.py tile path)
        return self.sampler(params, self._globalize(tiles), self._globalize(key))

    def infer(self, params, batch, key):
        """batch -> (restored NHWC f32, conditioning LQ used)."""
        if "GT" in batch and "LQ" not in batch:
            lq, _ = self.prepare_pair(batch)
        else:
            lq = self.prepare_pair({**batch, "GT": batch.get("GT", batch["LQ"])})[0]
        vlq, hw = pad_to_bucket(np.asarray(lq), 64)
        out = unpad(self.sampler(params, self._globalize(vlq), self._globalize(key)), hw)
        return np.asarray(out), np.asarray(lq)

    def validate(self, state, loader, key, out_dir, step) -> Dict[str, float]:
        max_val = self.opt["datasets"]["val"]["max_images"] or 16
        avg_psnr, n = 0.0, 0
        for i, vb in enumerate(loader):
            if i >= max_val:
                break
            lq, gt = self.prepare_pair(vb)
            vlq, hw = pad_to_bucket(np.asarray(lq), 64)
            out = unpad(self.sampler(state.params, self._globalize(vlq), self._globalize(key)), hw)
            out_img = tensor2img(out[0])
            avg_psnr += metrics.calculate_psnr(out_img, tensor2img(gt[0]))
            n += 1
            self._save_val_images(out_img, out_dir, step, i)
        return {"psnr": avg_psnr / max(1, n)}


class GaussianDenoisingTask(_Base):
    """DenoisingSDE task (ref config/denoising-sde, §3.4): GT-only data,
    noisy state IS the input; sigma^2-weighted loss; test = reverse ODE from
    the optimal timestep for the degradation sigma."""

    def __init__(self, opt, mesh, seed, base_key):
        super().__init__(opt, mesh, seed, base_key)
        which, setting = options.network_setting(opt)
        setting = dict(setting)
        setting["conditional"] = False
        self.which, self.setting = which, setting
        self.net = build_network(which, setting)
        sde_opt = opt["sde"]
        self.sde = DenoisingSDE.create(
            max_sigma=sde_opt["max_sigma"], T=int(sde_opt["T"]), schedule=sde_opt["schedule"]
        )
        gt_size = int(opt["datasets"]["train"]["GT_size"]) if opt["is_train"] else 64
        in_nc = int(setting.get("in_nc") or setting.get("img_channel") or 3)
        dummy = jnp.zeros((1, gt_size, gt_size, in_nc), jnp.float32)
        params = jax.jit(self.net.init)(base_key, dummy, None, jnp.array([1.0]))
        self.state = create_train_state(params, self.tx)

        def apply_uncond(p, x, tvec):
            return self.net.apply(p, x, None, tvec)

        self.apply_uncond = apply_uncond
        kwargs = self._loss_kwargs()
        kwargs["is_weighted"] = True if self.train_opt["is_weighted"] is None else kwargs["is_weighted"]
        self._jit_step = jax.jit(
            make_denoising_train_step(self.sde, apply_uncond, self.tx, **kwargs),
            donate_argnums=0,
        )
        self.sigma = float(opt["degradation"]["sigma"])
        self.sampler = make_denoising_sampler(self.sde, apply_uncond, self.sigma)

    def params_trees(self):
        return {"G": self.state.params, "EMA": self.state.ema.params}

    def maybe_load_pretrained(self, resume: bool):
        load_path = self.opt["path"]["pretrain_model_G"]
        if load_path and not resume:
            self.state = self.state.replace(
                params=load_params(
                    load_path, self.state.params,
                    torch_rules=_torch_rules_if_pth(load_path, self.which, self.setting),
                )
            )

    def step(self, state, batch, key):
        gt = shard_batch(jnp.asarray(batch["GT"]), self.mesh)
        return self._jit_step(state, gt, key)

    def sample_batch(self, params, tiles, key):
        return self.sampler(params, self._globalize(tiles))

    def infer(self, params, batch, key):
        if "LQ" in batch:
            noisy = jnp.asarray(batch["LQ"])
        else:
            noisy = add_noise(jnp.asarray(batch["GT"]), key, self.sigma)
        vlq, hw = pad_to_bucket(np.asarray(noisy), 64)
        out = unpad(self.sampler(params, self._globalize(vlq)), hw)
        return np.asarray(out), np.asarray(noisy)

    def validate(self, state, loader, key, out_dir, step) -> Dict[str, float]:
        max_val = self.opt["datasets"]["val"]["max_images"] or 16
        avg_psnr, n = 0.0, 0
        for i, vb in enumerate(loader):
            if i >= max_val:
                break
            gt = jnp.asarray(vb["GT"])
            noisy = add_noise(gt, jax.random.fold_in(key, i), self.sigma)
            vlq, hw = pad_to_bucket(np.asarray(noisy), 64)
            out = unpad(self.sampler(state.params, self._globalize(vlq)), hw)
            out_img = tensor2img(out[0])
            avg_psnr += metrics.calculate_psnr(out_img, tensor2img(gt[0]))
            n += 1
            self._save_val_images(out_img, out_dir, step, i)
        return {"psnr": avg_psnr / max(1, n)}


class CompressorTask(_Base):
    """Refusion compressor pretraining (ref unet-latent LatentModel)."""

    def __init__(self, opt, mesh, seed, base_key):
        super().__init__(opt, mesh, seed, base_key)
        which, setting = options.network_setting(opt, "network_L" if opt["network_L"] else "network_G")
        self.net = build_network(which, setting)
        gt_size = int(opt["datasets"]["train"]["GT_size"]) if opt["is_train"] else 64
        in_ch = int(setting.get("in_ch") or 3)
        params = _init_params(self.net, base_key, (1, gt_size, gt_size, in_ch), n_args=1)
        self.state = create_train_state(params, self.tx)

        net = self.net

        def encode_fn(p, x):
            return net.apply(p, x, method=net.encode)

        def decode_fn(p, l, h):
            return net.apply(p, l, h, method=net.decode)

        self.encode_fn, self.decode_fn = encode_fn, decode_fn
        self._jit_step = jax.jit(
            make_compressor_train_step(
                encode_fn, decode_fn, self.tx,
                loss_type=self.train_opt["loss_type"] or "l1",
                weight=float(self.train_opt["weight"] or 1.0),
            ),
            donate_argnums=0,
        )

        @jax.jit
        def cross_decode(p, lq, gt):
            l_lq, h_lq = encode_fn(p, lq)
            l_gt, _ = encode_fn(p, gt)
            return decode_fn(p, l_gt, h_lq)  # fake GT: GT latent + LQ skips

        self._cross_decode = cross_decode

    def params_trees(self):
        return {"L": self.state.params}

    def maybe_load_pretrained(self, resume: bool):
        load_path = self.opt["path"]["pretrain_model_L"] or self.opt["path"]["pretrain_model_G"]
        if load_path and not resume:
            key = "network_L" if self.opt["network_L"] else "network_G"
            which, setting = options.network_setting(self.opt, key)
            self.state = self.state.replace(
                params=load_params(
                    load_path, self.state.params,
                    torch_rules=_torch_rules_if_pth(load_path, which, setting),
                )
            )

    def step(self, state, batch, key):
        lq, gt = shard_batch((jnp.asarray(batch["LQ"]), jnp.asarray(batch["GT"])), self.mesh)
        return self._jit_step(state, lq, gt, key)

    def infer(self, params, batch, key):
        lq, hw = pad_to_bucket(np.asarray(batch["LQ"]), 64)
        gt = batch.get("GT", batch["LQ"])
        gtp, _ = pad_to_bucket(np.asarray(gt), 64)
        out = unpad(self._cross_decode(params, self._globalize(lq), self._globalize(gtp)), hw)
        return np.asarray(out), np.asarray(batch["LQ"])

    def validate(self, state, loader, key, out_dir, step) -> Dict[str, float]:
        max_val = self.opt["datasets"]["val"]["max_images"] or 8
        avg_psnr, n = 0.0, 0
        for i, vb in enumerate(loader):
            if i >= max_val:
                break
            lq, hw = pad_to_bucket(np.asarray(vb["LQ"]), 64)
            gt, _ = pad_to_bucket(np.asarray(vb["GT"]), 64)
            fake_gt = unpad(self._cross_decode(state.params, self._globalize(lq), self._globalize(gt)), hw)
            out_img = tensor2img(fake_gt[0])
            avg_psnr += metrics.calculate_psnr(out_img, tensor2img(vb["GT"][0]))
            n += 1
            if i < 3 and process_is_primary():
                save_img(out_img, os.path.join(out_dir, f"{step}_{i}_fakeGT.png"))
        return {"psnr": avg_psnr / max(1, n)}


class LatentDiffusionTask(_Base):
    """Refusion: IR-SDE on latents with a frozen compressor
    (ref latent_denoising_model.py:26-236)."""

    def __init__(self, opt, mesh, seed, base_key):
        super().__init__(opt, mesh, seed, base_key)
        which_g, setting_g = options.network_setting(opt, "network_G")
        self.net = build_network(which_g, setting_g)
        which_l, setting_l = options.network_setting(opt, "network_L")
        self.latent_net = build_network(which_l, setting_l)
        self.sde = _make_irsde(opt["sde"])

        gt_size = int(opt["datasets"]["train"]["GT_size"]) if opt["is_train"] else 64
        in_ch = int(setting_l.get("in_ch") or 3)
        k1, k2 = jax.random.split(base_key)
        self.latent_params = _init_params(self.latent_net, k1, (1, gt_size, gt_size, in_ch), n_args=1)

        lnet = self.latent_net

        def encode_fn(p, x):
            return lnet.apply(p, x, method=lnet.encode)

        def decode_fn(p, l, h):
            return lnet.apply(p, l, h, method=lnet.decode)

        self.encode_fn, self.decode_fn = encode_fn, decode_fn

        # score net operates on latents
        embed_dim = int(setting_l.get("embed_dim") or 4)
        depth_red = 2 ** (len(setting_l.get("ch_mult") or [1, 2, 4, 4]) - 1)
        lat_size = max(gt_size // depth_red, 4)
        params = self._init_score_params(k2, (1, lat_size, lat_size, embed_dim))
        self.state = create_train_state(params, self.tx)
        self._mode = opt["sde"]["sampling_mode"] or "sde"
        self._steps = int(opt["sde"]["sample_T"]) if opt["sde"]["sample_T"] else None
        self._sampler = None  # built after latent params are loaded

    def _init_score_params(self, key, shape):
        return _init_params(self.net, key, shape)

    def _build_fns(self):
        self._jit_step = jax.jit(
            make_latent_train_step(
                self.sde, self.net.apply, self.encode_fn, self.latent_params, self.tx,
                **self._loss_kwargs(),
            ),
            donate_argnums=0,
        )
        self._sampler = make_latent_sampler(
            self.sde, self.net.apply, self.encode_fn, self.decode_fn,
            self.latent_params, mode=self._mode, steps=self._steps,
        )

    def params_trees(self):
        return {"G": self.state.params, "EMA": self.state.ema.params}

    def maybe_load_pretrained(self, resume: bool):
        load_l = self.opt["path"]["pretrain_model_L"]
        if load_l:
            from .utils.torch_import import latent_unet_key_rules

            _, setting_l = options.network_setting(self.opt, "network_L")
            rules = latent_unet_key_rules(len(setting_l.get("ch_mult") or [1, 2, 4, 4]))
            self.latent_params = load_params(load_l, self.latent_params, torch_rules=rules)
        load_g = self.opt["path"]["pretrain_model_G"]
        if load_g and not resume:
            which_g, setting_g = options.network_setting(self.opt, "network_G")
            self.state = self.state.replace(
                params=load_params(
                    load_g, self.state.params,
                    torch_rules=_torch_rules_if_pth(load_g, which_g, setting_g),
                )
            )
        self._build_fns()

    def step(self, state, batch, key):
        if self._sampler is None:
            self._build_fns()
        lq, gt = shard_batch((jnp.asarray(batch["LQ"]), jnp.asarray(batch["GT"])), self.mesh)
        return self._jit_step(state, lq, gt, key)

    def sample_batch(self, params, tiles, key):
        if self._sampler is None:
            self._build_fns()
        return self._sampler(params, self._globalize(tiles), self._globalize(key))

    def infer(self, params, batch, key):
        if self._sampler is None:
            self._build_fns()
        vlq, hw = pad_to_bucket(np.asarray(batch["LQ"]), 64)
        out = unpad(self._sampler(params, self._globalize(vlq), self._globalize(key)), hw)
        return np.asarray(out), np.asarray(batch["LQ"])

    def validate(self, state, loader, key, out_dir, step) -> Dict[str, float]:
        if self._sampler is None:
            self._build_fns()
        max_val = self.opt["datasets"]["val"]["max_images"] or 8
        avg_psnr, n = 0.0, 0
        for i, vb in enumerate(loader):
            if i >= max_val:
                break
            vlq, hw = pad_to_bucket(np.asarray(vb["LQ"]), 64)
            out = unpad(self._sampler(state.params, self._globalize(vlq), self._globalize(key)), hw)
            out_img = tensor2img(out[0])
            avg_psnr += metrics.calculate_psnr(out_img, tensor2img(vb["GT"][0]))
            n += 1
            if i < 3 and process_is_primary():
                save_img(out_img, os.path.join(out_dir, f"{step}_{i}.png"))
        return {"psnr": avg_psnr / max(1, n)}


class BokehLatentDiffusionTask(LatentDiffusionTask):
    """Latent diffusion with lens conditioning (ref latent-bokeh task:
    latent_denoising_model.py:143-189 — lens_info kwarg flows through
    sde.noise_fn into the score net).  Reuses the shared latent train
    step/sampler via their ``cond`` hook; EMA is disabled, matching the
    reference bokeh variant which comments the EMA update out."""

    def __init__(self, opt, mesh, seed, base_key):
        which_g, _ = options.network_setting(opt, "network_G")
        if which_g == "ConditionalNAFNet":
            opt["network_G"]["which_model"] = "BokehConditionalNAFNet"
            opt["network_G"].pop("which_model_G", None)
        super().__init__(opt, mesh, seed, base_key)

    def _init_score_params(self, key, shape):
        dummy = jnp.zeros(shape, jnp.float32)
        lens = (jnp.zeros((1,)), jnp.zeros((1,)), jnp.zeros((1,)))
        return jax.jit(
            lambda k, x: self.net.init(k, x, x, jnp.array([1.0]), lens_info=lens)
        )(key, dummy)

    def _lens(self, batch):
        return (
            jnp.asarray(batch["src_lens"]).reshape(-1),
            jnp.asarray(batch["tgt_lens"]).reshape(-1),
            jnp.asarray(batch["disparity"]).reshape(-1),
        )

    def _build_fns(self):
        net_apply = self.net.apply

        def apply_with_lens(params, xt, cond, tvec, lens):
            return net_apply(params, xt, cond, tvec, lens_info=lens)

        self._jit_step = jax.jit(
            make_latent_train_step(
                self.sde, apply_with_lens, self.encode_fn, self.latent_params,
                self.tx, ema_enabled=False, **self._loss_kwargs(),
            ),
            donate_argnums=0,
        )
        self._sampler = make_latent_sampler(
            self.sde, apply_with_lens, self.encode_fn, self.decode_fn,
            self.latent_params, mode=self._mode, steps=self._steps,
        )

    def step(self, state, batch, key):
        if self._sampler is None:
            self._build_fns()
        lq, gt = shard_batch((jnp.asarray(batch["LQ"]), jnp.asarray(batch["GT"])), self.mesh)
        return self._jit_step(state, lq, gt, key, self._lens(batch))

    def infer(self, params, batch, key):
        if self._sampler is None:
            self._build_fns()
        vlq, hw = pad_to_bucket(np.asarray(batch["LQ"]), 64)
        out = unpad(
            self._sampler(
                params, self._globalize(vlq), self._globalize(key),
                jax.tree.map(self._globalize, self._lens(batch)),
            ),
            hw,
        )
        return np.asarray(out), np.asarray(batch["LQ"])

    def validate(self, state, loader, key, out_dir, step) -> Dict[str, float]:
        if self._sampler is None:
            self._build_fns()
        max_val = self.opt["datasets"]["val"]["max_images"] or 8
        avg_psnr, n = 0.0, 0
        for i, vb in enumerate(loader):
            if i >= max_val:
                break
            out, _ = self.infer(state.params, vb, key)
            out_img = tensor2img(out[0])
            avg_psnr += metrics.calculate_psnr(out_img, tensor2img(vb["GT"][0]))
            n += 1
            if i < 3 and process_is_primary():
                save_img(out_img, os.path.join(out_dir, f"{step}_{i}.png"))
        return {"psnr": avg_psnr / max(1, n)}
