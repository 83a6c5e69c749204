#!/usr/bin/env python
"""Unified training driver.

Replaces the reference's 11 near-identical per-task ``train.py`` copies
(ref config/<task>/train.py:43-315) with one driver: the task is selected by
the YAML (``model`` / ``distortion``) and per-task deltas are degradation
plugins (ref §3.4 — denoising/inpainting/sr synthesize LQ in the loop).

CLI parity:  python tools/train.py -opt=<yml>   (``--launcher`` accepted and
ignored — JAX is single-controller; multi-host comes from
``jax.distributed.initialize`` via env, not a launcher).
"""

from __future__ import annotations

import argparse
import logging
import math
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
)
import jax.numpy as jnp
import numpy as np

from image_restoration_sde_tpu.data import create_dataloader, create_dataset
from image_restoration_sde_tpu.models import build_network
from image_restoration_sde_tpu.parallel import make_mesh, process_is_primary, replicate, shard_batch
from image_restoration_sde_tpu.sampling import make_restoration_sampler, pad_to_bucket, unpad
from image_restoration_sde_tpu.sde import IRSDE
from image_restoration_sde_tpu.training import (
    build_lr_schedule,
    create_train_state,
    make_train_step,
)
from image_restoration_sde_tpu.training.checkpoint import (
    finalize_checkpoints,
    load_params,
    load_training_state,
    save_checkpoint,
)
from image_restoration_sde_tpu.training.optimizers import build_from_options
from image_restoration_sde_tpu.utils import metrics, options, tensor2img
from image_restoration_sde_tpu.utils.degradations import mask_to, upscale
from image_restoration_sde_tpu.utils.logging_utils import (
    TensorboardWriter,
    mkdir_and_rename,
    mkdirs,
    setup_logger,
)


def prepare_pair(opt, batch, rng):
    """Per-distortion LQ/GT preparation (ref §3.4 task deltas)."""
    distortion = opt.get("distortion")
    if distortion == "inpainting":
        gt = batch["GT"]
        lq = mask_to(gt, opt["degradation"]["mask_root"], rng=rng).astype(np.float32)
        return lq, gt
    if distortion == "sr":
        lq = upscale(batch["LQ"], int(opt["degradation"]["scale"]))
        return lq.astype(np.float32), batch["GT"]
    return batch["LQ"], batch["GT"]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True, help="Path to option YAML file.")
    parser.add_argument("--launcher", default="none", help="compat; unused")
    parser.add_argument("--local_rank", type=int, default=0, help="compat; unused")
    args = parser.parse_args()
    opt = options.parse(args.opt, is_train=True)

    # resume state (ref train.py:83-92)
    resume_state_path = opt["path"].get("resume_state")
    if resume_state_path:
        options.check_resume(opt, int(os.path.basename(resume_state_path)))

    opt = options.dict_to_nonedict(opt)
    rank0 = process_is_primary()

    if rank0:
        if not resume_state_path:
            mkdir_and_rename(opt["path"]["experiments_root"])
        mkdirs([opt["path"][k] for k in ("models", "training_state", "log", "val_images")])
        setup_logger("base", opt["path"]["log"], "train_" + opt["name"], screen=True, tofile=True)
        setup_logger("val", opt["path"]["log"], "val_" + opt["name"], screen=True, tofile=True)
    else:
        setup_logger("base", opt["path"]["log"], "train", screen=False)
    logger = logging.getLogger("base")
    logger_val = logging.getLogger("val")
    if rank0:
        logger.info(options.dict2str(opt))
    tb = TensorboardWriter(os.path.join(opt["path"]["experiments_root"], "tb_logger")) if rank0 and opt["use_tb_logger"] else None

    seed = opt["train"]["manual_seed"] or random.randint(1, 10000)
    logger.info(f"Random seed: {seed}")
    np.random.seed(seed)
    random.seed(seed)
    base_key = jax.random.PRNGKey(seed)

    # ---------------------------------------------------------------- data
    train_loader = val_loader = None
    total_iters = int(opt["train"]["niter"])
    for phase, dataset_opt in opt["datasets"].items():
        if phase == "train":
            train_set = create_dataset(dataset_opt)
            ratio = dataset_opt["dataset_enlarge_ratio"] or 200
            train_loader = create_dataloader(train_set, dataset_opt, opt, seed=seed, ratio=ratio)
            steps_per_epoch = train_loader.steps_per_epoch()
            logger.info(
                f"Train set: {len(train_set)} images, {steps_per_epoch} iters/epoch, target {total_iters} iters"
            )
        elif phase == "val":
            val_set = create_dataset(dataset_opt)
            val_loader = create_dataloader(val_set, dataset_opt, opt)
            logger.info(f"Val set: {len(val_set)} images")
    assert train_loader is not None

    # ------------------------------------------------------------- model
    which, setting = options.network_setting(opt)
    net = build_network(which, setting)
    sde_opt = opt["sde"]
    sde = IRSDE.create(
        max_sigma=sde_opt["max_sigma"],
        T=int(sde_opt["T"]),
        schedule=sde_opt["schedule"],
        eps=float(sde_opt["eps"]),
    )

    lr_schedule = build_lr_schedule(opt["train"])
    tx = build_from_options(opt["train"], lr_schedule)
    train_step = make_train_step(
        sde,
        net.apply,
        tx,
        loss_type=opt["train"]["loss_type"] or "l1",
        is_weighted=bool(opt["train"]["is_weighted"]),
        weight=float(opt["train"]["weight"] or 1.0),
    )

    # init / load params
    gt_size = int(opt["datasets"]["train"]["GT_size"])
    in_nc = int(setting.get("in_nc") or setting.get("img_channel") or 3)
    dummy = jnp.zeros((1, gt_size, gt_size, in_nc), jnp.float32)
    params = jax.jit(net.init)(base_key, dummy, dummy, jnp.array([1.0]))
    n_params = sum(p.size for p in jax.tree.leaves(params))
    logger.info(f"Network {which}: {n_params:,d} parameters")

    load_path = opt["path"]["pretrain_model_G"]
    if load_path and not resume_state_path:
        logger.info(f"Loading model for G [{load_path}]")
        params = load_params(load_path, params)

    state = create_train_state(params, tx)
    start_epoch, current_step = 0, 0
    if resume_state_path:
        state, start_epoch, current_step = load_training_state(resume_state_path, state)
        logger.info(f"Resuming training from epoch {start_epoch}, iter {current_step}")

    # ------------------------------------------------------------ devices
    mesh = make_mesh()
    state = replicate(state, mesh)
    jit_step = jax.jit(train_step, donate_argnums=0)
    sampler = make_restoration_sampler(sde, net.apply, mode=sde_opt["sampling_mode"] or "sde",
                                       steps=int(sde_opt["sample_T"]) if sde_opt["sample_T"] else None)

    deg_rng = np.random.default_rng(seed + 77)
    print_freq = int(opt["logger"]["print_freq"] or 100)
    save_freq = int(opt["logger"]["save_checkpoint_freq"] or 5000)
    val_freq = int(opt["train"]["val_freq"] or 5000)
    best_psnr, best_iter = 0.0, 0
    t_last, steps_last = time.perf_counter(), current_step

    logger.info("Start training...")
    batch_iter = iter(train_loader)
    while current_step < total_iters:
        batch = next(batch_iter)
        current_step += 1
        epoch = current_step // max(1, steps_per_epoch)

        lq, gt = prepare_pair(opt, batch, deg_rng)
        lq, gt = shard_batch((jnp.asarray(lq), jnp.asarray(gt)), mesh)
        state, train_metrics = jit_step(state, lq, gt, base_key)

        if current_step % print_freq == 0 and rank0:
            loss = float(train_metrics["loss"])
            now = time.perf_counter()
            ips = (current_step - steps_last) * lq.shape[0] / (now - t_last)
            t_last, steps_last = now, current_step
            lr = float(lr_schedule(current_step))
            logger.info(
                f"<epoch:{epoch:3d}, iter:{current_step:8,d}, lr:{lr:.3e}, img/s:{ips:.1f}> loss: {loss:.4e}"
            )
            if tb:
                tb.add_scalar("loss", loss, current_step)
                tb.add_scalar("img_per_sec", ips, current_step)

        if val_loader is not None and current_step % val_freq == 0 and rank0:
            avg_psnr, n = 0.0, 0
            val_key = jax.random.fold_in(base_key, current_step)
            max_val = opt["datasets"]["val"]["max_images"] or 16
            for i, vb in enumerate(val_loader):
                if i >= max_val:
                    break
                vlq, hw = pad_to_bucket(vb["LQ"], 64)
                out = unpad(sampler(state.params, jnp.asarray(vlq), val_key), hw)
                out_img = tensor2img(out[0])
                gt_img = tensor2img(vb["GT"][0])
                avg_psnr += metrics.calculate_psnr(out_img, gt_img)
                n += 1
                if i < 3:
                    from image_restoration_sde_tpu.data.io_utils import save_img

                    save_img(out_img, os.path.join(opt["path"]["val_images"], f"{current_step}_{i}.png"))
            avg_psnr /= max(1, n)
            if avg_psnr > best_psnr:
                best_psnr, best_iter = avg_psnr, current_step
            logger_val.info(
                f"<epoch:{epoch:3d}, iter:{current_step:8,d}, psnr: {avg_psnr:.6f}, "
                f"best psnr: {best_psnr:.6f} @ iter {best_iter:,d}>"
            )
            if tb:
                tb.add_scalar("val_psnr", avg_psnr, current_step)

        if current_step % save_freq == 0 and rank0:
            logger.info("Saving models and training states.")
            save_checkpoint(opt["path"], jax.device_get(state), epoch, current_step)

    batch_iter.close()  # stop the prefetch thread before interpreter exit
    if rank0:
        logger.info("Saving the final model.")
        save_checkpoint(opt["path"], jax.device_get(state), epoch, current_step)
        logger.info("End of training.")
        if tb:
            tb.flush()
    finalize_checkpoints()


if __name__ == "__main__":
    main()
