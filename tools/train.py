#!/usr/bin/env python
"""Unified training driver.

Replaces the reference's 11 near-identical per-task ``train.py`` copies
(ref config/<task>/train.py:43-315) with one driver: the YAML ``model`` /
``distortion`` keys select a task runner (image_restoration_sde_tpu.runners)
and per-task deltas are degradation/conditioning plugins.

CLI parity:  python tools/train.py -opt=<yml>   (``--launcher`` accepted and
ignored -- JAX is single-controller; multi-host init comes from the
environment, not a process launcher).
"""

from __future__ import annotations

import argparse
import logging
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
# sitecustomize clobbers JAX_PLATFORMS; IRSDE_PLATFORM=cpu forces CPU here
if os.environ.get("IRSDE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["IRSDE_PLATFORM"])
# multi-host: replaces torch.distributed.launch (ref train.py:28-40) —
# set IRSDE_MULTIHOST=1 to initialize.  On managed clusters (TPU pods,
# SLURM, k8s) jax autodetects the topology; elsewhere pass the coordinator
# explicitly via JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
# JAX_PROCESS_ID (this jax build has no generic env-var cluster plugin).
if os.environ.get("IRSDE_MULTIHOST") == "1":
    if os.environ.get("IRSDE_PLATFORM") == "cpu":
        # cross-process collectives on the CPU platform go through gloo
        jax.config.update(
            "jax_cpu_collectives_implementation",
            os.environ.get("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo"),
        )
    _kw = {}
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        _kw = dict(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    jax.distributed.initialize(**_kw)
# Training default: keep the pallas kernels OFF. Their custom-vjp backward
# is ~2% slower than XLA's fused bwd at the flagship train shapes
# (BENCH.md); they are a sampling-path win (tools/test.py keeps the
# measured batch>=4 gate). Read at package import, so set before it.
os.environ.setdefault("IRSDE_PALLAS_MIN_BATCH", "1000000000")
import numpy as np

from image_restoration_sde_tpu.data import create_dataloader, create_dataset
from image_restoration_sde_tpu.parallel import (
    make_mesh,
    process_is_primary,
    replicate,
    shape_based_tp_sharding,
    shard_tree,
)
from image_restoration_sde_tpu.runners import build_task
from image_restoration_sde_tpu.training.checkpoint import (
    finalize_checkpoints,
    load_training_state,
    save_checkpoint,
)
from image_restoration_sde_tpu.utils import options
from image_restoration_sde_tpu.utils.logging_utils import (
    TensorboardWriter,
    mkdir_and_rename,
    mkdirs,
    setup_logger,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True, help="Path to option YAML file.")
    parser.add_argument("--launcher", default="none", help="compat; unused")
    parser.add_argument("--local_rank", type=int, default=0, help="compat; unused")
    args = parser.parse_args()

    if jax.process_count() > 1:
        # First cross-process collective while all processes are still
        # tightly aligned (just after spawn/initialize): each collective
        # program's rendezvous has a short timeout, and the later stages
        # (dataset listing, jit compiles racing the shared compilation
        # cache) can skew processes past it. Aligning here keeps the
        # subsequent identical work roughly in lockstep.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("irsde_train_start")

    opt = options.parse(args.opt, is_train=True)

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
    tb = (
        TensorboardWriter(os.path.join(opt["path"]["experiments_root"], "tb_logger"))
        if rank0 and opt["use_tb_logger"]
        else None
    )

    seed = opt["train"]["manual_seed"]
    if seed is None:
        seed = random.randint(1, 10000)
    logger.info(f"Random seed: {seed}")
    np.random.seed(seed)
    random.seed(seed)
    base_key = jax.random.PRNGKey(seed)

    # ---------------------------------------------------------------- data
    train_loader = val_loader = None
    total_iters = int(opt["train"]["niter"])
    steps_per_epoch = 1
    for phase, dataset_opt in opt["datasets"].items():
        if phase == "train":
            train_set = create_dataset(dataset_opt)
            ratio = dataset_opt["dataset_enlarge_ratio"] or 200
            train_loader = create_dataloader(train_set, dataset_opt, opt, seed=seed, ratio=ratio)
            steps_per_epoch = train_loader.steps_per_epoch()
            logger.info(
                f"Train set: {len(train_set)} images, {steps_per_epoch} iters/epoch, "
                f"target {total_iters} iters"
            )
            logger.info(
                f"Data parallel: {jax.process_count()} process(es), global batch "
                f"{dataset_opt['batch_size']}, per-process batch "
                f"{getattr(train_loader, 'local_batch', dataset_opt['batch_size'])}"
            )
        elif phase == "val":
            val_set = create_dataset(dataset_opt)
            val_loader = create_dataloader(val_set, dataset_opt, opt)
            logger.info(f"Val set: {len(val_set)} images")
    assert train_loader is not None

    # ------------------------------------------------------------- task
    # Tensor parallelism: YAML ``train.model_parallel`` (or env IRSDE_TP)
    # sizes the mesh's 'model' axis; large kernels are column-sharded over
    # it (shape_based_tp_sharding) while batches stay on 'data'.  This
    # generalizes the reference's DDP-only stack (ref train.py:28-40);
    # model_parallel=1 (default) is exactly data parallelism.
    tp = int(os.environ.get("IRSDE_TP") or (opt["train"]["model_parallel"] or 1)) or 1
    mesh = make_mesh(model_parallel=tp)
    task = build_task(opt, mesh, seed, base_key)
    logger.info(f"Task {type(task).__name__}: {task.n_params():,d} parameters")
    task.maybe_load_pretrained(resume=bool(resume_state_path))

    state = task.state
    start_epoch, current_step = 0, 0
    target_sh = shape_based_tp_sharding(state, mesh) if tp > 1 else None
    if resume_state_path:
        # restore directly into the run's parallelism layout (checkpoints
        # are layout-portable: a dp-only save resumes a tp run and back)
        state, start_epoch, current_step = load_training_state(
            resume_state_path, state, shardings=target_sh
        )
        logger.info(f"Resuming training from epoch {start_epoch}, iter {current_step}")
    if tp > 1:
        if not resume_state_path:  # a resumed state already restored sharded
            state = shard_tree(state, target_sh)
        logger.info(
            f"Tensor parallel: mesh {dict(mesh.shape)} "
            f"(data {mesh.shape['data']} x model {mesh.shape['model']})"
        )
    else:
        state = replicate(state, mesh)

    print_freq = int(opt["logger"]["print_freq"] or 100)
    save_freq = int(opt["logger"]["save_checkpoint_freq"] or 5000)
    val_freq = int(opt["train"]["val_freq"] or 5000)
    best_psnr, best_iter = 0.0, 0
    t_last, steps_last = time.perf_counter(), current_step

    logger.info("Start training...")
    batch_iter = iter(train_loader)
    epoch = start_epoch
    while current_step < total_iters:
        batch = next(batch_iter)
        current_step += 1
        epoch = current_step // max(1, steps_per_epoch)

        state, train_metrics = task.step(state, batch, base_key)

        if current_step % print_freq == 0 and rank0:
            loss = float(train_metrics["loss"])
            now = time.perf_counter()
            bsz = len(next(iter(batch.values())))
            ips = (current_step - steps_last) * bsz / (now - t_last)
            t_last, steps_last = now, current_step
            lr = float(task.lr_schedule(current_step))
            msg = (
                f"<epoch:{epoch:3d}, iter:{current_step:8,d}, lr:{lr:.3e}, "
                f"img/s:{ips:.1f}> loss: {loss:.4e}"
            )
            extra = {k: float(v) for k, v in train_metrics.items() if k != "loss"}
            if extra:
                msg += " " + " ".join(f"{k}: {v:.4e}" for k, v in extra.items())
            logger.info(msg)
            if tb:
                tb.add_scalar("loss", loss, current_step)
                tb.add_scalar("img_per_sec", ips, current_step)

        if val_loader is not None and current_step % val_freq == 0:
            # EVERY process enters validation: the sampler is a jitted
            # computation over the global (multi-process) mesh arrays in
            # ``state``, so a rank-0-only call would deadlock under
            # multi-host (every process must join each collective
            # program).  The val loader is unsharded (same batches on all
            # processes, EvalLoader), so all processes compute identical
            # metrics; host-side work (image saves, logging, TB) stays
            # rank-0-only inside validate / below — matching the
            # reference's rank-0 validation semantics
            # (ref config/deraining/train.py:261-281).
            val_key = jax.random.fold_in(base_key, current_step)
            vm = task.validate(state, val_loader, val_key, opt["path"]["val_images"], current_step)
            if rank0:
                if vm["psnr"] > best_psnr:
                    best_psnr, best_iter = vm["psnr"], current_step
                logger_val.info(
                    f"<epoch:{epoch:3d}, iter:{current_step:8,d}, psnr: {vm['psnr']:.6f}, "
                    f"best psnr: {best_psnr:.6f} @ iter {best_iter:,d}>"
                )
                if tb:
                    tb.add_scalar("val_psnr", vm["psnr"], current_step)

        if current_step % save_freq == 0:
            if rank0:
                logger.info("Saving models and training states.")
            # EVERY process calls the save: orbax coordinates across hosts
            # (primary host writes, the rest join its barrier) — a
            # rank0-gated call would deadlock under multi-host. Single
            # process, this is exactly the reference's rank-0 save.
            save_checkpoint(opt["path"], jax.device_get(state), epoch, current_step)

    batch_iter.close()  # stop the prefetch thread before interpreter exit
    if rank0:
        logger.info("Saving the final model.")
    save_checkpoint(opt["path"], jax.device_get(state), epoch, current_step)
    if rank0:
        logger.info("End of training.")
        if tb:
            tb.flush()
    finalize_checkpoints()


if __name__ == "__main__":
    main()
