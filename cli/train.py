#!/usr/bin/env python
"""Training entry point — TPU twin of the reference trainer.

Mirrors the reference CLI (train.py / train_tnsm.py; run ``--variant tnsm``
for the TNSM trainer) on a jitted bf16 data-parallel step: per-epoch lr from
the warmup+cosine-restart schedule, checkpoint every ``--snapshots`` epochs
with in-loop eval + PSNR/SSIM/LPIPS, last-batch canary images, and a final
markdown metrics report (train.py:218-290).

Example:
  python cli/train.py --lol_v1 true --lmot false --nEpochs 300 --batchSize 8
  python cli/train.py --synthetic_steps 4 --nEpochs 2 --snapshots 1   # smoke
"""

from __future__ import annotations

import dataclasses
import os
import random
import sys
import time
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.data.datasets import EvalDataset, PairedFolderDataset, SceneFolderDataset
from hvi_cidnet_tpu.data.pipeline import TrainLoader
from hvi_cidnet_tpu.eval.evaluator import Evaluator, gates_for_dataset
from hvi_cidnet_tpu.eval.measure import fmt_metric, metrics
from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, init_cidnet
from hvi_cidnet_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params
from hvi_cidnet_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from hvi_cidnet_tpu.train.schedule import build_reference_schedule
from hvi_cidnet_tpu.train.trainer import (
    TrainConfig,
    make_optimizer,
    make_train_step,
    nonfinite_guard,
    set_learning_rate,
)
from hvi_cidnet_tpu.utils.config import option, selected_dataset


class SyntheticDataset:
    """Random low/high pairs for smoke-training without corpora on disk."""

    def __init__(self, crop: int, steps: int, batch: int):
        self.crop = crop
        self._len = steps * batch

    def __len__(self):
        return self._len

    def sample(self, index, rng):
        low = rng.uniform(0, 0.3, (self.crop, self.crop, 3)).astype(np.float32)
        high = np.clip(low * 3.0 + rng.normal(0, 0.02, low.shape), 0, 1).astype(np.float32)
        return low, high


def build_train_dataset(opt, name: str):
    crop = opt.cropSize
    if name == "lol_v1":
        return PairedFolderDataset(opt.data_train_lol_v1 + "/low", opt.data_train_lol_v1 + "/high", crop, length=485)
    if name == "lolv2_real":
        return PairedFolderDataset(opt.data_train_lolv2_real + "/Low", opt.data_train_lolv2_real + "/Normal", crop, length=685)
    if name == "lolv2_syn":
        return PairedFolderDataset(opt.data_train_lolv2_syn + "/Low", opt.data_train_lolv2_syn + "/Normal", crop, length=900)
    if name == "lmot":
        return PairedFolderDataset(opt.data_train_lmot_low, opt.data_train_lmot_high, crop)
    if name == "lol_blur":
        return SceneFolderDataset(opt.data_train_lol_blur, "blur", crop)
    if name == "SID":
        return SceneFolderDataset(opt.data_train_SID, "sid", crop)
    return SceneFolderDataset(opt.data_train_SICE, "sice", crop)  # SICE_mix / SICE_grad


def build_val(opt, name: str):
    table = {
        "lol_v1": (opt.data_val_lol_v1, opt.data_valgt_lol_v1, "LOLv1/", False),
        "lolv2_real": (opt.data_val_lolv2_real, opt.data_valgt_lolv2_real, "LOLv2_real/", False),
        "lolv2_syn": (opt.data_val_lolv2_syn, opt.data_valgt_lolv2_syn, "LOLv2_syn/", False),
        "lol_blur": (opt.data_val_lol_blur, opt.data_valgt_lol_blur, "LOL_blur/", False),
        "SID": (opt.data_val_SID, opt.data_valgt_SID, "SID/", False),
        "SICE_mix": (opt.data_val_SICE_mix, opt.data_valgt_SICE_mix, "SICE_mix/", True),
        "SICE_grad": (opt.data_val_SICE_grad, opt.data_valgt_SICE_grad, "SICE_grad/", True),
        "lmot": (opt.data_val_lmot, opt.data_valgt_lmot, "LMOT/", False),
    }
    val_dir, gt_dir, folder, pad = table[name]
    return EvalDataset(val_dir, pad=pad), gt_dir, folder


def _first_local_image(arr) -> np.ndarray:
    """First host-fetchable image of a (possibly multi-process) batch.

    In a pod run the output batch is sharded across processes; process 0
    fetches the lowest-indexed row its local devices own instead of the
    (non-addressable) global row 0.
    """
    if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
        shard = min(arr.addressable_shards, key=lambda s: s.index[0].start or 0)
        return np.asarray(shard.data)[0]
    return np.asarray(arr, np.float32)[0]


def main():
    opt = option().parse_args()
    from hvi_cidnet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache(opt.compile_cache)
    if opt.multihost:
        # pod launch: must run before the first backend touch (SURVEY §2.3
        # item 2; reference has no twin — single-GPU trainer train.py:34)
        from hvi_cidnet_tpu.parallel.multihost import initialize_distributed

        kwargs = {}
        if opt.coordinator_address is not None:
            kwargs["coordinator_address"] = opt.coordinator_address
        if opt.num_processes is not None:
            kwargs["num_processes"] = opt.num_processes
        if opt.process_id is not None:
            kwargs["process_id"] = opt.process_id
        initialize_distributed(**kwargs)
    multiproc = jax.process_count() > 1
    primary = jax.process_index() == 0

    def log(*a, **k):
        if primary:
            print(*a, **k)

    seed = opt.seed if opt.seed >= 0 else random.randint(1, 1_000_000)
    if multiproc and opt.seed < 0:
        raise SystemExit(
            "multihost training requires an explicit --seed: every process "
            "must draw the same global batch order and augmentation stream"
        )
    log(f"===> seed {seed}")
    if multiproc:
        log(f"===> multihost: {jax.process_count()} processes, "
            f"{jax.device_count()} global devices")
    if opt.grad_detect:
        jax.config.update("jax_debug_nans", True)

    synthetic = opt.synthetic_steps > 0
    ds_name = "synthetic" if synthetic else selected_dataset(opt)

    model_cfg = CIDNetConfig(variant=opt.variant)
    tcfg = TrainConfig(
        model=model_cfg,
        lr=opt.lr,
        hvi_weight=opt.HVI_weight,
        l1_weight=opt.L1_weight,
        d_weight=opt.D_weight,
        e_weight=opt.E_weight,
        p_weight=opt.P_weight,
        tnsm_weight=opt.tnsm_weight,
        use_perceptual=opt.use_perceptual,
        grad_clip_mode=("faithful" if (opt.grad_clip and opt.grad_clip_faithful) else "clip" if opt.grad_clip else "none"),
        compute_dtype=opt.compute_dtype,
        gamma_aug=opt.gamma,
        start_gamma=opt.start_gamma,
        end_gamma=opt.end_gamma,
        remat=opt.remat,
        grad_accum=opt.grad_accum,
    )

    log("===> Loading datasets")
    if synthetic:
        train_set = SyntheticDataset(opt.cropSize, opt.synthetic_steps, opt.batchSize)
        val_set = gt_dir = out_folder = None
    else:
        train_set = build_train_dataset(opt, ds_name)
        val_set, gt_dir, out_folder = build_val(opt, ds_name)

    log("===> Building model")
    params = init_cidnet(jax.random.PRNGKey(seed), model_cfg)
    if multiproc:
        # host numpy before the global device_put: every process computes the
        # identical init (same seed), and numpy input is the supported form
        # for a sharding that spans non-addressable devices
        params = jax.tree.map(np.asarray, params)
    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(params)
    ckpts = None
    if opt.ckpt_backend == "orbax":
        from hvi_cidnet_tpu.train.orbax_ckpt import OrbaxCheckpoints

        # every process opens the manager (orbax coordinates multi-process
        # writes itself; requires a shared checkpoint FS on pods)
        ckpts = OrbaxCheckpoints("./weights/train/orbax", max_to_keep=opt.ckpt_keep)
    start_epoch = 0
    if opt.start_epoch > 0 and ckpts is not None:
        params, opt_loaded, _ = ckpts.restore(opt.start_epoch, params, opt_state)
        if opt_loaded is not None:
            opt_state = opt_loaded
        start_epoch = opt.start_epoch
        log(f"resumed from orbax step {opt.start_epoch}")
    elif opt.start_epoch > 0:
        path = f"./weights/train/epoch_{opt.start_epoch}.npz"
        if multiproc:
            # checkpoints are written by process 0 only; other hosts may not
            # see the file (no shared FS) or may hold a stale one — load on
            # process 0 and broadcast, so every replica provably resumes
            # from the same bytes
            from jax.experimental import multihost_utils

            if primary:
                params_l, opt_l, _ = load_checkpoint(path, opt_state_template=opt_state)
                if opt_l is None:
                    opt_l = opt_state
            else:
                params_l, opt_l = params, opt_state  # structure/shape donors
            params, opt_state = multihost_utils.broadcast_one_to_all(
                (params_l, opt_l), is_source=primary
            )
        else:
            params, opt_state_loaded, _ = load_checkpoint(path, opt_state_template=opt_state)
            if opt_state_loaded is not None:
                opt_state = opt_state_loaded
        start_epoch = opt.start_epoch
        log(f"resumed from {path}")

    vgg_params = None
    if opt.use_perceptual:
        from hvi_cidnet_tpu.losses.vgg import init_vgg, load_vgg_torch

        if os.path.exists(opt.vgg_weights):
            vgg_params = load_vgg_torch(opt.vgg_weights)
            print(f"perceptual loss: VGG19 weights from {opt.vgg_weights}")
        elif opt.allow_random_vgg:
            vgg_params = init_vgg(jax.random.PRNGKey(0))
            print("perceptual loss: WARNING — no local VGG19 weights found; "
                  "using seeded init because --allow_random_vgg=true "
                  "(NOT reference-comparable)")
        else:
            # A run that silently optimizes features of a random network
            # "succeeds" while training against noise — disable loudly
            # instead (opt back in with --allow_random_vgg for smoke runs).
            tcfg = dataclasses.replace(tcfg, use_perceptual=False)
            print(f"perceptual loss: DISABLED — no VGG19 weights at "
                  f"{opt.vgg_weights}; pass --vgg_weights or set "
                  f"--allow_random_vgg=true to override")

    mesh = make_mesh(axis_names=("data",))
    n_dev = mesh.devices.size
    if n_dev > 1:
        params = shard_params(params, mesh)
        log(f"===> data-parallel over {n_dev} devices")
    sharding = batch_sharding(mesh) if n_dev > 1 else None

    # shard_map over the mesh when multi-chip: per-shard traces keep the
    # Mosaic kernels SPMD-legal (ops/pallas_gate.py)
    step = make_train_step(tcfg, optimizer, mesh=mesh if n_dev > 1 else None)
    sched = build_reference_schedule(
        opt.lr,
        opt.nEpochs,
        start_epoch=start_epoch,
        warmup_epochs=opt.warmup_epochs,
        start_warmup=opt.start_warmup,
        cos_restart=opt.cos_restart,
        cos_restart_cyclic=opt.cos_restart_cyclic,
    )
    if multiproc:
        # process-sharded feed: every process decodes only the rows its local
        # devices own; optimizer state must likewise live as a global
        # replicated array before entering the global-mesh jit
        from hvi_cidnet_tpu.parallel.mesh import replicated
        from hvi_cidnet_tpu.parallel.multihost import MultiHostTrainLoader

        opt_state = jax.device_put(
            jax.tree.map(np.asarray, opt_state), replicated(mesh)
        )
        loader = MultiHostTrainLoader(
            train_set, opt.batchSize, mesh=mesh, seed=seed,
            num_threads=opt.threads, shuffle=opt.shuffle,
        )
    else:
        loader = TrainLoader(
            train_set, opt.batchSize, seed=seed, num_threads=opt.threads,
            shuffle=opt.shuffle, sharding=sharding,
        )

    host_rng = random.Random(seed)
    psnrs, ssims, lpipss = [], [], []
    os.makedirs(opt.val_folder, exist_ok=True)

    for epoch in range(start_epoch + 1, opt.nEpochs + start_epoch + 1):
        opt_state = set_learning_rate(opt_state, sched(epoch - 1))
        epoch_loss, n_batches = 0.0, 0
        t0 = time.time()
        last_out = last_gt = None
        for low, high in loader.epoch():
            g = host_rng.randint(opt.start_gamma, opt.end_gamma) / 100.0 if opt.gamma else 1.0
            # numpy scalar (not jnp): multi-process jit requires non-global
            # inputs to be host values, which it replicates implicitly
            params, opt_state, loss, out = step(
                params, opt_state, low, high, np.float32(g), vgg_params
            )
            loss = float(loss)
            nonfinite_guard(loss, epoch, n_batches)
            epoch_loss += loss
            n_batches += 1
            last_out, last_gt = out, high
        dt = time.time() - t0
        log(
            f"===> Epoch[{epoch}]: Loss: {epoch_loss / max(n_batches, 1):.4f} || "
            f"lr={sched(epoch - 1):.3e} || {n_batches} steps in {dt:.1f}s"
        )
        # gradient-explosion canary images (train.py:84-89); process 0 only
        if last_out is not None and primary:
            from PIL import Image

            canary_dir = os.path.join(opt.val_folder, "training")
            os.makedirs(canary_dir, exist_ok=True)
            Image.fromarray((np.clip(_first_local_image(last_out), 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(canary_dir, "test.png"))
            Image.fromarray((np.clip(_first_local_image(last_gt), 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(canary_dir, "gt.png"))

        snapshot = epoch % opt.snapshots == 0
        if snapshot and ckpts is not None:
            # async orbax write: EVERY process calls save (orbax coordinates
            # shard writes + barriers); the loop continues while bytes land
            ckpts.save(epoch, params, opt_state)
            log(f"Checkpoint queued (orbax step {epoch})")
        if snapshot and primary:
            # replicated param/opt trees fetch whole on every process; only
            # process 0 touches the filesystem and runs in-loop eval
            if ckpts is None:
                ckpt = save_checkpoint(f"./weights/train/epoch_{epoch}.npz", params, opt_state, epoch)
                log(f"Checkpoint saved to {ckpt}")
            if val_set is not None:
                gates = gates_for_dataset(
                    lol=opt.lol_v1, v2=opt.lolv2_real, lmot=opt.lmot, alpha=0.8
                )
                # host copies: the evaluator's single-device jit cannot take
                # global (multi-process) arrays on process 0 alone
                eval_params = (
                    jax.tree.map(np.asarray, params) if multiproc
                    else {k: v for k, v in params.items()}
                )
                ev = Evaluator(eval_params, model_cfg, gates,
                               compute_dtype=jnp.dtype(opt.compute_dtype))
                out_dir = os.path.join(opt.val_folder, out_folder)
                ev.run_dataset(val_set, out_dir)
                avg_psnr, avg_ssim, avg_lpips = metrics(os.path.join(out_dir, "*.png"), gt_dir)
                log(f"===> Avg.PSNR: {avg_psnr:.4f} dB  SSIM: {avg_ssim:.4f}  LPIPS: {fmt_metric(avg_lpips)}")
                psnrs.append(avg_psnr)
                ssims.append(avg_ssim)
                lpipss.append(avg_lpips)

    if ckpts is not None:
        # barrier: async snapshots must be durable before the process exits
        # (every process participates in the wait, then closes its manager)
        ckpts.wait()
        ckpts.close()
        log("orbax checkpoints durable")

    # final markdown report (train.py:276-290); process 0 only
    if not primary:
        return
    report_dir = os.path.join(opt.val_folder, "training")
    os.makedirs(report_dir, exist_ok=True)
    now = datetime.now().strftime("%Y-%m-%d-%H%M%S")
    with open(os.path.join(report_dir, f"metrics{now}.md"), "w") as f:
        f.write(f"dataset: {ds_name}\n")
        for k in ("lr", "batchSize", "cropSize", "HVI_weight", "L1_weight", "D_weight", "E_weight", "P_weight"):
            f.write(f"{k}: {getattr(opt, k)}\n")
        f.write("| Epochs | PSNR | SSIM | LPIPS |\n|---|---|---|---|\n")
        for i in range(len(psnrs)):
            f.write(f"| {start_epoch + (i + 1) * opt.snapshots} | {psnrs[i]:.4f} | {ssims[i]:.4f} | {fmt_metric(lpipss[i])} |\n")
    print("===> training done")


if __name__ == "__main__":
    main()
