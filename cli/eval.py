#!/usr/bin/env python
"""Batch inference CLI — TPU twin of the reference ``eval.py``.

Same flags and per-dataset weight/alpha routing (eval.py:85-171); weights may
be native ``.npz``, torch ``.pth``, or safetensors.  ``--variant`` selects the
model graph (the fork's eval defaults to MSSA, eval.py:10; released weights
are for the base graph — pass ``--variant base`` for those).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from hvi_cidnet_tpu.data.datasets import EvalDataset
from hvi_cidnet_tpu.eval.evaluator import Evaluator, gates_for_dataset
from hvi_cidnet_tpu.models.cidnet import CIDNetConfig
from hvi_cidnet_tpu.utils.compile_cache import add_compile_cache_flag, enable_compilation_cache


def parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Eval")
    p.add_argument("--perc", action="store_true", help="use w_perc weights")
    p.add_argument("--lol", action="store_true")
    p.add_argument("--lol_v2_real", action="store_true")
    p.add_argument("--lol_v2_syn", action="store_true")
    p.add_argument("--SICE_grad", action="store_true")
    p.add_argument("--SICE_mix", action="store_true")
    p.add_argument("--lmot", action="store_true")
    p.add_argument("--best_GT_mean", action="store_true")
    p.add_argument("--best_PSNR", action="store_true")
    p.add_argument("--best_SSIM", action="store_true")
    p.add_argument("--custome", action="store_true")
    p.add_argument("--custome_path", type=str, default="./YOLO")
    p.add_argument("--unpaired", action="store_true")
    for d in ("DICM", "LIME", "MEF", "NPE", "VV"):
        p.add_argument(f"--{d}", action="store_true")
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--gamma", type=float, default=1.0)
    p.add_argument("--unpaired_weights", type=str, default="./weights/LOLv2_syn/w_perc.pth")
    p.add_argument("--weights", type=str, default=None, help="override weight path")
    p.add_argument("--variant", type=str, default="mssa", choices=["base", "mssa", "tnsm"])
    p.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--eval_batch", type=int, default=8,
                   help="images per device batch in bucketed eval; 128 engages "
                        "the fused TPU resize kernels (serving mode)")
    p.add_argument("--max_programs", type=int, default=None,
                   help="OPT-IN bound on distinct XLA programs for arbitrary-"
                        "size (unpaired/custom) sets. Default off: exact pad-"
                        "to-x8 everywhere, reference-faithful values. Setting "
                        "a bound escalates the pad quantum, which perturbs "
                        "outputs inside the crop (channel attention sees the "
                        "padded pixels) and thus NIQE/BRISQUE scores slightly "
                        "— trade compile time for exactness deliberately")
    p.add_argument("--dp", action="store_true",
                   help="shard each eval batch over all addressable chips "
                        "(data-parallel serving; same numbers as single-chip "
                        "— shard_map per device, parallel/inference.py). "
                        "No effect on a single device")
    add_compile_cache_flag(p)
    return p


def route(ep):
    """Dataset -> (eval_dir, output_folder, weight_path, alpha, pad) table."""
    alpha, pad = None, False
    if ep.lol:
        eval_dir, out = "./datasets/LOLdataset/eval15/low", "./output/LOLv1/"
        weights = "./weights/LOLv1/w_perc.pth" if ep.perc else "./weights/LOLv1/wo_perc.pth"
    elif ep.lol_v2_real:
        eval_dir, out = "./datasets/LOLv2/Real_captured/Test/Low", "./output/LOLv2_real/"
        if ep.best_GT_mean:
            weights, alpha = "./weights/LOLv2_real/w_perc.pth", 0.84
        elif ep.best_PSNR:
            weights, alpha = "./weights/LOLv2_real/best_PSNR.pth", 0.8
        else:
            # DELIBERATE deviation: the reference crashes on --lol_v2_real
            # without a best_* flag (eval.py:107-117 leaves weight_path
            # undefined); we default to the best_SSIM weights instead and
            # say so, because a crash carries no information a default + a
            # printed choice doesn't
            if not ep.best_SSIM:
                print("note: --lol_v2_real without --best_GT_mean/--best_PSNR/"
                      "--best_SSIM defaults to the best_SSIM weights "
                      "(the reference errors here)")
            weights, alpha = "./weights/LOLv2_real/best_SSIM.pth", 0.82
    elif ep.lol_v2_syn:
        eval_dir, out = "./datasets/LOLv2/Synthetic/Test/Low", "./output/LOLv2_syn/"
        weights = "./weights/LOLv2_syn/w_perc.pth" if ep.perc else "./weights/LOLv2_syn/wo_perc.pth"
    elif ep.SICE_grad:
        eval_dir, out, weights, pad = "./datasets/SICE/SICE_Grad", "./output/SICE_grad/", "./weights/SICE.pth", True
    elif ep.SICE_mix:
        eval_dir, out, weights, pad = "./datasets/SICE/SICE_Mix", "./output/SICE_mix/", "./weights/SICE.pth", True
    elif ep.lmot:
        eval_dir, out = "./datasets/lmot_lol_val/img_dark_rgb", "./output/LMOT/"
        weights = "./weights/LMOT/w_perc.pth" if ep.perc else "./weights/LMOT/wo_perc.pth"
    elif ep.unpaired:
        pad = True
        for d in ("DICM", "LIME", "MEF", "NPE", "VV"):
            if getattr(ep, d):
                eval_dir, out = f"./datasets/{d}", f"./output/{d}/"
                break
        else:
            eval_dir, out = ep.custome_path, "./output/custome/"
        weights, alpha = ep.unpaired_weights, ep.alpha
    else:
        raise SystemExit("choose a dataset flag (--lol, --lol_v2_real, ... or --unpaired --DICM)")
    return eval_dir, out, weights, alpha, pad


def main():
    ep = parser().parse_args()
    cache = enable_compilation_cache(ep.compile_cache)
    if cache:
        print(f"compilation cache: {cache}")
    eval_dir, out, weights, alpha, pad = route(ep)
    if ep.weights:
        weights = ep.weights
    gates = gates_for_dataset(
        lol=ep.lol, v2=ep.lol_v2_real, unpaired=ep.unpaired, lmot=ep.lmot,
        alpha=alpha if alpha is not None else 1.0,
    )
    print(f"weights: {weights}\ngates: {gates}\noutput: {out}")
    mesh = None
    if ep.dp:
        import jax

        from hvi_cidnet_tpu.parallel.mesh import make_mesh

        if jax.device_count() > 1:
            mesh = make_mesh(axis_names=("data",))
            print(f"dp serving: batch sharded over {mesh.devices.size} devices")
        else:
            print("dp serving: single device, flag is a no-op")
    ev = Evaluator(
        weights,
        CIDNetConfig(variant=ep.variant),
        gates,
        gamma=ep.gamma,
        compute_dtype=jnp.dtype(ep.dtype),
        # bounded program count is opt-in and only meaningful for arbitrary-
        # size sets; paired sets always keep the exact x8 pad (released-
        # checkpoint metric parity) regardless of the flag
        max_programs=ep.max_programs if (ep.unpaired or ep.custome) else None,
        mesh=mesh,
    )
    n = ev.run_dataset(EvalDataset(eval_dir, pad=pad), out, batch_size=ep.eval_batch)
    print(f"===> End evaluation ({n} images)")


if __name__ == "__main__":
    main()
