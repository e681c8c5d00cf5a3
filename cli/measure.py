#!/usr/bin/env python
"""Paired metric CLI — twin of the reference ``measure.py:166-190``."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hvi_cidnet_tpu.eval.measure import fmt_metric, metrics

p = argparse.ArgumentParser(description="Measure")
p.add_argument("--use_GT_mean", action="store_true")
p.add_argument("--lol", action="store_true")
p.add_argument("--lol_v2_real", action="store_true")
p.add_argument("--lol_v2_syn", action="store_true")
p.add_argument("--SICE_grad", action="store_true")
p.add_argument("--SICE_mix", action="store_true")
p.add_argument("--lmot", action="store_true")
p.add_argument("--im_dir", type=str, default=None, help="override output glob")
p.add_argument("--label_dir", type=str, default=None, help="override GT dir")
p.add_argument("--lpips_weights", type=str, default=None,
               help="combined alexnet+lin torch state_dict for LPIPS scoring")
mea = p.parse_args()

ROUTES = {
    "lol": ("./output/LOLv1/*.png", "./datasets/LOLdataset/eval15/high/"),
    "lol_v2_real": ("./output/LOLv2_real/*.png", "./datasets/LOLv2/Real_captured/Test/Normal/"),
    "lol_v2_syn": ("./output/LOLv2_syn/*.png", "./datasets/LOLv2/Synthetic/Test/Normal/"),
    "SICE_grad": ("./output/SICE_grad/*.png", "./datasets/SICE/SICE_Reshape/"),
    "SICE_mix": ("./output/SICE_mix/*.png", "./datasets/SICE/SICE_Reshape/"),
    "lmot": ("./output/LMOT/*.png", "./datasets/lmot_lol_val/img_light_rgb"),
}

im_dir = label_dir = None
for name, (im, lab) in ROUTES.items():
    if getattr(mea, name):
        im_dir, label_dir = im, lab
if mea.im_dir:
    im_dir = mea.im_dir
if mea.label_dir:
    label_dir = mea.label_dir
if im_dir is None or label_dir is None:
    raise SystemExit("choose a dataset flag or pass --im_dir/--label_dir")

lpips_params = None
if mea.lpips_weights:
    from hvi_cidnet_tpu.metrics.lpips import load_lpips_torch

    lpips_params = load_lpips_torch(mea.lpips_weights)
else:
    print("note: LPIPS reported as n/a — no pretrained AlexNet weights "
          "available offline; pass --lpips_weights for real scores")

avg_psnr, avg_ssim, avg_lpips = metrics(im_dir, label_dir, mea.use_GT_mean, lpips_params=lpips_params)
print(f"===> Avg.PSNR: {avg_psnr:.4f} dB")
print(f"===> Avg.SSIM: {avg_ssim:.4f}")
print(f"===> Avg.LPIPS: {fmt_metric(avg_lpips)}")
