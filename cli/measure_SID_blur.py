#!/usr/bin/env python
"""Scene-folder paired metrics — twin of ``measure_SID_blur.py``.

Walks per-scene output folders and their GT folders, scoring PSNR (without
the 1e-8 guard, measure_SID_blur.py:65-70), MATLAB-SSIM, and LPIPS (when
weights are supplied).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from hvi_cidnet_tpu.data.datasets import is_image_file
from hvi_cidnet_tpu.eval.measure import fmt_metric
from hvi_cidnet_tpu.metrics.psnr_ssim import gt_mean_rectify, psnr, ssim_matlab

p = argparse.ArgumentParser(description="Measure")
p.add_argument("--use_GT_mean", action="store_true")
p.add_argument("--SID", action="store_true")
p.add_argument("--Blur", action="store_true")
p.add_argument("--out_root", type=str, default=None)
p.add_argument("--gt_root", type=str, default=None)
p.add_argument("--lpips_weights", type=str, default=None)
mea = p.parse_args()

if mea.Blur:
    out_root = mea.out_root or "./output/LOL_Blur/"
    gt_root = mea.gt_root or "./datasets/LOL_blur/test/high_sharp_scaled/"
elif mea.SID:
    out_root = mea.out_root or "./output/SID/"
    gt_root = mea.gt_root or "./datasets/Sony_total_dark/test/long/"
else:
    raise SystemExit("pass --SID or --Blur")

lp_fn = None
if mea.lpips_weights:
    import jax

    from hvi_cidnet_tpu.metrics.lpips import im2tensor_range, load_lpips_torch, lpips_distance

    params = load_lpips_torch(mea.lpips_weights)
    jfn = jax.jit(lambda a, b: lpips_distance(params, a, b))
    lp_fn = lambda a, b: float(jfn(im2tensor_range(a), im2tensor_range(b))[0])

tp = ts = tl = 0.0
n = 0
for scene in sorted(os.listdir(out_root)):
    scene_out = os.path.join(out_root, scene)
    scene_gt = os.path.join(gt_root, scene)
    if not os.path.isdir(scene_out) or not os.path.isdir(scene_gt):
        continue
    for f in sorted(os.listdir(scene_out)):
        if not is_image_file(f):
            continue
        gt_path = os.path.join(scene_gt, f)
        if not os.path.exists(gt_path):
            stem = os.path.splitext(f)[0]
            cands = [x for x in os.listdir(scene_gt) if os.path.splitext(x)[0] == stem]
            if not cands:
                continue
            gt_path = os.path.join(scene_gt, cands[0])
        a = np.array(Image.open(os.path.join(scene_out, f)).convert("RGB"))
        b = np.array(Image.open(gt_path).convert("RGB"))
        if a.shape != b.shape:
            a = np.array(Image.fromarray(a).resize((b.shape[1], b.shape[0])))
        if mea.use_GT_mean:
            a = gt_mean_rectify(a.astype(np.float64), b)
        tp += psnr(a, b, eps_guard=False)
        ts += ssim_matlab(a, b)
        if lp_fn:
            tl += lp_fn(np.clip(a, 0, 255).astype(np.uint8), b)
        n += 1

if n == 0:
    raise SystemExit("no image pairs found")
print(f"===> Avg.PSNR: {tp / n:.4f} dB")
print(f"===> Avg.SSIM: {ts / n:.4f}")
print(f"===> Avg.LPIPS: {fmt_metric(tl / n if lp_fn else float('nan'))}")
