"""Paired metric harness: PSNR / MATLAB-SSIM / LPIPS over saved PNGs.

Library twin of the reference's ``measure.py:73-163`` CLI: walks the eval
output directory, pairs each PNG with its ground truth (extension fallback
chain), optionally rectifies brightness to the GT gray mean, and averages the
three metrics.  Disk round-trip retained by design — it scores exactly what
``eval`` wrote, like the reference.
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Tuple

import numpy as np

from hvi_cidnet_tpu.metrics.psnr_ssim import gt_mean_rectify, psnr, ssim_matlab

_GT_EXTS = ["", ".jpg", ".JPG", ".jpeg", ".JPEG", ".png", ".PNG"]


def fmt_metric(value: float, fmt: str = "{:.4f}") -> str:
    """Render a metric for reports: NaN (metric unavailable — e.g. LPIPS
    without AlexNet weights, BRISQUE without an SVR model) prints as "n/a",
    never as a fake 0.0000."""
    if value != value:  # NaN
        return "n/a"
    return fmt.format(value)


def _find_gt(label_dir: str, name: str) -> Optional[str]:
    """Extension fallback chain (measure.py:115-131)."""
    stem = os.path.splitext(name)[0]
    cand = os.path.join(label_dir, name)
    if os.path.exists(cand):
        return cand
    for ext in _GT_EXTS[1:]:
        cand = os.path.join(label_dir, stem + ext)
        if os.path.exists(cand):
            return cand
    return None


def metrics(
    im_dir: str,
    label_dir: str,
    use_gt_mean: bool = False,
    *,
    lpips_params=None,
    verbose: bool = True,
) -> Tuple[float, float, float]:
    """Average (psnr, ssim, lpips) over ``glob(im_dir)`` vs ``label_dir``.

    LPIPS uses the JAX implementation when ``lpips_params`` is given (load via
    metrics.lpips.load_lpips_torch); otherwise it is reported as **NaN** —
    pretrained AlexNet weights can't be fetched in this environment, and a
    fabricated 0.0 would read as a perfect score.  Callers should print
    ``fmt_metric(lpips)`` so absent metrics render as "n/a".
    """
    from PIL import Image

    lp_fn = None
    if lpips_params is not None:
        import jax

        from hvi_cidnet_tpu.metrics.lpips import im2tensor_range, lpips_distance

        lp_jit = jax.jit(lambda a, b: lpips_distance(lpips_params, a, b))

        def lp_fn(a_u8, b_u8):
            return float(lp_jit(im2tensor_range(a_u8), im2tensor_range(b_u8))[0])

    total_psnr = total_ssim = total_lpips = 0.0
    n = 0
    files = sorted(glob.glob(im_dir))
    for item in files:
        name = os.path.basename(item)
        gt_path = _find_gt(label_dir, name)
        if gt_path is None:
            if verbose:
                print(f"warning: no ground truth for {name} in {label_dir}")
            continue
        im1 = Image.open(item).convert("RGB")
        im2 = Image.open(gt_path).convert("RGB")
        # resize output to GT size (measure.py:133-134; PIL size is (w,h))
        im1 = im1.resize(im2.size)
        a = np.array(im1)
        b = np.array(im2)
        if use_gt_mean:
            a = gt_mean_rectify(a.astype(np.float64), b)
        total_psnr += psnr(a, b)
        total_ssim += ssim_matlab(a, b)
        if lp_fn is not None:
            total_lpips += lp_fn(np.asarray(a, np.float64).clip(0, 255).astype(np.uint8), b.astype(np.uint8))
        n += 1

    if n == 0:
        if verbose:
            print("error: no images evaluated")
        return float("nan"), float("nan"), float("nan")
    return (
        total_psnr / n,
        total_ssim / n,
        total_lpips / n if lp_fn is not None else float("nan"),
    )


def unpaired_metrics(im_dir: str, *, brisque_model: Optional[str] = None, verbose: bool = True):
    """Average (niqe, brisque) over ``glob(im_dir)`` — measure_niqe_bris.py:17-38.

    BRISQUE is skipped (returned as nan) when no trained SVR model file is
    available; see metrics/brisque.py.
    """
    from PIL import Image

    from hvi_cidnet_tpu.metrics.brisque import score as brisque_score
    from hvi_cidnet_tpu.metrics.niqe import calculate_niqe

    total_niqe = total_bris = 0.0
    n = 0
    bris_ok = True
    for item in sorted(glob.glob(im_dir)):
        img = np.array(Image.open(item).convert("RGB"))
        total_niqe += calculate_niqe(img)
        if bris_ok:
            try:
                total_bris += brisque_score(img, brisque_model)
            except FileNotFoundError as e:
                if verbose:
                    print(f"BRISQUE skipped: {e}")
                bris_ok = False
        n += 1
    if n == 0:
        return float("nan"), float("nan")
    return total_niqe / n, (total_bris / n if bris_ok else float("nan"))
