"""Paired image metrics: PSNR and MATLAB-faithful SSIM (host-side numpy/cv2).

These stay on CPU deliberately — bit-fidelity with the reference's scoring
(``measure.py:23-71``) matters more than speed here, and the arrays are tiny.
Only the model forward belongs on TPU (SURVEY.md §7 hard-parts list).
"""

from __future__ import annotations

import numpy as np


def psnr(img: np.ndarray, ref: np.ndarray, *, eps_guard: bool = True) -> float:
    """PSNR on [0,255] floats.

    ``eps_guard`` adds the reference's 1e-8 stabilizer (measure.py:66-71);
    ``eps_guard=False`` matches measure_SID_blur.py:65-70 which omits it.
    """
    a = np.asarray(img, np.float32)
    b = np.asarray(ref, np.float32)
    mse = np.mean(np.square(a - b))
    if eps_guard:
        mse = mse + 1e-8
    return float(10.0 * np.log10(255.0 * 255.0 / mse))


def _ssim_single(img1: np.ndarray, img2: np.ndarray) -> float:
    """Single-channel MATLAB SSIM: 11x11 sigma-1.5 Gaussian filtering with
    a 5px border crop, C constants on the [0,255] scale (measure.py:23-43)."""
    import cv2

    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    x = img1.astype(np.float64)
    y = img2.astype(np.float64)
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())

    def filt(z):
        return cv2.filter2D(z, -1, window)[5:-5, 5:-5]

    mu1, mu2 = filt(x), filt(y)
    mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
    s1 = filt(x * x) - mu1_sq
    s2 = filt(y * y) - mu2_sq
    s12 = filt(x * y) - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return float(ssim_map.mean())


def ssim_matlab(img: np.ndarray, ref: np.ndarray) -> float:
    """Channel-averaged MATLAB SSIM on [0,255] images (measure.py:45-64)."""
    a = np.asarray(img, np.float64)
    b = np.asarray(ref, np.float64)
    if a.shape != b.shape:
        raise ValueError("Input images must have the same dimensions.")
    if a.ndim == 2:
        return _ssim_single(a, b)
    if a.ndim == 3 and a.shape[2] == 3:
        return float(np.mean([_ssim_single(a[:, :, i], b[:, :, i]) for i in range(3)]))
    if a.ndim == 3 and a.shape[2] == 1:
        return _ssim_single(a[..., 0], b[..., 0])
    raise ValueError("Wrong input image dimensions.")


def gt_mean_rectify(img: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """Scale output brightness to the GT gray mean (measure.py:138-141)."""
    import cv2

    mean_restored = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2GRAY).mean()
    mean_target = cv2.cvtColor(ref.astype(np.uint8), cv2.COLOR_RGB2GRAY).mean()
    return np.clip(img * (mean_target / mean_restored), 0, 255)
