"""Pixel-space losses: L1, MSE, SSIM, Edge (Laplacian-of-Gaussian).

Re-implements the reference's ``loss/losses.py`` + ``loss/loss_utils.py`` as
pure NHWC JAX functions.  All reductions/conv windows match the reference
numerically (parity-tested); computation is fp32 regardless of input dtype
since these feed the scalar training loss.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.ops.pallas_gate import kernel_flag


def _reduce(loss: jnp.ndarray, weight, reduction: str) -> jnp.ndarray:
    """Weight + reduce semantics of loss_utils.weight_reduce_loss (:30-59)."""
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        if weight is None:
            return jnp.mean(loss)
        # mean over the weighted region (loss_utils.py:52-57)
        if weight.shape[-1] > 1:
            denom = jnp.sum(weight)
        else:
            denom = jnp.sum(weight) * loss.shape[-1]
        return jnp.sum(loss) / denom
    raise ValueError(f"unknown reduction {reduction}")


def l1_loss(pred, target, weight=None, reduction="mean", loss_weight=1.0):
    """Weighted MAE (loss/losses.py:10-37, loss_utils.py:101-103)."""
    return loss_weight * _reduce(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)), weight, reduction)


def mse_loss(pred, target, weight=None, reduction="mean", loss_weight=1.0):
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return loss_weight * _reduce(d * d, weight, reduction)


# ---------------------------------------------------------------------------
# SSIM (training loss flavor — zero 'SAME' padding, 11x11 sigma-1.5 window;
# the MATLAB-faithful *metric* lives in metrics/psnr_ssim.py)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _gaussian_taps(window_size: int = 11, sigma: float = 1.5) -> tuple:
    """1-D normalized Gaussian taps (loss_utils.py:113-118)."""
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma**2))
    return tuple((g / g.sum()).astype(np.float32).tolist())


@functools.lru_cache(maxsize=None)
def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """1-D normalized Gaussian, outer-producted (loss_utils.py:113-122)."""
    g = np.asarray(_gaussian_taps(window_size, sigma), np.float32)
    return np.outer(g, g)


# ---------------------------------------------------------------------------
# MXU blur seam (loss_blur_mxu / LOSS_BLUR_MXU)
#
# The loss blurs are depthwise convs: XLA lowers them to VPU elementwise
# fusions at 121 (SSIM 11x11) / 25 (Edge 5x5) taps per pixel, and the r5
# train-step attribution (experiments/train_attrib_r5.py) measured them at
# ~57 ms of the 197 ms step (28%).  A separable 1-D SAME conv along one axis
# is exactly a banded n x n matrix applied to that axis, so both blurs are
# re-expressible as two einsum contractions that land on the MXU instead.
# Padding semantics fold into the band matrix rows (zero pad: taps falling
# outside [0,n) are dropped; replicate pad: they accumulate into the edge
# rows), so the operator is IDENTICAL to the conv — only fp reassociation
# differs (parity-tested in tests/test_losses.py).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _band_matrix(n: int, taps: tuple, mode: str) -> np.ndarray:
    """n x n matrix M with ``x @ M`` == 1-D SAME cross-correlation by taps."""
    r = len(taps) // 2
    m = np.zeros((n, n), np.float64)
    for v in range(n):
        for t, kv in enumerate(taps):
            i = v + t - r
            if mode == "zero":
                if 0 <= i < n:
                    m[i, v] += kv
            elif mode == "replicate":
                m[min(max(i, 0), n - 1), v] += kv
            else:
                raise ValueError(f"unknown pad mode {mode}")
    return m.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _edge_composite_matrix(n: int) -> np.ndarray:
    """Per-axis operator of the WHOLE Edge-loss band chain.

    laplacian_response's blur -> subsample -> zero-stuff(x4) -> blur is
    separable at every step, so along each axis it is G @ diag(even) @ G
    with G the replicate-pad binomial5 band (the x4 is folded into the H
    axis only — it is one scalar for the 2-D chain, not one per axis).
    """
    g = _band_matrix(n, tuple(_BINOMIAL5.tolist()), "replicate").astype(np.float64)
    even = np.zeros(n, np.float64)
    even[::2] = 1.0
    return (g @ (even[:, None] * g)).astype(np.float32)


def _axis_matmul(x: jnp.ndarray, mh: np.ndarray, mw: np.ndarray) -> jnp.ndarray:
    """Apply per-axis operators over H then W of an NHWC tensor (MXU path)."""
    hi = jax.lax.Precision.HIGHEST
    y = jnp.einsum("bhwc,hu->buwc", x, jnp.asarray(mh), precision=hi)
    return jnp.einsum("buwc,wv->buvc", y, jnp.asarray(mw), precision=hi)


def _depthwise_same(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Depthwise conv, zero SAME padding (torch F.conv2d padding=k//2)."""
    c = x.shape[-1]
    k = win.shape[0]
    w = jnp.asarray(win, x.dtype).reshape(k, k, 1, 1)
    w = jnp.broadcast_to(w, (k, k, 1, c))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32,
    )


def ssim_map_mean(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM map on [0,1] images, C1=0.01^2 C2=0.03^2 (loss_utils.py:125-145)."""
    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    if kernel_flag("loss_blur_mxu"):
        # One stacked blur of [x, y, x^2, y^2, xy] as two banded einsums.
        taps = _gaussian_taps(window_size)
        n_h, n_w = x.shape[1], x.shape[2]
        mh = _band_matrix(n_h, taps, "zero")
        mw = _band_matrix(n_w, taps, "zero")
        stacked = jnp.concatenate([x, y, x * x, y * y, x * y], axis=-1)
        blurred = _axis_matmul(stacked, mh, mw)
        c = x.shape[-1]
        mu1, mu2, exx, eyy, exy = (
            blurred[..., i * c : (i + 1) * c] for i in range(5)
        )
        mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1, s2, s12 = exx - mu1_sq, eyy - mu2_sq, exy - mu12
    else:
        win = _gaussian_window(window_size)
        mu1 = _depthwise_same(x, win)
        mu2 = _depthwise_same(y, win)
        mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1 = _depthwise_same(x * x, win) - mu1_sq
        s2 = _depthwise_same(y * y, win) - mu2_sq
        s12 = _depthwise_same(x * y, win) - mu12
    c1, c2 = 0.01**2, 0.03**2
    ssim = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(ssim)


def ssim_loss(img1, img2, weight: float = 1.0):
    """``(1 - mean_ssim) * weight`` — the reference D_loss (losses.py:166-190)."""
    return (1.0 - ssim_map_mean(img1, img2)) * weight


# ---------------------------------------------------------------------------
# Edge loss
# ---------------------------------------------------------------------------

_BINOMIAL5 = np.array([0.05, 0.25, 0.4, 0.25, 0.05], np.float32)


def _gauss5(img: jnp.ndarray) -> jnp.ndarray:
    """5x5 binomial blur with replicate padding (losses.py:49-52)."""
    c = img.shape[-1]
    k2 = np.outer(_BINOMIAL5, _BINOMIAL5)
    w = jnp.asarray(k2, img.dtype).reshape(5, 5, 1, 1)
    w = jnp.broadcast_to(w, (5, 5, 1, c))
    img = jnp.pad(img, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="edge")
    return jax.lax.conv_general_dilated(
        img, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32,
    )


def laplacian_response(img: jnp.ndarray) -> jnp.ndarray:
    """LoG band: img - gauss(upsample0(downsample2(gauss(img)))*4).

    Reference EdgeLoss.laplacian_kernel (losses.py:54-61): blur, take every
    2nd pixel, re-embed at even positions scaled by 4, blur again, subtract.

    Under the ``loss_blur_mxu`` seam the whole band chain collapses to one
    precomputed matrix per axis (see _edge_composite_matrix) — two MXU
    einsums instead of two depthwise convs + a scatter.
    """
    x = img.astype(jnp.float32)
    if kernel_flag("loss_blur_mxu"):
        ch = 4.0 * _edge_composite_matrix(x.shape[1])
        cw = _edge_composite_matrix(x.shape[2])
        return x - _axis_matmul(x, ch, cw)
    filtered = _gauss5(x)
    down = filtered[:, ::2, ::2, :]
    new_filter = jnp.zeros_like(filtered)
    new_filter = new_filter.at[:, ::2, ::2, :].set(down * 4.0)
    filtered = _gauss5(new_filter)
    return x - filtered


def edge_loss(x, y, loss_weight: float = 1.0):
    """MSE of LoG responses x weight (losses.py:63-65)."""
    return mse_loss(laplacian_response(x), laplacian_response(y)) * loss_weight
