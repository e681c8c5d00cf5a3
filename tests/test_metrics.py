"""Metric parity: NIQE vs reference implementation, PSNR/SSIM properties."""

import os

import numpy as np
import pytest

from hvi_cidnet_tpu.metrics.niqe import (
    calculate_niqe,
    imresize_matlab,
    rgb_as_bgr_to_y,
)
from hvi_cidnet_tpu.metrics.psnr_ssim import gt_mean_rectify, psnr, ssim_matlab


def _rand_img(h=240, w=320, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h // 8, w // 8, 3))
    # Smooth upsampled texture so NIQE statistics are sane (pure noise makes
    # AGGD fits degenerate for both implementations).
    import cv2

    return cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC).clip(0, 255)


def test_imresize_matches_reference(torch_reference_path):
    from loss.niqe_utils import imresize as ref_imresize

    img = (_rand_img(64, 80, seed=1) / 255.0).astype(np.float32)
    for scale in (0.5, 0.25):
        ours = imresize_matlab(img, scale, antialiasing=True)
        theirs = ref_imresize(img, scale, antialiasing=True)
        np.testing.assert_allclose(ours, theirs, atol=2e-5)

    gray = img[:, :, 0]
    np.testing.assert_allclose(
        imresize_matlab(gray, 0.5), ref_imresize(gray, 0.5), atol=2e-5
    )


def test_y_channel_matches_reference(torch_reference_path):
    from loss.niqe_utils import to_y_channel

    img = _rand_img(32, 32, seed=2).astype(np.float32)
    ours = rgb_as_bgr_to_y(img)
    theirs = np.squeeze(to_y_channel(img))
    np.testing.assert_allclose(ours, theirs, atol=1e-3)


def test_niqe_matches_reference(torch_reference_path, monkeypatch):
    from loss.niqe_utils import calculate_niqe as ref_niqe

    img = _rand_img(240, 320, seed=3)
    monkeypatch.chdir(torch_reference_path)  # ref loads ./loss/...npz
    expected = ref_niqe(img)
    got = calculate_niqe(img)
    assert got == pytest.approx(expected, abs=2e-3)


def test_niqe_on_real_image(torch_reference_path, monkeypatch):
    from PIL import Image

    from loss.niqe_utils import calculate_niqe as ref_niqe

    img = np.array(
        Image.open(os.path.join(torch_reference_path, "pic", "000001.png")).convert("RGB")
    )
    # crop for speed; parity is what matters
    img = img[:384, :384]
    monkeypatch.chdir(torch_reference_path)
    expected = ref_niqe(img)
    got = calculate_niqe(img)
    assert got == pytest.approx(expected, abs=2e-3)


def test_psnr_semantics():
    a = np.full((8, 8, 3), 100.0)
    assert psnr(a, a) == pytest.approx(10 * np.log10(255.0**2 / 1e-8))
    b = a + 10.0
    assert psnr(a, b) == pytest.approx(10 * np.log10(255.0**2 / 100.0), abs=1e-4)
    # SID flavor without the guard diverges on identical images
    assert psnr(a, a, eps_guard=False) == float("inf")


def test_ssim_matlab_known_values():
    img = _rand_img(64, 64, seed=4)
    assert ssim_matlab(img, img) == pytest.approx(1.0, abs=1e-9)
    noisy = np.clip(img + np.random.default_rng(5).normal(0, 20, img.shape), 0, 255)
    s = ssim_matlab(img, noisy)
    assert 0.0 < s < 1.0


def test_gt_mean_rectify_matches_target_brightness():
    import cv2

    img = _rand_img(32, 32, seed=6) * 0.3
    ref = _rand_img(32, 32, seed=6)
    out = gt_mean_rectify(img, ref)
    got = cv2.cvtColor(out.astype(np.uint8), cv2.COLOR_RGB2GRAY).mean()
    want = cv2.cvtColor(ref.astype(np.uint8), cv2.COLOR_RGB2GRAY).mean()
    assert got == pytest.approx(want, rel=0.05)


def test_lpips_architecture_properties():
    import jax
    import jax.numpy as jnp

    from hvi_cidnet_tpu.metrics.lpips import init_lpips, lpips_distance

    p = init_lpips(jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    assert float(lpips_distance(p, a, a)[0]) == pytest.approx(0.0, abs=1e-6)
    assert float(lpips_distance(p, a, b)[0]) > 0
