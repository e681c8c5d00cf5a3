"""Loss-layer parity vs the torch reference (CPU oracles)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hvi_cidnet_tpu.losses.basic import (
    edge_loss,
    l1_loss,
    laplacian_response,
    mse_loss,
    ssim_loss,
)
from hvi_cidnet_tpu.losses.vgg import init_vgg, load_vgg_torch, vgg_features
from hvi_cidnet_tpu.losses.perceptual import perceptual_loss


def _pair(shape=(2, 3, 24, 28), seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.uniform(0, 1, shape).astype(np.float32),
        rng.uniform(0, 1, shape).astype(np.float32),
    )


def _nhwc(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


def test_l1_parity(torch_reference_path):
    import torch
    from loss.losses import L1Loss

    a, b = _pair()
    ref = L1Loss(loss_weight=1.0)
    expected = ref(torch.from_numpy(a), torch.from_numpy(b)).item()
    got = float(l1_loss(_nhwc(a), _nhwc(b)))
    assert abs(got - expected) < 1e-6


def test_l1_weighted_semantics(torch_reference_path):
    import torch
    from loss.losses import L1Loss

    a, b = _pair(seed=1)
    w = np.random.default_rng(2).uniform(0, 1, (2, 1, 24, 28)).astype(np.float32)
    ref = L1Loss()
    expected = ref(torch.from_numpy(a), torch.from_numpy(b), torch.from_numpy(w)).item()
    got = float(l1_loss(_nhwc(a), _nhwc(b), weight=_nhwc(w)))
    assert abs(got - expected) < 1e-6


def test_ssim_parity(torch_reference_path):
    import torch
    from loss.losses import SSIM

    a, b = _pair(seed=3)
    ref = SSIM(weight=0.5)
    expected = ref(torch.from_numpy(a), torch.from_numpy(b)).item()
    got = float(ssim_loss(_nhwc(a), _nhwc(b), weight=0.5))
    assert abs(got - expected) < 1e-6


def test_edge_loss_parity(torch_reference_path):
    """Inline torch oracle (the reference EdgeLoss hard-codes .cuda(),
    losses.py:45, so its ctor can't run here; the math below replicates
    losses.py:49-65 on CPU)."""
    import torch
    import torch.nn.functional as F

    a, b = _pair(seed=4)

    k = torch.tensor([[0.05, 0.25, 0.4, 0.25, 0.05]])
    kernel = torch.matmul(k.t(), k).unsqueeze(0).repeat(3, 1, 1, 1)

    def conv_gauss(img):
        img = F.pad(img, (2, 2, 2, 2), mode="replicate")
        return F.conv2d(img, kernel, groups=3)

    def lap(img):
        filtered = conv_gauss(img)
        down = filtered[:, :, ::2, ::2]
        nf = torch.zeros_like(filtered)
        nf[:, :, ::2, ::2] = down * 4
        return img - conv_gauss(nf)

    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    expected = F.mse_loss(lap(ta), lap(tb)).item() * 50.0
    got = float(edge_loss(_nhwc(a), _nhwc(b), loss_weight=50.0))
    assert abs(got - expected) < 1e-5

    lap_j = np.asarray(laplacian_response(_nhwc(a))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(lap_j, lap(ta).numpy(), atol=1e-6)


@pytest.mark.parametrize("shape", [(2, 3, 24, 28), (1, 3, 37, 41)])
def test_loss_blur_mxu_arm_matches_conv_arm(shape):
    """loss_blur_mxu seam: banded-einsum blurs == depthwise-conv blurs.

    Values and input-gradients of both SSIM and Edge losses must agree
    between the arms up to fp reassociation (the band matrices encode the
    exact same operator, incl. zero/replicate padding at the borders and
    the Edge chain's composed subsample/zero-stuff step).  Odd sizes cover
    the even-index mask edge case.
    """
    from hvi_cidnet_tpu.losses.basic import ssim_map_mean
    from hvi_cidnet_tpu.ops.pallas_gate import kernel_flags

    a, b = _pair(shape=shape, seed=7)
    ja, jb = _nhwc(a), _nhwc(b)

    def both(fn):
        with kernel_flags(loss_blur_mxu=False):
            ref = fn()
        with kernel_flags(loss_blur_mxu=True):
            got = fn()
        return ref, got

    ref, got = both(lambda: float(ssim_map_mean(ja, jb)))
    assert abs(got - ref) < 2e-6

    ref, got = both(lambda: np.asarray(laplacian_response(ja)))
    np.testing.assert_allclose(got, ref, atol=2e-5)

    ref, got = both(lambda: float(edge_loss(ja, jb, loss_weight=50.0)))
    assert abs(got - ref) < 2e-5

    grad_fn = jax.grad(
        lambda x: ssim_loss(x, jb, weight=0.5) + edge_loss(x, jb, loss_weight=50.0)
    )
    ref, got = both(lambda: np.asarray(grad_fn(ja)))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=2e-3)


def test_vgg_feature_taps_are_preactivation():
    p = init_vgg(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(5).uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
    feats = vgg_features(p, x, ["conv1_2", "conv2_2", "conv3_4", "conv4_4"])
    assert feats["conv1_2"].shape == (1, 32, 32, 64)
    assert feats["conv2_2"].shape == (1, 16, 16, 128)
    assert feats["conv3_4"].shape == (1, 8, 8, 256)
    assert feats["conv4_4"].shape == (1, 4, 4, 512)
    # conv taps precede ReLU -> negative values must appear
    assert float(jnp.min(feats["conv4_4"])) < 0


def test_vgg_torch_loader_parity(tmp_path, torch_reference_path):
    """Synthesize a torchvision-format vgg19 state_dict, load it, and check
    features against an inline torch forward of the same weights."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(6)
    cfg = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128)]
    state = {}
    for idx, cin, cout in cfg:
        state[f"features.{idx}.weight"] = torch.from_numpy(
            rng.normal(0, 0.05, (cout, cin, 3, 3)).astype(np.float32)
        )
        state[f"features.{idx}.bias"] = torch.from_numpy(
            rng.normal(0, 0.05, (cout,)).astype(np.float32)
        )
    path = str(tmp_path / "vgg19_fake.pth")
    torch.save(state, path)
    params = load_vgg_torch(path, up_to="conv2_2")

    x = rng.uniform(0, 1, (1, 3, 16, 16)).astype(np.float32)

    t = torch.from_numpy(x)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    t = ((t + 1) / 2 - mean) / std
    t = F.conv2d(t, state["features.0.weight"], state["features.0.bias"], padding=1)
    t = F.relu(t)
    t = F.conv2d(t, state["features.2.weight"], state["features.2.bias"], padding=1)
    conv1_2 = t.clone()
    t = F.max_pool2d(F.relu(t), 2)
    t = F.conv2d(t, state["features.5.weight"], state["features.5.bias"], padding=1)
    t = F.relu(t)
    t = F.conv2d(t, state["features.7.weight"], state["features.7.bias"], padding=1)
    conv2_2 = t.clone()

    feats = vgg_features(params, _nhwc(x), ["conv1_2", "conv2_2"])
    np.testing.assert_allclose(
        np.asarray(feats["conv1_2"]).transpose(0, 3, 1, 2), conv1_2.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(feats["conv2_2"]).transpose(0, 3, 1, 2), conv2_2.numpy(), atol=1e-4
    )


def test_perceptual_loss_runs_and_detaches_gt():
    p = init_vgg(jax.random.PRNGKey(1), up_to="conv2_2")
    a, b = _pair(seed=7, shape=(1, 3, 16, 16))
    weights = {"conv1_2": 1.0, "conv2_2": 1.0}

    percep, style = perceptual_loss(p, _nhwc(a), _nhwc(b), weights, style_weight=1.0)
    assert np.isfinite(float(percep)) and np.isfinite(float(style))

    def loss_wrt_gt(gt):
        l, _ = perceptual_loss(p, _nhwc(a), gt, weights)
        return l

    g = jax.grad(loss_wrt_gt)(_nhwc(b))
    assert float(jnp.max(jnp.abs(g))) == 0.0


def test_composite_training_loss_weights(torch_reference_path):
    """Total loss = L1 + SSIM(0.5) + Edge(50) + 0.01*Perc, both spaces
    (train.py:63-65, options.py:56-61)."""
    a, b = _pair(seed=8, shape=(1, 3, 16, 16))
    p = init_vgg(jax.random.PRNGKey(2), up_to="conv2_2")
    ja, jb = _nhwc(a), _nhwc(b)
    total = (
        l1_loss(ja, jb)
        + ssim_loss(ja, jb, 0.5)
        + edge_loss(ja, jb, 50.0)
        + 0.01 * perceptual_loss(p, ja, jb, {"conv1_2": 1.0, "conv2_2": 1.0})[0]
    )
    assert np.isfinite(float(total))
