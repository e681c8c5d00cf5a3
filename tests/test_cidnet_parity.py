"""End-to-end CIDNet parity vs the torch reference (random weights).

The released checkpoints aren't in this environment, so the oracle is the
reference model itself with freshly-initialized weights: export its
state_dict, convert with compat.torch_ckpt, and require the fp32 forward to
match within tight tolerance (SURVEY.md §4 plan item (b)).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hvi_cidnet_tpu.compat.torch_ckpt import from_torch_state_dict, to_torch_state_dict
from hvi_cidnet_tpu.models.cidnet import (
    CIDNetConfig,
    HVIGates,
    cidnet_forward,
    init_cidnet,
)

pytestmark = pytest.mark.heavy

ATOL = 2e-5


def _forward_pair(torch_model, config, gates=HVIGates(), img_shape=(1, 3, 32, 48), seed=0):
    import torch

    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, img_shape).astype(np.float32)
    torch_model.eval()
    with torch.no_grad():
        t_out = torch_model(torch.from_numpy(img))
    params = from_torch_state_dict(torch_model.state_dict())
    j_out = cidnet_forward(params, jnp.asarray(img.transpose(0, 2, 3, 1)), config, gates)
    return t_out, j_out


def test_base_cidnet_parity(torch_reference_path):
    from net.CIDNet import CIDNet

    t_out, j_out = _forward_pair(CIDNet(), CIDNetConfig(variant="base"))
    np.testing.assert_allclose(
        np.asarray(j_out).transpose(0, 3, 1, 2), t_out.numpy(), atol=ATOL
    )


def test_base_cidnet_parity_gated(torch_reference_path):
    from net.CIDNet import CIDNet

    model = CIDNet()
    model.trans.gated2 = True
    model.trans.alpha = 0.84
    t_out, j_out = _forward_pair(
        model, CIDNetConfig(variant="base"), HVIGates(gated2=True, alpha=0.84), seed=1
    )
    np.testing.assert_allclose(
        np.asarray(j_out).transpose(0, 3, 1, 2), t_out.numpy(), atol=ATOL
    )


def test_mssa_cidnet_parity(torch_reference_path):
    from net.CIDNet_MSSA import CIDNet as CIDNetMSSA

    t_out, j_out = _forward_pair(CIDNetMSSA(), CIDNetConfig(variant="mssa"), seed=2)
    np.testing.assert_allclose(
        np.asarray(j_out).transpose(0, 3, 1, 2), t_out.numpy(), atol=ATOL
    )


def test_tnsm_cidnet_parity_eval(torch_reference_path):
    from net.CIDNet_TNSM import CIDNet_TNSM

    import torch

    model = CIDNet_TNSM()
    model.eval()
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_out, t_noise = model(torch.from_numpy(img))
    assert t_noise is None
    params = from_torch_state_dict(model.state_dict())
    j_out, j_noise = cidnet_forward(
        params, jnp.asarray(img.transpose(0, 2, 3, 1)), CIDNetConfig(variant="tnsm")
    )
    assert j_noise is None
    np.testing.assert_allclose(
        np.asarray(j_out).transpose(0, 3, 1, 2), t_out.numpy(), atol=ATOL
    )


def test_tnsm_cidnet_parity_training(torch_reference_path):
    from net.CIDNet_TNSM import CIDNet_TNSM

    import torch

    model = CIDNet_TNSM()
    model.train()
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_out, t_noise = model(torch.from_numpy(img))
    params = from_torch_state_dict(model.state_dict())
    j_out, j_noise = cidnet_forward(
        params,
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        CIDNetConfig(variant="tnsm"),
        training=True,
    )
    np.testing.assert_allclose(
        np.asarray(j_out).transpose(0, 3, 1, 2), t_out.numpy(), atol=ATOL
    )
    np.testing.assert_allclose(
        np.asarray(j_noise).transpose(0, 3, 1, 2), t_noise.numpy(), atol=ATOL
    )


@pytest.mark.parametrize("variant", ["base", "mssa", "tnsm"])
def test_init_matches_reference_param_names(torch_reference_path, variant):
    """Our init emits exactly the reference's state_dict keys and shapes."""
    if variant == "base":
        from net.CIDNet import CIDNet as Ref

        ref = Ref()
    elif variant == "mssa":
        from net.CIDNet_MSSA import CIDNet as Ref

        ref = Ref()
    else:
        from net.CIDNet_TNSM import CIDNet_TNSM as Ref

        ref = Ref()

    import jax

    ours = init_cidnet(jax.random.PRNGKey(0), CIDNetConfig(variant=variant))
    theirs = {k: tuple(v.shape) for k, v in ref.state_dict().items()}
    converted = {k: tuple(v.shape) for k, v in to_torch_state_dict(ours).items()}
    assert converted == theirs


def test_bf16_forward_close_to_fp32(torch_reference_path):
    """bf16 compute keeps outputs within the north-star image tolerance."""
    import jax

    params = init_cidnet(jax.random.PRNGKey(1), CIDNetConfig(variant="base"))
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    out32 = cidnet_forward(params, img, CIDNetConfig(variant="base"))
    p16 = {k: v.astype(jnp.bfloat16) if v.ndim == 4 else v for k, v in params.items()}
    out16 = cidnet_forward(
        p16, img.astype(jnp.bfloat16), CIDNetConfig(variant="base"), compute_dtype=jnp.bfloat16
    )
    err = np.abs(np.asarray(out16, np.float32) - np.asarray(out32))
    assert err.mean() < 0.02
