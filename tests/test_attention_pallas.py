"""Per-batch channel-attention Pallas kernel vs the XLA einsum path.

Interpret mode on CPU; the real-TPU win is measured by bench.py/experiments.
Reference semantics: net/LCA.py:26-36 (CAB) and net/TNSM.py:98-114 (TNSM's
unnormalized variant).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hvi_cidnet_tpu.ops.attention import (
    attention_bcn_pallas,
    channel_attention,
    channel_attention_xla,
    use_attn_pallas,
    _attention_pallas_impl,
)


def _qkv(c, heads, h=6, w=10, b=3, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((h, w, c, b)) * 0.5, dtype)
    q, k, v = mk(), mk(), mk()
    temp = jnp.asarray(rng.uniform(0.5, 2.0, (heads, 1, 1)), jnp.float32)
    w_proj = jnp.asarray(rng.standard_normal((1, 1, c, c)) * 0.2, jnp.float32)
    return q, k, v, temp, w_proj


@pytest.mark.parametrize("heads", [1, 2, 4, 8])
@pytest.mark.parametrize("normalize_qk", [True, False])
def test_kernel_matches_xla(heads, normalize_qk, monkeypatch):
    monkeypatch.setenv("PALLAS_FORCE_INTERPRET", "1")
    monkeypatch.setenv("ATTN_USE_PALLAS", "1")
    q, k, v, temp, w_proj = _qkv(16, heads, seed=heads)
    want = channel_attention_xla(
        q, k, v, temp, heads, normalize_qk=normalize_qk, w_proj=w_proj
    )
    got = _attention_pallas_impl(q, k, v, temp, w_proj, heads, normalize_qk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_kernel_without_projection(monkeypatch):
    monkeypatch.setenv("PALLAS_FORCE_INTERPRET", "1")
    monkeypatch.setenv("ATTN_USE_PALLAS", "1")
    q, k, v, temp, _ = _qkv(8, 2, seed=11)
    want = channel_attention_xla(q, k, v, temp, 2, w_proj=None)
    got = _attention_pallas_impl(q, k, v, temp, None, 2, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_dispatcher_uses_kernel_and_matches(monkeypatch):
    monkeypatch.setenv("PALLAS_FORCE_INTERPRET", "1")
    monkeypatch.setenv("ATTN_USE_PALLAS", "1")
    q, k, v, temp, w_proj = _qkv(16, 4, seed=3)
    assert use_attn_pallas(6, 10, 16, 3, q.dtype)
    got = channel_attention(q, k, v, temp, 4, w_proj=w_proj)
    want = channel_attention_xla(q, k, v, temp, 4, w_proj=w_proj)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_gate_rejects_oversized_blocks():
    # an eval-sized single image at L0 channel width would blow VMEM
    assert not use_attn_pallas(1200, 1800, 144, 1, jnp.float32)
    # CPU backend without force-interpret: off
    assert not use_attn_pallas(6, 10, 16, 3, jnp.float32) or __import__("os").environ.get(
        "PALLAS_FORCE_INTERPRET"
    ) == "1"


def test_gradients_route_through_xla_twin(monkeypatch):
    monkeypatch.setenv("PALLAS_FORCE_INTERPRET", "1")
    monkeypatch.setenv("ATTN_USE_PALLAS", "1")
    q, k, v, temp, w_proj = _qkv(8, 2, seed=5)

    def loss_pallas(q, k, v, temp, w_proj):
        return jnp.sum(channel_attention(q, k, v, temp, 2, w_proj=w_proj) ** 2)

    def loss_xla(q, k, v, temp, w_proj):
        return jnp.sum(
            channel_attention_xla(q, k, v, temp, 2, w_proj=w_proj) ** 2
        )

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(q, k, v, temp, w_proj)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(q, k, v, temp, w_proj)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_bcn_kernel_bf16(monkeypatch):
    monkeypatch.setenv("PALLAS_FORCE_INTERPRET", "1")
    monkeypatch.setenv("ATTN_USE_PALLAS", "1")
    rng = np.random.default_rng(9)
    b, c, n = 2, 16, 128
    qb = jnp.asarray(rng.standard_normal((b, c, n)), jnp.bfloat16)
    temp = jnp.ones((c,), jnp.float32)
    out = attention_bcn_pallas(
        qb, qb, qb, temp, None, heads=2, normalize_qk=True, interpret=True
    )
    assert out.shape == (b, c, n) and out.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


@pytest.mark.parametrize("heads", [1, 4])
@pytest.mark.parametrize("normalize_qk", [True, False])
@pytest.mark.parametrize("with_proj", [True, False])
def test_ncb_feed_matches_hwcb(heads, normalize_qk, with_proj):
    """ATTN_NCB_FEED seam: the flattened-spatial feed is the same
    contraction — outputs must match the HWCB arm (train-feed A/B,
    VERDICT r3 item 7)."""
    from hvi_cidnet_tpu.ops.pallas_gate import kernel_flags

    q, k, v, temp, w_proj = _qkv(16, heads, seed=40 + heads)
    wp = w_proj if with_proj else None
    want = channel_attention_xla(
        q, k, v, temp, heads, normalize_qk=normalize_qk, w_proj=wp
    )
    with kernel_flags(attn_ncb_feed=True):
        got = channel_attention_xla(
            q, k, v, temp, heads, normalize_qk=normalize_qk, w_proj=wp
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6, rtol=1e-6)


def test_ncb_feed_gradients_match():
    """The seam must be exact through autodiff too (it runs in training)."""
    from hvi_cidnet_tpu.ops.pallas_gate import kernel_flags

    q, k, v, temp, w_proj = _qkv(8, 2, seed=77)

    def loss(q, k, v, temp):
        out = channel_attention_xla(q, k, v, temp, 2, w_proj=w_proj)
        return jnp.sum(out * out)

    want = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, temp)
    with kernel_flags(attn_ncb_feed=True):
        got = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, temp)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-5, rtol=1e-5)
