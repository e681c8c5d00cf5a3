"""Fused channel-LayerNorm Pallas kernel on HWCB activations.

The round-3 forward profile attributes ~59 ms/fwd to LN statistics passes
(multiply_reduce + convert_reduce fusions) plus the normalize-apply inside
the fusion pool — XLA runs channel LN as separate reduce programs feeding
an apply fusion, i.e. >=3 passes over each tensor.  Channel LN reduces over
the C (sublane) axis only, so every (th, W, C, B) block is self-contained:
this kernel computes fp32 E[x]/E[x^2] and applies the normalization in one
HBM read + one write.

Semantics match ops/conv.py:layer_norm_channels exactly in spirit (biased
variance, eps inside rsqrt — reference net/transformer_utils.py:24-29) and
its bf16 flavor numerically: fp32 statistics, bf16 apply arithmetic
(scale/shift cast to the activation dtype before the elementwise apply).
Backward: custom_vjp via the XLA twin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hvi_cidnet_tpu.ops.pallas_gate import backend_ok, force_interpret, kernel_flag, pallas_allowed


def use_ln_pallas(b: int) -> bool:
    """Opt-in (``LN_USE_PALLAS=1``): MEASURED NET NEGATIVE at serving.

    Same-window TPU A/B (bench.py, 600x400 batch 128 bf16): 229.9 img/s
    with the kernel vs 242.2 without (repeat arm 230.0 — not drift).  The
    one-pass fusion saves HBM passes but the cross-sublane C reductions +
    per-element converts hit the same Mosaic issue-slot wall as the IEL
    kernel (ops/iel_pallas.py): XLA's reduce emitters are faster than the
    traffic saved.  Kept as an exact, tested seam behind the flag."""
    if not kernel_flag("ln_pallas"):
        return False
    return pallas_allowed() and backend_ok() and b % 128 == 0


def _pick_th(h: int, bytes_per_row: float, budget=88 * 1024 * 1024) -> int:
    """Largest th whose in+out windows (double-buffered: 4x th rows) plus
    fp32 stats temporaries fit the VMEM budget."""
    for th in (32, 16, 8, 4, 2, 1):
        if h % th == 0 and 4.6 * th * bytes_per_row <= budget:
            return th
    return 1


def _ln_kernel(x_ref, w_ref, b_ref, o_ref, *, eps):
    f32 = jnp.float32
    x = x_ref[:]
    n = x.shape[2]
    dt = x.dtype
    if dt == f32:
        # exact two-pass form, same as the XLA f32 path (parity-tested)
        u = jnp.mean(x, axis=2, keepdims=True)
        d = x - u
        s = jnp.mean(d * d, axis=2, keepdims=True)
        y = d * jax.lax.rsqrt(s + eps)
        o_ref[:] = w_ref[:] * y + b_ref[:]
        return
    # bf16: fp32 statistics via converting reduces (E[x^2] - E[x]^2),
    # bf16 apply — numerically identical to layer_norm_channels' bf16 flavor
    u = jnp.sum(x.astype(f32), axis=2, keepdims=True) / n
    m2 = jnp.sum(jnp.square(x.astype(f32)), axis=2, keepdims=True) / n
    s = jnp.maximum(m2 - u * u, 0.0)
    scale = jax.lax.rsqrt(s + eps).astype(dt)
    shift = u.astype(dt)
    o_ref[:] = w_ref[:].astype(dt) * ((x - shift) * scale) + b_ref[:].astype(dt)


def layer_norm_pallas(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    """(H, W, C, B) channel LN, one read + one write."""
    h, w, c, b = x.shape
    itemsize = jnp.dtype(x.dtype).itemsize
    th = _pick_th(h, float(w * c * b * itemsize))
    kern = functools.partial(_ln_kernel, eps=eps)
    wspec = pl.BlockSpec((1, 1, c, 1), lambda t: (0, 0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(h // th,),
        in_specs=[
            pl.BlockSpec((th, w, c, b), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            wspec,
            wspec,
        ],
        out_specs=pl.BlockSpec((th, w, c, b), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x, weight.reshape(1, 1, c, 1).astype(jnp.float32), bias.reshape(1, 1, c, 1).astype(jnp.float32))


def _xla_ln(x, weight, bias):
    from hvi_cidnet_tpu.ops.conv import layer_norm_channels

    return layer_norm_channels(x, weight, bias)


@jax.custom_vjp
def _ln_p(x, weight, bias):
    return layer_norm_pallas(x, weight, bias, interpret=force_interpret())


def _ln_fwd(x, weight, bias):
    return _ln_p(x, weight, bias), (x, weight, bias)


def _ln_bwd(res, ct):
    x, weight, bias = res
    _, vjp = jax.vjp(_xla_ln, x, weight, bias)
    return vjp(ct)


_ln_p.defvjp(_ln_fwd, _ln_bwd)


def layer_norm_channels_fused(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """Dispatching channel LN: Pallas at lane-aligned serving batches, the
    XLA fused-stats path otherwise."""
    if use_ln_pallas(x.shape[3]):
        return _ln_p(x, weight, bias)
    return _xla_ln(x, weight, bias)
