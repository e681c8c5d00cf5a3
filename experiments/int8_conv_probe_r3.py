"""Is int8 convolution faster than bf16 on this chip? (round-3 probe)

The serving forward is memory-bound (294 GB/fwd, 68% HBM roofline,
docs/ROUND3_NOTES.md).  int8 activations+weights would halve the dominant
traffic term IF the tunnel TPU lowers s8xs8->s32 convs onto the MXU's
int8 path.  This measures the L0/L1 stem convs in bf16 vs int8 at serving
geometry.  Positive => an opt-in quantized-serving mode is worth building;
negative => the idea dies here.
"""

import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax import lax

def timed(fn, *args, iters=8):
    @jax.jit
    def loop(*a):
        def body(c, _):
            y = fn(*a)
            return c + y.ravel()[0].astype(jnp.float32) * 1e-20, None
        f, _ = lax.scan(body, jnp.float32(0), None, length=iters)
        return f
    _ = float(loop(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(loop(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best

DN = lax.conv_dimension_numbers((1,1,1,1), (1,1,1,1), ("HWCN", "HWIO", "HWCN"))

def conv(x, w, out_dt):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=out_dt)

for (h, w_, cin, cout, tag) in [(400, 600, 36, 36, "L0"), (200, 300, 72, 72, "L1ish")]:
    key = jax.random.PRNGKey(0)
    xb = jax.jit(lambda k: jax.random.uniform(k, (h, w_, cin, 128), jnp.bfloat16, -1, 1))(key)
    wb = jax.jit(lambda k: jax.random.uniform(k, (3, 3, cin, cout), jnp.bfloat16, -0.1, 0.1))(key)
    xi = jax.jit(lambda x: (x * 127).astype(jnp.int8))(xb)
    wi = jax.jit(lambda w: (w * 127).astype(jnp.int8))(wb)
    tb = timed(functools.partial(conv, out_dt=jnp.bfloat16), xb, wb)
    ti = timed(functools.partial(conv, out_dt=jnp.int32), xi, wi)
    print(f"{tag} conv3x3 {cin}->{cout}: bf16 {tb*1e3:.2f} ms   int8 {ti*1e3:.2f} ms   ratio {tb/ti:.2f}x")

# requantized variants: the output fusion converts to a narrow dtype, so
# write traffic is 1-2 bytes, not int32's 4 (the realistic pipeline shape)
def conv_i8_requant(x, w, scale):
    y = conv(x, w, jnp.int32)
    return jnp.clip(jnp.round(y.astype(jnp.float32) * scale), -127, 127).astype(jnp.int8)

def conv_bf16_out(x, w, scale):
    y = conv(x, w, jnp.int32)
    return (y.astype(jnp.float32) * scale).astype(jnp.bfloat16)

for (h, w_, cin, cout, tag) in [(400, 600, 36, 36, "L0"), (200, 300, 72, 72, "L1ish")]:
    key = jax.random.PRNGKey(0)
    xb = jax.jit(lambda k: jax.random.uniform(k, (h, w_, cin, 128), jnp.bfloat16, -1, 1))(key)
    wb = jax.jit(lambda k: jax.random.uniform(k, (3, 3, cin, cout), jnp.bfloat16, -0.1, 0.1))(key)
    xi = jax.jit(lambda x: (x * 127).astype(jnp.int8))(xb)
    wi = jax.jit(lambda w: (w * 127).astype(jnp.int8))(wb)
    s = jnp.float32(1.0 / (127 * 127))
    tb = timed(functools.partial(conv, out_dt=jnp.bfloat16), xb, wb)
    t8 = timed(conv_i8_requant, xi, wi, s)
    tbo = timed(conv_bf16_out, xi, wi, s)
    print(f"{tag}: bf16 {tb*1e3:.2f} ms   int8->int8 {t8*1e3:.2f} ({tb/t8:.2f}x)   int8->bf16 {tbo*1e3:.2f} ({tb/tbo:.2f}x)")
