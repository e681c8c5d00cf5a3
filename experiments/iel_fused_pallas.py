"""EXPERIMENT (negative result, kept for round-2 reference):
fused LN+IEL(+residual) Pallas kernel, NHCW.

Correct to 1e-7 fp32 / 1 ulp bf16 vs the XLA composition, but 2x SLOWER at
level-1 shapes (78 vs 41 ms, batch 128 x 200x300x36): the in-kernel
depthwise convs (9 shifted fma passes with f32 rolls per row) are ~2x
slower than XLA's native dw conv lowering, outweighing the ~8x HBM-traffic
savings of full fusion.  To win, the dw taps need a native bf16
sublane/lane rotate (Mosaic currently rejects non-32-bit rotates) or a
different in-VMEM decomposition.

Usage: python experiments/iel_fused_pallas.py  (interpret-mode self-check)

IEL(x) = po( (tanh(dw1(h1)) + h1) * (tanh(dw2(h2)) + h2) )
  where h1 = dw_a(pi_a(LN(x))), h2 = dw_b(pi_b(LN(x)))  (split halves)

Lane convention inside: buffer lane w holds position w-1 (xp left-padded 1).
Row convention: tile t covers output rows [t*TH, (t+1)*TH); needs raw rows
[t*TH-2, t*TH+TH+2) -> from blocks t-1, t, t+1 (zero-masked at t==0 / t==last).
"""
import functools
import numpy as np, jax, jax.numpy as jnp, time
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 8
INTERPRET = False


def _shift(buf, dx, wl):
    """shifted[w] = buf[w + dx - 1] in f32 (Mosaic rotate needs 32-bit)."""
    b32 = buf.astype(jnp.float32)
    s = (1 - dx) % wl
    if s == 0:
        return b32
    return pltpu.roll(b32, s, 1)


def fused_iel(x, w_pi, w_dw, w_dw1, w_dw2, w_po, ln_g, ln_b, residual):
    B, H, C, W = x.shape
    hid = w_pi.shape[-1] // 2
    HP = (hid + 7) // 8 * 8
    CP = (C + 7) // 8 * 8
    WL = (W + 2 + 127) // 128 * 128
    n_tiles = (H + TH - 1) // TH
    Hp = n_tiles * TH

    # x padded: rows to Hp (zeros), channels to CP, lanes: left 1, right to WL
    xp = jnp.pad(x, ((0, 0), (0, Hp - H), (0, CP - C), (1, WL - W - 1)))

    f32 = jnp.float32
    def padh(a, axis):  # pad hidden dim to HP
        cfg = [(0, 0)] * a.ndim
        cfg[axis] = (0, HP - hid)
        return jnp.pad(a, cfg)

    # project_in halves, transposed to (HP, CP)
    wp = w_pi.astype(f32).reshape(C, 2 * hid)
    wpa = padh(wp[:, :hid].T, 0)          # (HP, C)
    wpb = padh(wp[:, hid:].T, 0)
    wpa = jnp.pad(wpa, ((0, 0), (0, CP - C))).astype(x.dtype)
    wpb = jnp.pad(wpb, ((0, 0), (0, CP - C))).astype(x.dtype)
    # depthwise weights (3,3,1,2h) -> (9, HP) per half
    wd = w_dw.astype(f32).reshape(9, 2 * hid)
    wda = padh(wd[:, :hid], 1)
    wdb = padh(wd[:, hid:], 1)
    wd1 = padh(w_dw1.astype(f32).reshape(9, hid), 1)
    wd2 = padh(w_dw2.astype(f32).reshape(9, hid), 1)
    # project_out (1,1,hid,C) -> (C rows padded to CP, HP)
    wpo = w_po.astype(f32).reshape(hid, C).T  # (C, hid)
    wpo = jnp.pad(wpo, ((0, CP - C), (0, HP - hid))).astype(x.dtype)
    ln_gp = jnp.pad(ln_g.astype(f32), (0, CP - C)).reshape(CP, 1)
    ln_bp = jnp.pad(ln_b.astype(f32), (0, CP - C)).reshape(CP, 1)

    def kernel(xm_ref, x0_ref, xp_ref, wpa_ref, wpb_ref, wda_ref, wdb_ref,
               wd1_ref, wd2_ref, wpo_ref, g_ref, b_ref, o_ref,
               pia_scr, pib_scr, da_scr, db_scr):
        t = pl.program_id(1)
        nt = pl.num_programs(1)

        def raw_row(rloc):
            # rloc in [-2, TH+2): local row within tile t
            if rloc < 0:
                row = xm_ref[0, TH + rloc]
                return jnp.where(t > 0, row, 0.0 * row)
            if rloc >= TH:
                row = xp_ref[0, rloc - TH]
                return jnp.where(t < nt - 1, row, 0.0 * row)
            return x0_ref[0, rloc]

        def ln_pi(rloc, idx):
            xr = raw_row(rloc).astype(jnp.float32)  # (CP, WL)
            u = jnp.sum(xr, axis=0, keepdims=True) / C
            m2 = jnp.sum(xr * xr, axis=0, keepdims=True) / C
            s = jnp.maximum(m2 - u * u, 0.0)
            y = (xr - u) * jax.lax.rsqrt(s + 1e-6)
            y = (g_ref[:] * y + b_ref[:]).astype(x0_ref.dtype)
            # project_in halves: (HP, CP) @ (CP, WL)
            pia_scr[idx] = jax.lax.dot_general(
                wpa_ref[:], y, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x0_ref.dtype)
            pib_scr[idx] = jax.lax.dot_general(
                wpb_ref[:], y, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x0_ref.dtype)

        lane = jax.lax.broadcasted_iota(jnp.int32, (HP, WL), 1)
        lane_valid = jnp.logical_and(lane >= 1, lane <= W)  # lane w = pos w-1

        def ln_pi(rloc, idx):
            xr = raw_row(rloc).astype(jnp.float32)  # (CP, WL)
            u = jnp.sum(xr, axis=0, keepdims=True) / C
            m2 = jnp.sum(xr * xr, axis=0, keepdims=True) / C
            s = jnp.maximum(m2 - u * u, 0.0)
            y = (xr - u) * jax.lax.rsqrt(s + 1e-6)
            y = (g_ref[:] * y + b_ref[:]).astype(x0_ref.dtype)
            glob = t * TH + rloc
            valid = jnp.logical_and(glob >= 0, glob < H)
            pia = jax.lax.dot_general(
                wpa_ref[:], y, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            pib = jax.lax.dot_general(
                wpb_ref[:], y, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # zero-pad semantics: pi must be exactly 0 outside the image
            # (LN + matmul of zero rows is NOT zero because of the LN bias)
            mask = jnp.logical_and(lane_valid, valid)
            pia_scr[idx] = jnp.where(mask, pia, 0.0).astype(x0_ref.dtype)
            pib_scr[idx] = jnp.where(mask, pib, 0.0).astype(x0_ref.dtype)

        for i, rloc in enumerate(range(-2, TH + 2)):
            ln_pi(rloc, i)

        def dwrow(src_scr, wd_ref, rloc):
            # dw output for tile-local row rloc; taps pi rows rloc-1..rloc+1
            # live at buffer idx rloc+1..rloc+3
            acc = jnp.zeros((HP, WL), jnp.float32)
            for dy in range(3):
                src = src_scr[rloc + 1 + dy]
                for dx in range(3):
                    tap = _shift(src, dx, WL)
                    acc = acc + wd_ref[dy * 3 + dx][:, None] * tap
            return jnp.where(lane_valid, acc, 0.0)

        # first dw layer: rows -1..TH stored at idx rloc+1.  Rows outside
        # the image are zeroed: the second dw's zero-SAME padding must see
        # zeros, not the conv continuation beyond the boundary.
        for j, rloc in enumerate(range(-1, TH + 1)):
            glob = t * TH + rloc
            valid = jnp.logical_and(glob >= 0, glob < H)
            ra = dwrow(pia_scr, wda_ref, rloc)
            rb = dwrow(pib_scr, wdb_ref, rloc)
            da_scr[j] = jnp.where(valid, ra, 0.0).astype(x0_ref.dtype)
            db_scr[j] = jnp.where(valid, rb, 0.0).astype(x0_ref.dtype)

        outs = []
        for o in range(TH):
            acc1 = jnp.zeros((HP, WL), jnp.float32)
            acc2 = jnp.zeros((HP, WL), jnp.float32)
            for dy in range(3):
                s1 = da_scr[o + dy]
                s2 = db_scr[o + dy]
                for dx in range(3):
                    t1 = _shift(s1, dx, WL)
                    t2 = _shift(s2, dx, WL)
                    acc1 = acc1 + wd1_ref[dy * 3 + dx][:, None] * t1
                    acc2 = acc2 + wd2_ref[dy * 3 + dx][:, None] * t2
            acc1 = jnp.where(lane_valid, acc1, 0.0)
            acc2 = jnp.where(lane_valid, acc2, 0.0)
            h1 = da_scr[o + 1].astype(jnp.float32)
            h2 = db_scr[o + 1].astype(jnp.float32)
            gate = ((jnp.tanh(acc1) + h1) * (jnp.tanh(acc2) + h2)).astype(x0_ref.dtype)
            out = jax.lax.dot_general(
                wpo_ref[:], gate, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (CP, WL)
            if residual:
                out = out + raw_row(o).astype(jnp.float32)
            outs.append(out.astype(o_ref.dtype))
        o_ref[0] = jnp.stack(outs, axis=0)

    spec = lambda off: pl.BlockSpec(
        (1, TH, CP, WL),
        lambda bb, tt: (bb, jnp.maximum(jnp.minimum(tt + off, n_tiles - 1), 0), 0, 0),
        memory_space=pltpu.VMEM)
    vspec = lambda shape: pl.BlockSpec(shape, lambda bb, tt: tuple([0]*len(shape)), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            spec(-1), spec(0), spec(1),
            vspec((HP, CP)), vspec((HP, CP)),
            vspec((9, HP)), vspec((9, HP)), vspec((9, HP)), vspec((9, HP)),
            vspec((CP, HP)), vspec((CP, 1)), vspec((CP, 1)),
        ],
        out_specs=pl.BlockSpec((1, TH, CP, WL), lambda bb, tt: (bb, tt, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hp, CP, WL), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 4, HP, WL), x.dtype),
            pltpu.VMEM((TH + 4, HP, WL), x.dtype),
            pltpu.VMEM((TH + 2, HP, WL), x.dtype),
            pltpu.VMEM((TH + 2, HP, WL), x.dtype),
        ],
        interpret=INTERPRET,
    )(xp, xp, xp, wpa, wpb,
      jnp.asarray(wda, f32), jnp.asarray(wdb, f32), jnp.asarray(wd1, f32), jnp.asarray(wd2, f32),
      wpo, ln_gp, ln_bp)
    return out[:, :H, :C, 1 : W + 1]


def reference(x, w_pi, w_dw, w_dw1, w_dw2, w_po, ln_g, ln_b, residual):
    import sys
    sys.path.insert(0, "/root/repo")
    from hvi_cidnet_tpu.models.layers import iel, layer_norm_channels

    p = {
        "z.project_in.weight": w_pi, "z.dwconv.weight": w_dw,
        "z.dwconv1.weight": w_dw1, "z.dwconv2.weight": w_dw2,
        "z.project_out.weight": w_po,
    }
    y = iel(p, "z", layer_norm_channels(x, ln_g, ln_b))
    return x + y if residual else y


def main():
    B, H, C, W = 2, 24, 12, 40
    hid = int(C * 2.66)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, C, W)).astype(np.float32))
    w_pi = jnp.asarray(rng.normal(0, 0.1, (1, 1, C, 2 * hid)).astype(np.float32))
    w_dw = jnp.asarray(rng.normal(0, 0.1, (3, 3, 1, 2 * hid)).astype(np.float32))
    w_dw1 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 1, hid)).astype(np.float32))
    w_dw2 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 1, hid)).astype(np.float32))
    w_po = jnp.asarray(rng.normal(0, 0.1, (1, 1, hid, C)).astype(np.float32))
    g = jnp.asarray(rng.normal(1, 0.05, (C,)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.05, (C,)).astype(np.float32))

    want = reference(x, w_pi, w_dw, w_dw1, w_dw2, w_po, g, b, True)
    got = fused_iel(x, w_pi, w_dw, w_dw1, w_dw2, w_po, g, b, True)
    print("max diff:", float(jnp.max(jnp.abs(want - got))))


if __name__ == "__main__":
    main()
