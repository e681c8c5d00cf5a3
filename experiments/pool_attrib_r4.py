"""Per-SITE attribution of the serving forward's residual cost pools.

Round-3's per-op ledger (docs/ROUND3_NOTES.md) is aggregated by op *type*
(profiling.op_breakdown strips the ``.N`` instance suffix), which was enough
to size the pools — fusions 296 ms, copies 60, LN stats 54, multiply_add 26,
DUS+misc 35 — but not to attack the last two: "multiply_add tails" is ~30
distinct residual-add/gate sites and we don't know which ones XLA failed to
fuse.  This probe joins

  1. the xplane trace aggregated by FULL instruction name (fusion.123, not
     "fusion"), with
  2. the optimized HLO's per-instruction ``metadata.op_name`` (the jax
     source path, e.g. ``jit(loop)/.../i_lca5/add``), parsed from
     ``compiled.as_text()``,

and prints a time-sorted site table for every instruction matching the
attack pools (multiply_add / dynamic-update-slice / dynamic-slice / copy /
pad / concatenate), so the next kernel (or graph rewrite) targets measured
bytes, not guesses.

Runs on any backend (CPU validates the parsing; pools are only meaningful
on the real chip).  Usage:

  python -u experiments/pool_attrib_r4.py [--batch N] [--iters N] [--top N]

Writes the full table to /tmp/pool_attrib_r4.txt as well as stdout.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re
import sys
import time

sys.path.insert(0, "/root/repo")

# --cpu must take effect before the first jax device touch (the tunnel's
# sitecustomize registers the axon backend; the env var alone is not enough)
import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, cidnet_forward, init_cidnet
from hvi_cidnet_tpu.utils.profiling import trace

H, W = 400, 600

# Instruction-name prefixes belonging to the two unattacked pools, plus the
# copy pool for cross-checking the round-3 audit.
POOL_PAT = re.compile(
    r"^%?(loop_)?(multiply_add|add_multiply|multiply|add|subtract"
    r"|dynamic-update-slice|dynamic_update_slice|dynamic-slice|dynamic_slice"
    r"|copy|pad|concatenate|select|bitcast)"
)


def build(batch: int, iters: int):
    cfg = CIDNetConfig(variant="base")
    params = init_cidnet(jax.random.PRNGKey(0), cfg)
    params = {k: (v.astype(jnp.bfloat16) if v.ndim == 4 else v) for k, v in params.items()}
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (batch, H, W, 3)), jnp.bfloat16)

    @jax.jit
    def loop(p, x):
        def body(carry, _):
            y = jnp.clip(
                cidnet_forward(p, x + carry, cfg, compute_dtype=jnp.bfloat16), 0, 1
            )
            return (jnp.mean(y) * jnp.bfloat16(1e-8)).astype(jnp.bfloat16), None

        final, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=iters)
        return final

    return loop, params, x


def hlo_metadata(hlo_text: str) -> dict:
    """instruction name -> (op_name, source) from optimized HLO text.

    For fusions whose own metadata is empty we fall back to the fused
    computation's body: every body instruction's op_name is collected and
    the most common model-scope prefix wins (a copy fusion fused into, say,
    ``I_LCA5`` carries that block's ops), recorded with a ``~`` marker
    since it is the body's site, not the fusion instruction's own.
    """
    op_re = re.compile(r'op_name="([^"]*)"')
    src_re = re.compile(r'source_file="([^"]*)"\s+source_line=(\d+)')
    inst_re = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*)$")
    comp_re = re.compile(r"^%?([\w.\-]+)\s*(?:\([^)]*\))?\s*->.*\{")
    calls_re = re.compile(r"calls=%?([\w.\-]+)")

    meta = {}
    comp_ops: dict = {}      # computation -> [op_name, ...] of its body
    inst_calls = {}          # instruction -> called computation
    current = None
    for line in hlo_text.splitlines():
        head = line.strip()
        if head.startswith("ENTRY "):
            head = head[len("ENTRY "):]
        cm = comp_re.match(head)
        if cm and "=" not in line.split("{")[0]:
            current = cm.group(1)
            comp_ops.setdefault(current, [])
            continue
        im = inst_re.match(line)
        if not im:
            continue
        name, rest = im.group(1), im.group(2)
        op = op_re.search(rest)
        src = src_re.search(rest)
        if op or src:
            meta[name] = (
                op.group(1) if op else "",
                f"{src.group(1).rsplit('/', 1)[-1]}:{src.group(2)}" if src else "",
            )
            if current and op:
                comp_ops[current].append(op.group(1))
        call = calls_re.search(rest)
        if call:
            inst_calls[name] = call.group(1)

    # fusion fallback: attribute unnamed fusions to their body's dominant site
    for name, comp in inst_calls.items():
        if meta.get(name, ("", ""))[0]:
            continue
        ops = comp_ops.get(comp, [])
        if not ops:
            continue
        # dominant top-level MODEL scope among the body ops (e.g. "I_LCA5") —
        # the jit/scan wrapper segments (jit(loop)/while/body/closed_call/)
        # must be stripped first or every op's top segment is 'while'
        def _top(o):
            o = re.sub(r"^jit\([^)]*\)/", "", o)
            # leading jit/scan wrapper segments, in any combination
            o = re.sub(r"^((while|body|closed_call|cond|branch_\d+)/)+", "", o)
            top = o.split("/")[0]
            # an op whose whole path IS the wrapper = scan carry/ys plumbing
            return top if top not in ("", "while", "body", "closed_call") else "scan-internal"

        tops = collections.Counter(_top(o) for o in ops)
        top, _ = tops.most_common(1)[0]
        meta[name] = (f"~{top} [{len(ops)} body ops]", meta.get(name, ("", ""))[1])
    return meta


def traced_durations(log_dir: str) -> dict:
    """FULL-name device-op durations (us) from the newest trace."""
    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    agg: collections.Counter = collections.Counter()
    for e in data.get("traceEvents", []):
        name = e.get("name", "")
        if e.get("ph") != "X" or not e.get("dur") or name.startswith("$") or "(" in name:
            continue
        agg[name.lstrip("%")] += e["dur"]
    return dict(agg)


def shorten(op_name: str, width: int = 90) -> str:
    # strip the jit(loop)/scan wrapper prefix noise, keep the model path
    op_name = re.sub(r"^jit\([^)]*\)/", "", op_name)
    op_name = re.sub(r"^((while|body|closed_call|cond|branch_\d+)/)+", "", op_name)
    op_name = re.sub(r"jvp\(|vjp\(|transpose\(", "", op_name)
    return op_name[-width:]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--top", type=int, default=60)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (parsing validation; pool times are only "
                         "meaningful on the chip)")
    args = ap.parse_args()

    loop, params, x = build(args.batch, args.iters)
    compiled = loop.lower(params, x).compile()
    meta = hlo_metadata(compiled.as_text())
    print(f"hlo: {len(meta)} instructions with metadata")

    _ = float(loop(params, x))  # warm
    t0 = time.perf_counter()
    _ = float(loop(params, x))
    wall = (time.perf_counter() - t0) / args.iters
    print(f"wall {wall*1e3:.1f} ms/fwd = {args.batch/wall:.1f} img/s")

    logdir = "/tmp/pool_attrib_trace"
    with trace(logdir):
        _ = float(loop(params, x))
    durs = traced_durations(logdir)

    rows = []
    pool_rows = []
    for name, us in sorted(durs.items(), key=lambda kv: -kv[1]):
        op, src = meta.get(name, ("", ""))
        row = (us / 1e3 / args.iters, name, shorten(op), src)
        rows.append(row)
        if POOL_PAT.match(name):
            pool_rows.append(row)

    def fmt(rs):
        return "\n".join(
            f"  {ms:8.2f} ms  {name:<34} {src:<18} {op}" for ms, name, op, src in rs
        )

    out = []
    out.append(f"\n=== attack pools (multiply_add / DUS / copy / pad / concat), ms/fwd ===")
    out.append(fmt(pool_rows[: args.top]))
    pool_total = sum(r[0] for r in pool_rows)
    out.append(f"pool total: {pool_total:.1f} ms/fwd "
               f"({100*pool_total*1e3*args.iters/sum(durs.values()):.1f}% of traced)")
    out.append(f"\n=== all ops top {args.top} (ms/fwd) ===")
    out.append(fmt(rows[: args.top]))
    text = "\n".join(out)
    print(text)
    with open("/tmp/pool_attrib_r4.txt", "w") as f:
        f.write(text + "\n")
    print("\nfull table -> /tmp/pool_attrib_r4.txt")


if __name__ == "__main__":
    main()
