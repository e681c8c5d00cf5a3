"""Dump optimized HLO of the bench forward and account for copy/slice bytes."""

from __future__ import annotations

import collections
import re
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, cidnet_forward, init_cidnet


def shape_bytes(s: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", s)
    if not m:
        return 0
    dt, dims = m.groups()
    sz = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f16": 2, "s8": 1}.get(dt, 4)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * sz


def main():
    batch = 128
    cfg = CIDNetConfig(variant="base")
    params = init_cidnet(jax.random.PRNGKey(0), cfg)
    params = {k: (v.astype(jnp.bfloat16) if v.ndim == 4 else v) for k, v in params.items()}
    x = jnp.zeros((batch, 400, 600, 3), jnp.bfloat16)

    def fwd(p, x):
        return jnp.clip(cidnet_forward(p, x, cfg, compute_dtype=jnp.bfloat16), 0, 1)

    txt = jax.jit(fwd).lower(params, x).compile().as_text()
    with open("/tmp/fwd_hlo.txt", "w") as f:
        f.write(txt)
    print("HLO lines:", len(txt.splitlines()))

    # account copies by shape
    cop = collections.Counter()
    cnt = collections.Counter()
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"%?([\w.-]+) = (\S+) copy\(", ls)
        if m:
            b = shape_bytes(m.group(2))
            cop[m.group(2)] += b
            cnt[m.group(2)] += 1
    total = sum(cop.values())
    print(f"\ntotal copy bytes (static): {total/1e9:.2f} GB")
    for s, b in cop.most_common(15):
        print(f"  {s:60s} {b/1e6:9.0f} MB  x{cnt[s]}")

    # count convolutions and fusions
    nconv = len(re.findall(r" convolution\(", txt))
    nfus = len(re.findall(r"= \S+ fusion\(", txt))
    print(f"\nconvolutions: {nconv}, fusions: {nfus}")

    # biggest fusion outputs
    fos = collections.Counter()
    for line in txt.splitlines():
        m = re.match(r"\s*%?([\w.-]+) = (\S+) fusion\(", line.strip())
        if m:
            fos[m.group(2)] += shape_bytes(m.group(2).split("{")[0])
    print("\nfusion output bytes by shape (top 12):")
    for s, b in fos.most_common(12):
        print(f"  {s:70s} {b/1e6:9.0f} MB")


if __name__ == "__main__":
    main()
