#!/usr/bin/env python
"""SID / LOL-Blur full-resolution scene evaluator — twin of ``eval_SID_blur.py``.

Iterates numbered scene directories (Blur 1..256, SID '1'+NNNN 1..229),
running each frame at full resolution with the base CIDNet graph and no
gates, saving per-scene output folders (eval_SID_blur.py:45-76).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from hvi_cidnet_tpu.data.datasets import EvalDataset
from hvi_cidnet_tpu.eval.evaluator import Evaluator
from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, HVIGates

p = argparse.ArgumentParser(description="Eval")
p.add_argument("--SID", action="store_true")
p.add_argument("--Blur", action="store_true")
p.add_argument("--weights", type=str, default=None)
p.add_argument("--variant", type=str, default="base", choices=["base", "mssa", "tnsm"])
p.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
p.add_argument("--dp", action="store_true",
               help="shard each batch over all addressable chips (same "
                    "numbers as single-chip; no effect on one device)")
from hvi_cidnet_tpu.utils.compile_cache import add_compile_cache_flag, enable_compilation_cache  # noqa: E402

add_compile_cache_flag(p)
ep = p.parse_args()
enable_compilation_cache(ep.compile_cache)

if ep.Blur:
    test_dir, weights, out_root = "./datasets/LOL_blur/test/low_blur/", "./weights/LOL-Blur.pth", "./output/LOL_Blur/"
    scenes = [str(i).zfill(4) for i in range(1, 257)]
elif ep.SID:
    test_dir, weights, out_root = "./datasets/Sony_total_dark/test/short/", "./weights/SID.pth", "./output/SID/"
    scenes = ["1" + str(i).zfill(4) for i in range(1, 230)]
else:
    raise SystemExit("pass --SID or --Blur")

if ep.weights:
    weights = ep.weights

mesh = None
if ep.dp:
    import jax

    from hvi_cidnet_tpu.parallel.mesh import make_mesh

    if jax.device_count() > 1:
        mesh = make_mesh(axis_names=("data",))
        print(f"dp serving: batch sharded over {mesh.devices.size} devices")

ev = Evaluator(weights, CIDNetConfig(variant=ep.variant), HVIGates(), compute_dtype=jnp.dtype(ep.dtype), mesh=mesh)
os.makedirs(out_root, exist_ok=True)
for scene in scenes:
    now_dir = os.path.join(test_dir, scene)
    if not os.path.isdir(now_dir):
        continue
    print("Evaluation:", now_dir)
    ev.run_dataset(EvalDataset(now_dir), os.path.join(out_root, scene), verbose=False)
print("done")
