#!/usr/bin/env python
"""Single-image enhancement CLI — twin of the reference ``demo.py``.

Same flags: input/output_dir/weight/gamma/alpha_s/alpha_i (+--cpu); pads to
x8 with reflect, runs with both gates enabled, crops, saves
``enhanced_<name>`` (demo.py:11-73).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

parser = argparse.ArgumentParser(description="HVI-CIDNet inference (TPU)")
parser.add_argument("--input", type=str, required=True)
parser.add_argument("--output_dir", type=str, default="output")
parser.add_argument("--weight", type=str, default="weights/SICE.pth")
parser.add_argument("--gamma", type=float, default=1.0, help="lower = brighter")
parser.add_argument("--alpha_s", type=float, default=1.0, help="saturation")
parser.add_argument("--alpha_i", type=float, default=1.0, help="intensity")
parser.add_argument("--cpu", action="store_true", help="run on CPU instead of TPU")
parser.add_argument("--variant", type=str, default="base", choices=["base", "mssa", "tnsm"])
parser.add_argument("--random_init", action="store_true",
                    help="run with fresh random weights (no weight file needed)")
parser.add_argument("--spatial", action="store_true",
                    help="shard the image's rows over all addressable chips "
                         "(full-res multi-chip inference; halo exchange by "
                         "XLA). Equals single-chip when H divides 8*chips; "
                         "otherwise H pads to that multiple inside the "
                         "program, which perturbs values slightly (padding "
                         "is visible through channel attention — the same "
                         "class of effect as the reference's own pad-to-x8)."
                         " No effect on one device")
from hvi_cidnet_tpu.utils.compile_cache import add_compile_cache_flag  # noqa: E402

add_compile_cache_flag(parser)
args = parser.parse_args()

if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

from hvi_cidnet_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(args.compile_cache)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from PIL import Image  # noqa: E402

from hvi_cidnet_tpu.eval.evaluator import Evaluator  # noqa: E402
from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, HVIGates, init_cidnet  # noqa: E402

os.makedirs(args.output_dir, exist_ok=True)
cfg = CIDNetConfig(variant=args.variant)
if args.random_init:
    weights = init_cidnet(jax.random.PRNGKey(0), cfg)
else:
    print(f"loading weights: {args.weight}")
    weights = args.weight

# demo.py enables both gates (demo.py:32-33,41-42)
gates = HVIGates(gated=True, gated2=True, alpha=args.alpha_i, alpha_s=args.alpha_s)

print(f"processing: {args.input}")
img = np.asarray(Image.open(args.input).convert("RGB"), np.float32) / 255.0

if args.spatial and jax.device_count() > 1:
    # rows sharded over the chips; pad-to-mesh + crop handled inside the jit
    from hvi_cidnet_tpu.parallel.inference import spatial_enhance_fn
    from hvi_cidnet_tpu.parallel.mesh import make_mesh
    from hvi_cidnet_tpu.train.checkpoint import load_any

    mesh = make_mesh(axis_names=("spatial",))
    print(f"spatial serving: rows sharded over {mesh.devices.size} devices")
    params = load_any(weights) if isinstance(weights, str) else weights
    fn, rs, rep = spatial_enhance_fn(mesh, cfg, gates, gamma=args.gamma)
    x = jax.device_put(jnp.asarray(img[None], jnp.float32), rs)
    out = np.asarray(fn(jax.device_put(params, rep), x))[0]
else:
    ev = Evaluator(weights, cfg, gates, gamma=args.gamma)
    out = ev.enhance(img)
name = os.path.basename(args.input)
out_path = os.path.join(args.output_dir, f"enhanced_{name}")
Image.fromarray((np.clip(out, 0, 1) * 255.0).astype(np.uint8)).save(out_path)
print(f"saved: {out_path}")
