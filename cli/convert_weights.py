#!/usr/bin/env python
"""Weight converter: torch .pth / safetensors <-> native .npz.

Examples:
  python cli/convert_weights.py weights/LOLv1/w_perc.pth out.npz
  python cli/convert_weights.py weights/train/epoch_100.npz out.pth
  python cli/convert_weights.py model.safetensors out.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hvi_cidnet_tpu.train.checkpoint import export_pth, load_any, save_checkpoint

p = argparse.ArgumentParser(description="convert weights between formats")
p.add_argument("src")
p.add_argument("dst")
args = p.parse_args()

params = load_any(args.src)
print(f"loaded {len(params)} tensors from {args.src}")
if args.dst.endswith(".npz"):
    save_checkpoint(args.dst, params)
elif args.dst.endswith(".pth"):
    export_pth(args.dst, params)
else:
    raise SystemExit("dst must end in .npz or .pth")
print(f"wrote {args.dst}")
