#!/usr/bin/env python
"""Weight converter: torch .pth / safetensors <-> native .npz, plus an
HF-folder export (``save_pretrained`` analog of net/CIDNet.py:6-8's mixin).

Examples:
  python cli/convert_weights.py weights/LOLv1/w_perc.pth out.npz
  python cli/convert_weights.py weights/train/epoch_100.npz out.pth
  python cli/convert_weights.py model.safetensors out.npz
  python cli/convert_weights.py out.npz hub_dir/ --hf   # model.safetensors + config.json
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hvi_cidnet_tpu.train.checkpoint import export_pth, load_any, save_checkpoint, save_pretrained

p = argparse.ArgumentParser(description="convert weights between formats")
p.add_argument("src")
p.add_argument("dst")
p.add_argument("--hf", action="store_true", help="write dst as an HF folder (model.safetensors + config.json)")
p.add_argument("--channels", type=int, nargs=4, default=(36, 36, 72, 144), help="config.json channels (HF export)")
p.add_argument("--heads", type=int, nargs=4, default=(1, 2, 4, 8), help="config.json heads (HF export)")
p.add_argument("--variant", choices=("base", "mssa", "tnsm"), default="base", help="model variant recorded in config.json (HF export)")
args = p.parse_args()

params = load_any(args.src)
print(f"loaded {len(params)} tensors from {args.src}")
if args.hf:
    from hvi_cidnet_tpu.models.cidnet import CIDNetConfig

    cfg = CIDNetConfig(variant=args.variant, channels=tuple(args.channels), heads=tuple(args.heads))
    save_pretrained(args.dst, params, cfg)
elif args.dst.endswith(".npz"):
    save_checkpoint(args.dst, params)
elif args.dst.endswith(".pth"):
    export_pth(args.dst, params)
else:
    raise SystemExit("dst must end in .npz or .pth (or pass --hf for a folder)")
print(f"wrote {args.dst}")
