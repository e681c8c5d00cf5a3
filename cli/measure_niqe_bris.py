#!/usr/bin/env python
"""Unpaired NIQE/BRISQUE CLI — twin of ``measure_niqe_bris.py``."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hvi_cidnet_tpu.eval.measure import unpaired_metrics

p = argparse.ArgumentParser(description="Eval")
for d in ("DICM", "LIME", "MEF", "NPE", "VV"):
    p.add_argument(f"--{d}", action="store_true")
p.add_argument("--im_dir", type=str, default=None)
p.add_argument("--brisque_model", type=str, default=None)
ep = p.parse_args()

# per-dataset extensions as the reference globs them (measure_niqe_bris.py:42-55)
ROUTES = {
    "DICM": "./output/DICM/*.jpg",
    "LIME": "./output/LIME/*.bmp",
    "MEF": "./output/MEF/*.png",
    "NPE": "./output/NPE/*.jpg",
    "VV": "./output/VV/*.jpg",
}

im_dir = ep.im_dir
for name, glob_pat in ROUTES.items():
    if getattr(ep, name):
        im_dir = glob_pat
if im_dir is None:
    raise SystemExit("choose --DICM/--LIME/--MEF/--NPE/--VV or pass --im_dir")

avg_niqe, avg_brisque = unpaired_metrics(im_dir, brisque_model=ep.brisque_model)
print(avg_niqe)
print(avg_brisque)
