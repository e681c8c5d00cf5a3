#!/usr/bin/env python
"""HF-hub single-image inference — twin of ``eval_hf.py``.

Downloads ``config.json`` + ``model.safetensors`` from a HF repo id (when the
network allows; offline, pass a local ``--local_file``), loads non-strict,
and runs the same pad/gamma path, saving to ``./output_hf``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
from PIL import Image

from hvi_cidnet_tpu.compat.torch_ckpt import filtered_update, load_safetensors
from hvi_cidnet_tpu.eval.evaluator import Evaluator
from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, HVIGates, init_cidnet

p = argparse.ArgumentParser(description="EvalHF")
p.add_argument("--path", type=str, default="Fediory/HVI-CIDNet-LOLv1-wperc",
               help="HF repo id with model.safetensors")
p.add_argument("--local_file", type=str, default=None,
               help="local safetensors file (skips the hub download)")
p.add_argument("--input_img", type=str, required=True)
p.add_argument("--alpha_s", type=float, default=1.0)
p.add_argument("--alpha_i", type=float, default=1.0)
p.add_argument("--gamma", type=float, default=1.0)
el = p.parse_args()

if el.local_file:
    model_file = el.local_file
else:
    from huggingface_hub import hf_hub_download

    hf_hub_download(repo_id=el.path, filename="config.json", repo_type="model")
    model_file = hf_hub_download(repo_id=el.path, filename="model.safetensors", repo_type="model")

cfg = CIDNetConfig(variant="base")  # HF weights target the base graph (eval_hf.py:1)
params = init_cidnet(jax.random.PRNGKey(0), cfg)
params = filtered_update(params, load_safetensors(model_file), strict=False)

gates = HVIGates(gated=False, gated2=False, alpha=el.alpha_i, alpha_s=el.alpha_s)
ev = Evaluator(params, cfg, gates, gamma=el.gamma)

img = np.asarray(Image.open(el.input_img).convert("RGB"), np.float32) / 255.0
out = ev.enhance(img)
os.makedirs("./output_hf", exist_ok=True)
name = os.path.basename(el.input_img)
Image.fromarray((np.clip(out, 0, 1) * 255 + 0.5).astype(np.uint8)).save(f"./output_hf/{name}")
print(f"saved ./output_hf/{name}")
