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
from hvi_cidnet_tpu.utils.hf_config import config_from_hf_json

p = argparse.ArgumentParser(description="EvalHF")
p.add_argument("--path", type=str, default="Fediory/HVI-CIDNet-LOLv1-wperc",
               help="HF repo id with model.safetensors")
p.add_argument("--local_file", type=str, default=None,
               help="local safetensors file (skips the hub download)")
p.add_argument("--config_json", type=str, default=None,
               help="local config.json (with --local_file); hub downloads use "
                    "the repo's config.json automatically")
p.add_argument("--input_img", type=str, required=True)
p.add_argument("--alpha_s", type=float, default=1.0)
p.add_argument("--alpha_i", type=float, default=1.0)
p.add_argument("--gamma", type=float, default=1.0)
from hvi_cidnet_tpu.utils.compile_cache import add_compile_cache_flag, enable_compilation_cache  # noqa: E402

add_compile_cache_flag(p)
el = p.parse_args()
enable_compilation_cache(el.compile_cache)

config_file = el.config_json
if el.local_file:
    model_file = el.local_file
else:
    from huggingface_hub import hf_hub_download

    config_file = hf_hub_download(repo_id=el.path, filename="config.json", repo_type="model")
    model_file = hf_hub_download(repo_id=el.path, filename="model.safetensors", repo_type="model")

# The reference model is a PyTorchModelHubMixin (net/CIDNet.py:6-8):
# from_pretrained instantiates CIDNet(**config.json) — a hub model with
# non-default channels/heads must shape the graph before weights load.
cfg = config_from_hf_json(config_file)
params = init_cidnet(jax.random.PRNGKey(0), cfg)
params = filtered_update(params, load_safetensors(model_file), strict=False)

gates = HVIGates(gated=False, gated2=False, alpha=el.alpha_i, alpha_s=el.alpha_s)
ev = Evaluator(params, cfg, gates, gamma=el.gamma)

img = np.asarray(Image.open(el.input_img).convert("RGB"), np.float32) / 255.0
out = ev.enhance(img)
os.makedirs("./output_hf", exist_ok=True)
name = os.path.basename(el.input_img)
Image.fromarray((np.clip(out, 0, 1) * 255).astype(np.uint8)).save(f"./output_hf/{name}")
print(f"saved ./output_hf/{name}")
