#!/usr/bin/env python
"""Gradio UI — twin of the reference ``app.py``.

Weight-file picker scanning ``weights/`` (excluding ``train/``), sliders for
gamma / alpha_s / alpha_i, optional NIQE(+BRISQUE) scoring of the output,
port 7862 (app.py:69-111).  Gradio isn't installed in this environment; the
CLI degrades to a clear message instead of crashing.
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

try:
    import gradio as gr
except ImportError:
    print("gradio is not installed in this environment; the UI cannot start.\n"
          "Use cli/demo.py for single-image enhancement with the same knobs.")
    sys.exit(1)

from PIL import Image

from hvi_cidnet_tpu.eval.evaluator import Evaluator
from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, HVIGates
from hvi_cidnet_tpu.utils.compile_cache import enable_compilation_cache

# long-lived UI process: honor $HVI_COMPILE_CACHE so weight switches that
# retrace don't pay repeat compiles across restarts
enable_compilation_cache()


def find_weights():
    files = [f for f in glob.glob("weights/**/*.*", recursive=True)
             if f.endswith((".pth", ".npz", ".safetensors")) and os.sep + "train" + os.sep not in f]
    return sorted(files) or ["<none found>"]


_cache = {}


def process_image(img, score, model_path, gamma, alpha_s, alpha_i):
    if img is None:
        return None, "no image"
    key = (model_path, gamma, alpha_s, alpha_i)
    if key not in _cache:
        _cache.clear()
        gates = HVIGates(gated=True, gated2=True, alpha=alpha_i, alpha_s=alpha_s)
        _cache[key] = Evaluator(model_path, CIDNetConfig(variant="base"), gates, gamma=gamma)
    ev = _cache[key]
    arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
    out = np.clip(ev.enhance(arr), 0, 1)
    out_img = Image.fromarray((out * 255).astype(np.uint8))
    info = ""
    if score:
        from hvi_cidnet_tpu.metrics.niqe import calculate_niqe

        info = f"NIQE: {calculate_niqe(np.asarray(out_img)):.4f}"
        try:
            from hvi_cidnet_tpu.metrics.brisque import score as b_score

            info += f"  BRISQUE: {b_score(np.asarray(out_img)):.4f}"
        except FileNotFoundError:
            info += "  (BRISQUE: model file unavailable)"
    return out_img, info


interface = gr.Interface(
    fn=process_image,
    inputs=[
        gr.Image(type="pil", label="input"),
        gr.Checkbox(label="score output (NIQE/BRISQUE)"),
        gr.Dropdown(choices=find_weights(), value=find_weights()[0], label="weights"),
        gr.Slider(0.1, 5.0, value=1.0, label="gamma"),
        gr.Slider(0.0, 2.0, value=1.0, label="alpha_s"),
        gr.Slider(0.1, 2.0, value=1.0, label="alpha_i"),
    ],
    outputs=[gr.Image(type="pil", label="enhanced"), gr.Textbox(label="score")],
    title="HVI-CIDNet (TPU)",
)

if __name__ == "__main__":
    interface.launch(server_port=7862)
