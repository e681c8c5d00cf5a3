#!/usr/bin/env python
"""Interactive UI — twin of the reference ``app.py``.

Reference surface (app.py:14-111): weight-file picker scanning ``weights/``
(excluding ``train/``), sliders for gamma / alpha_s / alpha_i, optional
NIQE(+BRISQUE) scoring of the output, port 7862.

Two transports for the same core:
  * **gradio**, when installed — same widget set as the reference;
  * a **dependency-free stdlib http.server fallback** otherwise (this
    environment has no gradio), serving one HTML page with the identical
    controls; the browser POSTs the raw image bytes to ``/enhance`` and
    renders the base64 PNG reply.  ``--random_init`` (or picking the
    "<random init>" weights entry) runs without any weight file, mirroring
    ``cli/demo.py``.
"""

from __future__ import annotations

import argparse
import base64
import glob
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from hvi_cidnet_tpu.eval.evaluator import Evaluator
from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, HVIGates, init_cidnet
from hvi_cidnet_tpu.utils.compile_cache import enable_compilation_cache

RANDOM_INIT = "<random init>"


def find_weights():
    files = [f for f in glob.glob("weights/**/*.*", recursive=True)
             if f.endswith((".pth", ".npz", ".safetensors")) and os.sep + "train" + os.sep not in f]
    return sorted(files) + [RANDOM_INIT]


_cache = {}
_cache_lock = __import__("threading").Lock()


def _evaluator(model_path, gamma, alpha_s, alpha_i) -> Evaluator:
    # serialized: requests run on ThreadingHTTPServer worker threads, and the
    # clear-then-insert policy (keep one compiled Evaluator) would otherwise
    # let one thread clear another's entry between insert and read
    with _cache_lock:
        key = (model_path, gamma, alpha_s, alpha_i)
        if key not in _cache:
            _cache.clear()
            cfg = CIDNetConfig(variant="base")
            gates = HVIGates(gated=True, gated2=True, alpha=alpha_i, alpha_s=alpha_s)
            if model_path == RANDOM_INIT:
                import jax

                weights = init_cidnet(jax.random.PRNGKey(0), cfg)
            else:
                weights = model_path
            _cache[key] = Evaluator(weights, cfg, gates, gamma=gamma)
        return _cache[key]


def process_image(img, score, model_path, gamma, alpha_s, alpha_i):
    """Shared core for both transports: PIL in, (PIL, info string) out."""
    if img is None:
        return None, "no image"
    ev = _evaluator(model_path, gamma, alpha_s, alpha_i)
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


# ---------------------------------------------------------------------------
# stdlib fallback transport
# ---------------------------------------------------------------------------

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>HVI-CIDNet (TPU)</title>
<style>
 body{font-family:sans-serif;max-width:900px;margin:2em auto;color:#222}
 .row{display:flex;gap:1em;align-items:center;margin:.4em 0}
 img{max-width:430px;border:1px solid #ccc}
 label{min-width:6em;display:inline-block}
 #status{color:#666}
</style></head><body>
<h2>HVI-CIDNet (TPU)</h2>
<div class="row"><label>image</label><input type="file" id="file" accept="image/*"></div>
<div class="row"><label>weights</label><select id="weights">__OPTIONS__</select></div>
<div class="row"><label>gamma</label><input type="range" id="gamma" min="0.1" max="5" step="0.05" value="1.0"
  oninput="gv.textContent=this.value"><span id="gv">1.0</span></div>
<div class="row"><label>alpha_s</label><input type="range" id="alpha_s" min="0" max="2" step="0.05" value="1.0"
  oninput="sv.textContent=this.value"><span id="sv">1.0</span></div>
<div class="row"><label>alpha_i</label><input type="range" id="alpha_i" min="0.1" max="2" step="0.05" value="1.0"
  oninput="iv.textContent=this.value"><span id="iv">1.0</span></div>
<div class="row"><label>score</label><input type="checkbox" id="score"> NIQE/BRISQUE of the output</div>
<div class="row"><button onclick="run()">enhance</button><span id="status"></span></div>
<div class="row"><img id="inimg"><img id="outimg"></div>
<div class="row"><span id="info"></span></div>
<script>
async function run(){
  const f = document.getElementById('file').files[0];
  if(!f){ status.textContent = 'pick an image first'; return; }
  inimg.src = URL.createObjectURL(f);
  status.textContent = 'enhancing… (first run compiles)';
  const q = new URLSearchParams({
    gamma: gamma.value, alpha_s: alpha_s.value, alpha_i: alpha_i.value,
    weights: weights.value, score: score.checked ? '1' : '0'});
  try{
    const r = await fetch('/enhance?' + q, {method:'POST', body: f});
    const j = await r.json();
    if(j.error){ status.textContent = 'error: ' + j.error; return; }
    outimg.src = 'data:image/png;base64,' + j.image;
    info.textContent = j.info;
    status.textContent = 'done';
  }catch(e){ status.textContent = 'request failed: ' + e; }
}
</script></body></html>
"""


def make_fallback_server(host: str = "127.0.0.1", port: int = 7862):
    """ThreadingHTTPServer implementing GET / and POST /enhance.

    Returned unstarted so tests can bind port 0 and drive it from a thread.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet; stdout is the CLI's
            pass

        def _send(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path != "/":
                self._send(404, b"not found", "text/plain")
                return
            import html as _html

            opts = "".join(
                f'<option value="{_html.escape(w, quote=True)}">{_html.escape(w)}</option>'
                for w in find_weights()
            )
            self._send(200, _PAGE.replace("__OPTIONS__", opts).encode(), "text/html")

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/enhance":
                self._send(404, b"not found", "text/plain")
                return
            try:
                q = parse_qs(url.query)
                # the weights param is client-controlled: only entries the
                # page itself offered are honored (no arbitrary-path loads)
                weights = q.get("weights", [RANDOM_INIT])[0]
                if weights not in find_weights():
                    self._send(
                        400,
                        json.dumps({"error": "unknown weights entry"}).encode(),
                        "application/json",
                    )
                    return
                length = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(length)
                img = Image.open(io.BytesIO(raw))
                out_img, info = process_image(
                    img,
                    q.get("score", ["0"])[0] == "1",
                    weights,
                    float(q.get("gamma", ["1.0"])[0]),
                    float(q.get("alpha_s", ["1.0"])[0]),
                    float(q.get("alpha_i", ["1.0"])[0]),
                )
                buf = io.BytesIO()
                out_img.save(buf, format="PNG")
                body = json.dumps(
                    {"image": base64.b64encode(buf.getvalue()).decode(), "info": info}
                ).encode()
                self._send(200, body, "application/json")
            except Exception as e:  # surface the failure to the page
                self._send(500, json.dumps({"error": str(e)}).encode(), "application/json")

    return ThreadingHTTPServer((host, port), Handler)


def main() -> None:
    ap = argparse.ArgumentParser(description="HVI-CIDNet interactive UI")
    ap.add_argument("--port", type=int, default=7862)  # app.py:111
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--cpu", action="store_true", help="run on CPU instead of TPU")
    ap.add_argument("--no_gradio", action="store_true",
                    help="force the stdlib fallback UI even if gradio is installed")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    # long-lived UI process: honor $HVI_COMPILE_CACHE so weight switches that
    # retrace don't pay repeat compiles across restarts
    enable_compilation_cache()

    gr = None
    if not args.no_gradio:
        try:
            import gradio as gr
        except ImportError:
            print("gradio is not installed; serving the stdlib fallback UI instead.")
    if gr is not None:
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
        interface.launch(server_name=args.host, server_port=args.port)
        return
    server = make_fallback_server(args.host, args.port)
    print(f"serving http://{args.host}:{server.server_address[1]} (ctrl-c to stop)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
