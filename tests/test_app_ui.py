"""The interactive UI's stdlib fallback transport (cli/app.py).

gradio isn't installed in this environment; the reference's app.py surface
(app.py:14-111 — weight picker, gamma/alpha_s/alpha_i, optional scoring)
must still be reachable, so cli/app.py serves a dependency-free http.server
page.  These tests drive it over a real socket: GET / returns the page with
every control, POST /enhance runs the model (random init) and returns the
enhanced PNG as base64 JSON.
"""

from __future__ import annotations

import base64
import importlib.util
import io
import json
import os
import sys
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_app():
    spec = importlib.util.spec_from_file_location("cli_app", os.path.join(REPO, "cli", "app.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def server():
    app = _load_app()
    srv = app.make_fallback_server("127.0.0.1", 0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_page_carries_every_reference_control(server):
    html = urllib.request.urlopen(f"{server}/", timeout=10).read().decode()
    for control in ("gamma", "alpha_s", "alpha_i", "weights", "score", "/enhance"):
        assert control in html
    # runnable without weight files; the label is HTML-escaped (an unescaped
    # "<random init>" parses as an unknown tag and renders blank)
    assert "&lt;random init&gt;" in html


def test_unknown_path_is_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"{server}/nope", timeout=10)
    assert e.value.code == 404


def test_bad_body_returns_json_error(server):
    req = urllib.request.Request(
        f"{server}/enhance?weights=%3Crandom%20init%3E", data=b"not an image", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 500
    assert "error" in json.loads(e.value.read().decode())


@pytest.mark.heavy
def test_enhance_roundtrip_runs_model(server):
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (16, 24, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    req = urllib.request.Request(
        f"{server}/enhance?weights=%3Crandom%20init%3E&gamma=1.0&alpha_s=1.0&alpha_i=1.0",
        data=buf.getvalue(),
        method="POST",
    )
    reply = json.loads(urllib.request.urlopen(req, timeout=600).read().decode())
    out = Image.open(io.BytesIO(base64.b64decode(reply["image"])))
    assert out.size == img.size  # padded inside, cropped back
    assert np.asarray(out).shape == (16, 24, 3)


def test_arbitrary_weights_path_rejected(server):
    """The weights query param is client-controlled; only entries the page
    itself offered may load (no arbitrary-path .pth deserialization)."""
    req = urllib.request.Request(
        f"{server}/enhance?weights=/tmp/attacker.pth", data=b"x", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    assert "unknown weights" in json.loads(e.value.read().decode())["error"]
