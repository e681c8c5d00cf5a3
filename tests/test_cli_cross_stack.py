"""CLI-level cross-stack parity gate (VERDICT round-1, missing #1 / next #5).

The reference's de-facto regression suite is "run eval.py + measure.py on a
released .pth and match the README table".  The released weights aren't in
this environment, so this gate synthesizes a base-CIDNet ``.pth`` with live
torch, runs

  * the reference's eval math (net/CIDNet.py forward, gates, gamma,
    ToPILImage truncation — eval.py:40-83) in-process, and
  * OUR ``cli/eval.py`` as a real subprocess (pth load -> gates -> PNG),

then asserts the two stacks' PNGs agree at machine parity (>=60 dB) and that
``cli/measure.py``'s scores against the same GT are identical to rounding.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.heavy

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return np.inf
    return 10.0 * np.log10(255.0**2 / mse)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory, torch_reference_path):
    import torch

    from net.CIDNet import CIDNet

    root = tmp_path_factory.mktemp("cross_stack")
    (root / "low").mkdir()
    (root / "gt").mkdir()

    rng = np.random.default_rng(7)
    for i in range(2):
        low = (rng.uniform(0, 0.35, (64, 48, 3)) * 255).astype(np.uint8)
        gt = np.clip(low.astype(np.float64) * 2.5 + rng.normal(0, 4, low.shape), 0, 255).astype(np.uint8)
        Image.fromarray(low).save(root / "low" / f"{i}.png")
        Image.fromarray(gt).save(root / "gt" / f"{i}.png")

    torch.manual_seed(0)
    model = CIDNet()
    torch.save(model.state_dict(), root / "model.pth")

    # --- reference-stack eval (eval.py:40-83 semantics, gated2 + alpha) ---
    model.eval()
    model.trans.gated2 = True
    model.trans.alpha = 1.0
    (root / "ref_out").mkdir()
    with torch.no_grad():
        for i in range(2):
            img = np.asarray(Image.open(root / "low" / f"{i}.png"), np.float32) / 255.0
            t = torch.from_numpy(img.transpose(2, 0, 1))[None]
            out = torch.clamp(model(t), 0, 1)[0].numpy().transpose(1, 2, 0)
            # torchvision ToPILImage: mul(255).byte() truncation (eval.py:74)
            Image.fromarray((out * 255).astype(np.uint8)).save(root / "ref_out" / f"{i}.png")
    return root


def test_cli_eval_matches_reference_stack(workdir):
    """Our eval CLI must reproduce the torch stack's PNGs at machine parity."""
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"  # effective once the axon backend is not registered
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "cli", "eval.py"),
            "--unpaired", "--custome", "--custome_path", str(workdir / "low"),
            "--weights", str(workdir / "model.pth"),
            "--variant", "base", "--alpha", "1.0",
        ],
        cwd=workdir, capture_output=True, text=True, env=env, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    for i in range(2):
        ours = np.asarray(Image.open(workdir / "output" / "custome" / f"{i}.png"))
        ref = np.asarray(Image.open(workdir / "ref_out" / f"{i}.png"))
        p = _psnr(ours, ref)
        assert p >= 60.0, f"image {i}: cross-stack PSNR {p:.2f} dB < 60"


def test_cli_measure_scores_match_across_stacks(workdir):
    """measure.py's PSNR/SSIM of both stacks' outputs vs GT must agree."""
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"  # effective once the axon backend is not registered
    scores = {}
    for tag, im_dir in [("ours", workdir / "output" / "custome"), ("ref", workdir / "ref_out")]:
        r = subprocess.run(
            [
                sys.executable, os.path.join(REPO, "cli", "measure.py"),
                "--im_dir", str(im_dir / "*.png"), "--label_dir", str(workdir / "gt"),
            ],
            cwd=workdir, capture_output=True, text=True, env=env, timeout=600,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        vals = {}
        for line in r.stdout.splitlines():
            if "Avg.PSNR" in line:
                vals["psnr"] = float(line.split(":")[1].replace("dB", ""))
            if "Avg.SSIM" in line:
                vals["ssim"] = float(line.split(":")[1])
        scores[tag] = vals
    assert scores["ours"]["psnr"] == pytest.approx(scores["ref"]["psnr"], abs=0.05)
    assert scores["ours"]["ssim"] == pytest.approx(scores["ref"]["ssim"], abs=1e-3)
