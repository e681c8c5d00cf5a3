"""End-to-end LEARNING check: the assembled trainer must actually learn.

Everything else verifies training by parts (loss-term torch parity,
loss-decreases smoke, schedule/checkpoint exactness).  This drives the real
production pieces — ``make_train_step`` + ``composite_loss`` + Adam — on a
real low-light inversion task built from the repo's reference image
(experiments/train_convergence_r4.py is the long-form run: +15 dB over
identity by step 75 on CPU) and asserts a large held-out PSNR gain in a
CI-sized number of steps.
"""

import subprocess
import sys
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.heavy
def test_trainer_learns_low_light_inversion():
    proc = subprocess.run(
        [
            sys.executable, "-u", os.path.join(REPO, "experiments", "train_convergence_r4.py"),
            "--cpu", "--steps", "40", "--report_every", "20", "--min_gain_db", "5",
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PASS" in proc.stdout
