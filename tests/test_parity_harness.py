"""The released-weights parity harness must stay provably runnable.

No released weights exist in this environment, so cli/parity.py's value is
that the >=0.1 dB claim is one command away from proof the moment a user
supplies them (/root/reference/Readme.md:376-452).  This test runs its
--dry_run: synthetic torch .pth through the product converter -> evaluator ->
measure -> baseline diff, with the PSNR gate shown to pass on
self-consistent values and fail on a +1 dB perturbation.
"""

import pytest

pytestmark = pytest.mark.heavy


def test_parity_dry_run():
    from cli.parity import dry_run

    assert dry_run(0.1) == 0


def test_parity_case_table_matches_baseline_md():
    """Every expected tuple must appear verbatim in BASELINE.md — the case
    table is data copied from the baseline doc, and a typo here would
    mis-gate a real parity run."""
    from cli.parity import CASES

    with open("BASELINE.md") as f:
        text = f.read()
    for case in CASES:
        for psnr, ssim, lpips in case.expect.values():
            for v in (psnr, ssim, lpips):
                assert f"{v:.4f}" in text, (
                    f"{case.name}: {v:.4f} not found in BASELINE.md"
                )
