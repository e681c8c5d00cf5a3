"""LR schedule parity vs the reference torch scheduler chain."""

import numpy as np
import pytest

from hvi_cidnet_tpu.train.schedule import build_reference_schedule, cosine_restart, gradual_warmup


def _torch_lrs(make_scheduler, n_epochs):
    """Collect the lr used during each epoch from a torch scheduler."""
    import torch

    param = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([param], lr=1e-4)
    sched = make_scheduler(opt)
    lrs = []
    for _ in range(n_epochs):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.array(lrs)


def test_warmup_cosine_parity(torch_reference_path):
    from data.scheduler import CosineAnnealingRestartLR, GradualWarmupScheduler

    n_epochs, warmup = 40, 3

    def make(opt):
        after = CosineAnnealingRestartLR(opt, periods=[n_epochs - warmup], restart_weights=[1], eta_min=1e-7)
        return GradualWarmupScheduler(opt, multiplier=1, total_epoch=warmup, after_scheduler=after)

    expected = _torch_lrs(make, n_epochs)
    sched = build_reference_schedule(1e-4, n_epochs, warmup_epochs=warmup)
    got = np.array([sched(e) for e in range(n_epochs)])
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-12)


def test_cyclic_cosine_parity(torch_reference_path):
    from data.scheduler import CosineAnnealingRestartCyclicLR

    n_epochs = 40

    def make(opt):
        return CosineAnnealingRestartCyclicLR(
            opt, periods=[n_epochs // 4, (n_epochs * 3) // 4], restart_weights=[1, 1], eta_mins=[0.0002, 0.0000001]
        )

    expected = _torch_lrs(make, n_epochs)
    sched = build_reference_schedule(
        1e-4, n_epochs, start_warmup=False, cos_restart=False, cos_restart_cyclic=True
    )
    got = np.array([sched(e) for e in range(n_epochs)])
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-12)


def test_warmup_starts_at_zero_and_reaches_base():
    sched = gradual_warmup(1e-4, 3, cosine_restart(1e-4, [10], [1], [1e-7]))
    assert sched(0) == 0.0
    assert abs(sched(3) - 1e-4) < 1e-12
