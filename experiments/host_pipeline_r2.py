"""Host input-pipeline attribution (VERDICT round-1 weak #4 / next #7).

No LOL data ships in this environment, so a disk-backed PNG dataset is
fabricated (600x400, the real LOL-v1 geometry), then:

  1. loader-only sustained batches/s (decode+crop+flip+stack, persistent
     thread pool),
  2. device-only steps/s (one fixed device-resident batch re-fed),
  3. end-to-end steps/s through the loader.

Host-bound fraction = 1 - (end_to_end / device_only).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from hvi_cidnet_tpu.data.datasets import PairedFolderDataset
from hvi_cidnet_tpu.data.pipeline import TrainLoader
from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, init_cidnet
from hvi_cidnet_tpu.train.trainer import TrainConfig, make_optimizer, make_train_step

ROOT = "/tmp/hostpipe_ds"


def fabricate(n=256):
    lo, hi = os.path.join(ROOT, "low"), os.path.join(ROOT, "high")
    if os.path.isdir(lo) and len(os.listdir(lo)) >= n:
        return lo, hi
    os.makedirs(lo, exist_ok=True)
    os.makedirs(hi, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        img = (rng.uniform(0, 255, (400, 600, 3))).astype(np.uint8)
        Image.fromarray((img * 0.2).astype(np.uint8)).save(f"{lo}/{i:03d}.png")
        Image.fromarray(img).save(f"{hi}/{i:03d}.png")
    return lo, hi


def main():
    lo, hi = fabricate()
    crop = int(os.environ.get("CROP", "256"))
    for batch in (16,):  # 128@crop256 OOMs the training step (28.4G HBM)
        ds = PairedFolderDataset(lo, hi, crop_size=crop)
        loader = TrainLoader(ds, batch, seed=0, num_threads=16)

        # 1. loader-only
        t0, n = time.perf_counter(), 0
        for lows, highs in loader.epoch():
            np.asarray(lows)[0, 0, 0]  # force
            n += 1
            if n >= 8:
                break
        dt_host = (time.perf_counter() - t0) / n
        print(f"b{batch}: loader-only {1/dt_host:6.2f} batches/s ({dt_host*1e3:.1f} ms/batch)")

        # 2+3: device step with and without the loader
        cfg = TrainConfig(model=CIDNetConfig(), use_perceptual=False)
        params = init_cidnet(jax.random.PRNGKey(0), cfg.model)
        opt = make_optimizer(cfg)
        opt_state = opt.init(params)
        step = make_train_step(cfg, opt)
        lr = jnp.asarray(2e-4)

        fixed = (jnp.asarray(np.random.default_rng(1).uniform(0, 0.3, (batch, crop, crop, 3)), jnp.float32),
                 jnp.asarray(np.random.default_rng(2).uniform(0, 1, (batch, crop, crop, 3)), jnp.float32))
        params, opt_state, loss, _ = step(params, opt_state, *fixed, lr, None)  # compile
        float(loss)
        t0 = time.perf_counter()
        for _ in range(8):
            params, opt_state, loss, _ = step(params, opt_state, *fixed, lr, None)
        float(loss)
        dt_dev = (time.perf_counter() - t0) / 8
        print(f"b{batch}: device-only  {batch/dt_dev:6.1f} img/s ({dt_dev*1e3:.1f} ms/step)")

        t0, n = time.perf_counter(), 0
        for lows, highs in loader.epoch():
            params, opt_state, loss, _ = step(params, opt_state,
                                              jnp.asarray(lows, jnp.float32),
                                              jnp.asarray(highs, jnp.float32), lr, None)
            n += 1
            if n >= 8:
                break
        float(loss)
        dt_e2e = (time.perf_counter() - t0) / n
        frac = max(0.0, 1 - dt_dev / dt_e2e)
        print(f"b{batch}: end-to-end   {batch/dt_e2e:6.1f} img/s ({dt_e2e*1e3:.1f} ms/step) "
              f"-> host-bound fraction {100*frac:.1f}%")
        loader.close()


if __name__ == "__main__":
    main()
