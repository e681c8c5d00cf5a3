"""Unpaired NIQE/BRISQUE harness end-to-end on synthetic files."""

import numpy as np
import pytest
from PIL import Image

from hvi_cidnet_tpu.eval.measure import unpaired_metrics
from hvi_cidnet_tpu.metrics.brisque import brisque_features


def _smooth_img(hw=(192, 192), seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (hw[0] // 8, hw[1] // 8, 3))
    return cv2.resize(base, hw[::-1], interpolation=cv2.INTER_CUBIC).clip(0, 255).astype(np.uint8)


def test_unpaired_metrics_niqe_and_graceful_brisque(tmp_path):
    for i in range(2):
        Image.fromarray(_smooth_img(seed=i)).save(tmp_path / f"{i}.jpg")
    niqe, bris = unpaired_metrics(str(tmp_path / "*.jpg"), verbose=False)
    assert np.isfinite(niqe) and niqe > 0
    assert np.isnan(bris)  # no SVR model file available offline


def test_unpaired_metrics_empty_glob(tmp_path):
    niqe, bris = unpaired_metrics(str(tmp_path / "*.png"), verbose=False)
    assert np.isnan(niqe) and np.isnan(bris)


def test_brisque_features_shape_and_finiteness():
    feats = brisque_features(_smooth_img(seed=3))
    assert feats.shape == (36,)
    assert np.isfinite(feats).all()
