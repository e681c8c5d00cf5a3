"""BRISQUE — Blind/Referenceless Image Spatial Quality Evaluator.

The reference scores BRISQUE through the ``imquality`` package
(measure_niqe_bris.py:4,26), which bundles the LIVE-trained libsvm SVR model.
That package (and any network download) is unavailable here, so this module
implements the full metric natively:

* feature extraction (36-dim: GGD fit of the MSCN field + AGGD fits of the 4
  adjacent-coefficient products, at 2 scales) in numpy;
* a libsvm epsilon-SVR *reader + predictor* (RBF kernel) so the official
  trained model file — e.g. imquality's ``brisque_svm.txt`` or the LIVE
  release's ``allmodel`` — can be dropped in via ``model_path`` or the
  ``BRISQUE_MODEL`` env var for score parity with the reference.

Without a model file, ``score`` raises a clear error; the eval harness skips
BRISQUE and says why.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
from scipy.special import gamma as _gamma_fn

from hvi_cidnet_tpu.metrics.niqe import estimate_aggd, imresize_matlab


def _ggd_fit(v: np.ndarray) -> Tuple[float, float]:
    """Fit a (symmetric) GGD via the moment-ratio table method."""
    gam = np.arange(0.2, 10.001, 0.001)
    r_gam = (_gamma_fn(1.0 / gam) * _gamma_fn(3.0 / gam)) / np.square(_gamma_fn(2.0 / gam))
    sigma_sq = np.mean(v**2)
    e = np.mean(np.abs(v))
    rho = sigma_sq / (e**2 + 1e-12)
    pos = int(np.argmin(np.abs(r_gam - rho)))
    return float(gam[pos]), float(sigma_sq)


def _mscn(y: np.ndarray) -> np.ndarray:
    import cv2

    mu = cv2.GaussianBlur(y, (7, 7), 7 / 6.0, borderType=cv2.BORDER_REPLICATE)
    sigma = cv2.GaussianBlur(y * y, (7, 7), 7 / 6.0, borderType=cv2.BORDER_REPLICATE) - mu * mu
    sigma = np.sqrt(np.abs(sigma))
    return (y - mu) / (sigma + 1.0)


def brisque_features(img: np.ndarray) -> np.ndarray:
    """36-dim BRISQUE feature vector of an HWC/HW [0,255] image."""
    import cv2

    x = np.asarray(img, np.float64)
    if x.ndim == 3:
        x = cv2.cvtColor(x.astype(np.float32), cv2.COLOR_RGB2GRAY).astype(np.float64)
    feats: List[float] = []
    for scale in range(2):
        mscn = _mscn(x)
        alpha, sigma_sq = _ggd_fit(mscn.reshape(-1))
        feats.extend([alpha, sigma_sq])
        for shift in ([0, 1], [1, 0], [1, 1], [1, -1]):
            prod = mscn * np.roll(mscn, shift, axis=(0, 1))
            a, bl, br = estimate_aggd(prod)
            mean = (br - bl) * (_gamma_fn(2 / a) / _gamma_fn(1 / a))
            feats.extend([a, mean, bl, br])
        if scale == 0:
            x = imresize_matlab(x / 255.0, 0.5) * 255.0
    return np.asarray(feats)


class LibSVMModel:
    """Minimal libsvm epsilon-SVR model reader + RBF predictor."""

    def __init__(self, path: str):
        self.gamma = 0.05
        self.rho = 0.0
        self.sv_coef: List[float] = []
        self.svs: List[Dict[int, float]] = []
        self.scale_lo: Optional[np.ndarray] = None
        self.scale_hi: Optional[np.ndarray] = None
        self._parse(path)

    def _parse(self, path: str) -> None:
        in_sv = False
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                if in_sv:
                    parts = line.split()
                    self.sv_coef.append(float(parts[0]))
                    self.svs.append(
                        {int(k): float(v) for k, v in (p.split(":") for p in parts[1:])}
                    )
                elif line.startswith("gamma"):
                    self.gamma = float(line.split()[1])
                elif line.startswith("rho"):
                    self.rho = float(line.split()[1])
                elif line == "SV":
                    in_sv = True

    def predict(self, x: np.ndarray) -> float:
        n = x.shape[0]
        total = -self.rho
        for coef, sv in zip(self.sv_coef, self.svs):
            v = np.zeros(n)
            for k, val in sv.items():
                if k - 1 < n:
                    v[k - 1] = val
            d = x - v
            total += coef * np.exp(-self.gamma * np.dot(d, d))
        return float(total)


def _default_model_path() -> Optional[str]:
    p = os.environ.get("BRISQUE_MODEL")
    if p and os.path.exists(p):
        return p
    local = os.path.join(os.path.dirname(__file__), "data", "brisque_svm.txt")
    return local if os.path.exists(local) else None


def score(img: np.ndarray, model_path: Optional[str] = None) -> float:
    """BRISQUE score (lower is better).  Needs the trained SVR model file."""
    path = model_path or _default_model_path()
    if path is None:
        raise FileNotFoundError(
            "BRISQUE needs the LIVE-trained libsvm model (imquality's "
            "brisque_svm.txt); set BRISQUE_MODEL or pass model_path. "
            "This environment has no network to fetch it."
        )
    feats = brisque_features(img)
    model = LibSVMModel(path)
    if model.scale_lo is not None:
        feats = (feats - model.scale_lo) / (model.scale_hi - model.scale_lo)
    return model.predict(feats)
