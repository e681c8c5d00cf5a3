"""Native (OpenCV quality module) BRISQUE backend.

The reference's BRISQUE comes from imquality's bundled LIVE-trained SVR
(measure_niqe_bris.py:4,26).  Our native arm binds the system OpenCV 4.6
quality library (first-party C++ shim, hvi_cidnet_tpu/native/brisque_shim.cpp)
with its LIVE-R2-trained model.  All tests here gate on availability so the
suite stays green on machines without the system library.
"""

import numpy as np
import pytest

from hvi_cidnet_tpu.metrics import brisque_cv

pytestmark = pytest.mark.heavy

needs_native = pytest.mark.skipif(
    not brisque_cv.available(), reason="system OpenCV quality module absent"
)


def _natural_img(hw=(256, 256), seed=0):
    """Smooth multi-scale image — closer to natural statistics than white noise."""
    import cv2

    rng = np.random.default_rng(seed)
    img = np.zeros((*hw, 3))
    for cell in (8, 32):
        base = rng.uniform(0, 255, (hw[0] // cell, hw[1] // cell, 3))
        img += cv2.resize(base, hw[::-1], interpolation=cv2.INTER_CUBIC)
    return (img / 2).clip(0, 255).astype(np.uint8)


@needs_native
def test_score_finite_and_plausible():
    s = brisque_cv.score(_natural_img(seed=1))
    assert np.isfinite(s)
    assert -50 < s < 200  # OpenCV LIVE model's practical output range


def _pink_img(hw=(256, 256), seed=7):
    """1/f ("pink") noise image — natural-image-like power spectrum, which is
    what the LIVE model calls pristine; the smooth cubic-resize fixture above
    reads as *blur distortion* to BRISQUE and scores worse than noise."""
    rng = np.random.default_rng(seed)
    h, w = hw
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    f = np.sqrt(fy**2 + fx**2)
    f[0, 0] = 1.0
    chans = []
    for _ in range(3):
        spec = (rng.normal(size=hw) + 1j * rng.normal(size=hw)) / f
        x = np.fft.ifft2(spec).real
        chans.append((x - x.min()) / (x.max() - x.min()))
    return (np.stack(chans, -1) * 255).astype(np.uint8)


@needs_native
def test_noise_scores_worse_than_pristine():
    """BRISQUE is a distortion score: heavy white noise on a natural-spectrum
    image must score higher (worse) than the image itself."""
    clean = _pink_img(seed=7)
    rng = np.random.default_rng(3)
    noisy = np.clip(
        clean.astype(np.int16) + rng.normal(0, 50, clean.shape), 0, 255
    ).astype(np.uint8)
    assert brisque_cv.score(noisy) > brisque_cv.score(clean)


@needs_native
def test_features_match_python_arm():
    """The pure-python extractor (metrics/brisque.py) against the OpenCV
    oracle: same 36 features up to grayscale/AGGD convention differences."""
    from hvi_cidnet_tpu.metrics.brisque import brisque_features

    img = _natural_img(seed=4)
    f_cv = brisque_cv.features(img)
    f_py = brisque_features(img)
    assert f_cv.shape == f_py.shape == (36,)
    np.testing.assert_allclose(f_cv, f_py, atol=0.15)


@needs_native
def test_score_dispatch_prefers_libsvm_then_native(tmp_path, monkeypatch):
    """brisque.score falls back to the native backend only when no libsvm
    model file is supplied."""
    from hvi_cidnet_tpu.metrics import brisque as B

    monkeypatch.delenv("BRISQUE_MODEL", raising=False)
    img = _natural_img(seed=5)
    native = brisque_cv.score(img)
    assert B.score(img) == pytest.approx(native)


@needs_native
def test_float01_input_equivalent_to_u8():
    img = _natural_img(seed=6)
    s_u8 = brisque_cv.score(img)
    s_f = brisque_cv.score(img.astype(np.float64) / 255.0)
    assert s_f == pytest.approx(s_u8, abs=1e-6)
