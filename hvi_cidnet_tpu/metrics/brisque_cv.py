"""Native BRISQUE backend over the system OpenCV quality module.

The reference scores BRISQUE via ``imquality.brisque.score``
(measure_niqe_bris.py:4,26), which bundles the LIVE-trained SVR.  That
package can't be fetched here, but this environment ships OpenCV 4.6's
contrib quality library (``libopencv_quality.so``) together with its
LIVE-R2-trained model + range files under ``/usr/share/opencv4/quality/``.
The cv2 Python wheel (5.0) does NOT expose the quality module, so we bind
the C++ library through a tiny first-party C ABI shim
(``hvi_cidnet_tpu/native/brisque_shim.cpp``) loaded via ctypes.

Exports:
* ``available()``     — True when the shim (or a buildable toolchain+lib) and
                        the trained model files are present.
* ``score(img)``      — trained BRISQUE score of an RGB uint8/float image.
* ``features(img)``   — OpenCV's 36-dim unscaled feature vector; used as a
                        parity oracle for the pure-python arm in
                        ``metrics/brisque.py``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SHIM_SRC = os.path.join(_NATIVE_DIR, "brisque_shim.cpp")
_SHIM_SO = os.path.join(_NATIVE_DIR, "libbrisque_shim.so")

MODEL_PATH = os.environ.get(
    "BRISQUE_CV_MODEL", "/usr/share/opencv4/quality/brisque_model_live.yml"
)
RANGE_PATH = os.environ.get(
    "BRISQUE_CV_RANGE", "/usr/share/opencv4/quality/brisque_range_live.yml"
)

_lib: Optional[ctypes.CDLL] = None
_lib_err: Optional[str] = None


def _build_shim() -> bool:
    """Compile the shim against the system OpenCV 4.6 headers/libs."""
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", _SHIM_SRC,
        "-I/usr/include/opencv4",
        "-lopencv_quality", "-lopencv_ml", "-lopencv_imgproc", "-lopencv_core",
        "-o", _SHIM_SO,
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        return r.returncode == 0 and os.path.exists(_SHIM_SO)
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_err
    if _lib is not None or _lib_err is not None:
        return _lib
    if not os.path.exists(_SHIM_SO) and not (os.path.exists(_SHIM_SRC) and _build_shim()):
        _lib_err = "shim source missing or build failed"
        return None
    try:
        lib = ctypes.CDLL(_SHIM_SO)
    except OSError as e:  # system OpenCV libs absent
        _lib_err = str(e)
        return None
    lib.brisque_score_u8.restype = ctypes.c_int
    lib.brisque_score_u8.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
    ]
    lib.brisque_features_u8.restype = ctypes.c_int
    lib.brisque_features_u8.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return (
        os.path.exists(MODEL_PATH)
        and os.path.exists(RANGE_PATH)
        and _load() is not None
    )


def _as_u8(img: np.ndarray) -> np.ndarray:
    x = np.asarray(img)
    if x.dtype != np.uint8:
        # [0,1] floats → [0,255]; already-[0,255] floats pass through.
        if np.issubdtype(x.dtype, np.floating) and x.max() <= 1.0 + 1e-6:
            x = x * 255.0
        x = np.clip(np.round(x), 0, 255).astype(np.uint8)
    if x.ndim == 2:
        x = x[:, :, None]
    return np.ascontiguousarray(x)


def score(img: np.ndarray) -> float:
    """Trained (LIVE-R2) BRISQUE score of an RGB/grayscale image."""
    lib = _load()
    if lib is None:
        raise FileNotFoundError(f"native BRISQUE backend unavailable: {_lib_err}")
    x = _as_u8(img)
    h, w, c = x.shape
    out = ctypes.c_double()
    rc = lib.brisque_score_u8(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w, c,
        MODEL_PATH.encode(), RANGE_PATH.encode(), ctypes.byref(out),
    )
    if rc != 0:
        raise RuntimeError("OpenCV QualityBRISQUE::compute failed")
    return float(out.value)


def features(img: np.ndarray) -> np.ndarray:
    """OpenCV's unscaled 36-dim BRISQUE feature vector (parity oracle)."""
    lib = _load()
    if lib is None:
        raise FileNotFoundError(f"native BRISQUE backend unavailable: {_lib_err}")
    x = _as_u8(img)
    h, w, c = x.shape
    out = (ctypes.c_float * 36)()
    rc = lib.brisque_features_u8(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w, c, out,
    )
    if rc != 0:
        raise RuntimeError("OpenCV QualityBRISQUE::computeFeatures failed")
    return np.asarray(out, dtype=np.float64)
