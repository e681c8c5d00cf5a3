"""Test configuration: force an 8-fake-device CPU mesh for all tests.

Tests run on CPU (deterministic, fast) with 8 virtual devices so multi-chip
sharding paths execute for real (the TPU-native answer to multi-node
simulation — SURVEY.md §4).  Real-TPU runs happen via bench.py and the driver.
"""

import os
import sys

# Force CPU even when the environment presets JAX_PLATFORMS (the TPU tunnel's
# sitecustomize registers its backend unconditionally): parity tolerances
# assume CPU fp32 math.  jax.config wins over the env var here.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def has_torch_reference() -> bool:
    return os.path.isdir("/root/reference/net")


@pytest.fixture(scope="session")
def torch_reference_path():
    """Path to the torch reference used as a parity oracle (read-only).

    torchvision isn't installed; the reference's ``loss.vgg_arch`` imports it
    at module scope, so a minimal stub keeps the importable-oracle surface
    (L1/SSIM classes) reachable.  VGGFeatureExtractor itself is never
    constructed in tests.
    """
    if not has_torch_reference():
        pytest.skip("torch reference not available")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    if "torchvision" not in sys.modules:
        import types

        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        tv_models.vgg = types.ModuleType("torchvision.models.vgg")
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
        sys.modules["torchvision.models.vgg"] = tv_models.vgg
    return "/root/reference"
