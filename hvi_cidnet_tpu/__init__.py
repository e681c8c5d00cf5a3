"""hvi_cidnet_tpu — a TPU-native (JAX/XLA/Pallas) low-light image enhancement
framework with the capabilities of HVI-CIDNet (KitaharaH fork).

Compute path: jit-compiled NHWC bf16 graphs with fp32 islands for the HVI
color transform and attention softmax; fused Pallas kernels for the HVI
transform; DP/spatial sharding over a ``jax.sharding.Mesh`` for multi-chip.
"""

__version__ = "0.1.0"

from hvi_cidnet_tpu.models.cidnet import (  # noqa: F401
    CIDNetConfig,
    HVIGates,
    cidnet_forward,
    count_params,
    hvit,
    init_cidnet,
)
from hvi_cidnet_tpu.ops.hvi import rgb_to_hvi, hvi_to_rgb  # noqa: F401
from hvi_cidnet_tpu.eval.evaluator import Evaluator, gates_for_dataset  # noqa: F401
from hvi_cidnet_tpu.train.checkpoint import load_any, save_checkpoint  # noqa: F401
from hvi_cidnet_tpu.train.trainer import TrainConfig, make_optimizer, make_train_step  # noqa: F401
