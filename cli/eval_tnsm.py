#!/usr/bin/env python
"""TNSM-variant batch inference — twin of ``eval_tnsm.py``.

Same routing as cli/eval.py but with the TNSM graph and the reference's
shape-filtered non-strict weight load (eval_tnsm.py:39-43): keys present with
matching shapes are taken, everything else keeps its fresh init.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hvi_cidnet_tpu.compat.torch_ckpt import filtered_update
from hvi_cidnet_tpu.data.datasets import EvalDataset
from hvi_cidnet_tpu.eval.evaluator import Evaluator, gates_for_dataset
from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, init_cidnet
from hvi_cidnet_tpu.train.checkpoint import load_any
from hvi_cidnet_tpu.utils.compile_cache import enable_compilation_cache

from cli.eval import parser, route  # shared flag surface


def main():
    ep = parser().parse_args()
    enable_compilation_cache(ep.compile_cache)
    eval_dir, out, weights, alpha, pad = route(ep)
    if ep.weights:
        weights = ep.weights
    cfg = CIDNetConfig(variant="tnsm")
    params = init_cidnet(jax.random.PRNGKey(0), cfg)
    loaded = load_any(weights)
    params = filtered_update(params, loaded, strict=False)
    n_hit = sum(1 for k in params if k in loaded and tuple(loaded[k].shape) == tuple(params[k].shape))
    print(f"loaded {n_hit}/{len(params)} tensors from {weights} (shape-filtered, non-strict)")
    gates = gates_for_dataset(
        lol=ep.lol, v2=ep.lol_v2_real, unpaired=ep.unpaired, lmot=ep.lmot,
        alpha=alpha if alpha is not None else 1.0,
    )
    ev = Evaluator(params, cfg, gates, gamma=ep.gamma, compute_dtype=jnp.dtype(ep.dtype))
    n = ev.run_dataset(EvalDataset(eval_dir, pad=pad), out)
    print(f"===> End evaluation ({n} images)")


if __name__ == "__main__":
    main()
