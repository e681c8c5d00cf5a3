"""HF config.json semantics (VERDICT missing #4).

The reference CIDNet is a PyTorchModelHubMixin (net/CIDNet.py:6-8):
``from_pretrained`` builds the model from the repo's config.json, so a hub
model with non-default channels/heads must shape our graph the same way.
"""

import json

import jax
import numpy as np
import pytest

from hvi_cidnet_tpu.compat.torch_ckpt import filtered_update, from_torch_state_dict, to_torch_state_dict
from hvi_cidnet_tpu.models.cidnet import CIDNetConfig, init_cidnet
from hvi_cidnet_tpu.utils.hf_config import config_from_hf_json


def test_defaults_when_no_config():
    cfg = config_from_hf_json(None)
    assert cfg == CIDNetConfig(variant="base")


def test_non_default_config_shapes_model(tmp_path):
    cfgfile = tmp_path / "config.json"
    cfgfile.write_text(json.dumps({"channels": [24, 24, 48, 96], "heads": [1, 2, 4, 8], "norm": False}))
    cfg = config_from_hf_json(str(cfgfile))
    assert cfg.channels == (24, 24, 48, 96)

    # weights exported from a model with those widths load 1:1 (every key
    # present, every shape matching -> strict load passes)
    donor = init_cidnet(jax.random.PRNGKey(1), cfg)
    state = from_torch_state_dict(to_torch_state_dict(donor))
    params = init_cidnet(jax.random.PRNGKey(0), cfg)
    merged = filtered_update(params, state, strict=True)
    assert merged["HVE_block0.1.weight"].shape == (3, 3, 3, 24)
    assert merged["HV_LCA3.ffn.q.weight"].shape == (1, 1, 96, 96)

    # and against the DEFAULT graph the same weights would shape-filter to
    # near-nothing — the failure mode config parsing prevents
    default_params = init_cidnet(jax.random.PRNGKey(0), CIDNetConfig(variant="base"))
    kept = sum(
        1 for k, v in state.items()
        if k in default_params and tuple(default_params[k].shape) == tuple(v.shape)
    )
    assert kept < len(state) // 2


def test_save_pretrained_roundtrip(tmp_path):
    """save_pretrained is the inverse of the hub-load path (mixin analog)."""
    from hvi_cidnet_tpu.compat.torch_ckpt import load_safetensors
    from hvi_cidnet_tpu.train.checkpoint import save_pretrained

    cfg = CIDNetConfig(variant="base", channels=(24, 24, 48, 96))
    params = init_cidnet(jax.random.PRNGKey(2), cfg)
    out = save_pretrained(str(tmp_path / "hub"), params, cfg)

    cfg2 = config_from_hf_json(out + "/config.json")
    assert cfg2.channels == cfg.channels and cfg2.heads == cfg.heads
    loaded = load_safetensors(out + "/model.safetensors")
    assert set(loaded) == set(params)
    for k in params:
        np.testing.assert_array_equal(np.asarray(loaded[k]), np.asarray(params[k]))


def test_save_pretrained_preserves_variant(tmp_path):
    """Non-base exports record their variant: a TNSM folder reloading as
    'base' would silently shape-filter the TNSM tensors away."""
    from hvi_cidnet_tpu.train.checkpoint import save_pretrained

    cfg = CIDNetConfig(variant="tnsm", channels=(8, 8, 16, 32))
    params = init_cidnet(jax.random.PRNGKey(4), cfg)
    out = save_pretrained(str(tmp_path / "hub_tnsm"), params, cfg)
    cfg2 = config_from_hf_json(out + "/config.json")
    assert cfg2.variant == "tnsm" and cfg2.channels == cfg.channels

    # base folders stay reference-shaped: no variant key at all
    cfgb = CIDNetConfig(variant="base", channels=(8, 8, 16, 32))
    outb = save_pretrained(str(tmp_path / "hub_base"), init_cidnet(jax.random.PRNGKey(5), cfgb), cfgb)
    assert "variant" not in json.load(open(outb + "/config.json"))
    assert config_from_hf_json(outb + "/config.json").variant == "base"


def test_unknown_keys_ignored_and_bad_values_raise(tmp_path):
    f = tmp_path / "config.json"
    f.write_text(json.dumps({"channels": [36, 36, 72, 144], "architectures": ["CIDNet"]}))
    assert config_from_hf_json(str(f)).channels == (36, 36, 72, 144)
    f.write_text(json.dumps({"channels": [36, 36]}))
    with pytest.raises(ValueError):
        config_from_hf_json(str(f))
    f.write_text(json.dumps({"variant": "resnet"}))
    with pytest.raises(ValueError, match="variant"):
        config_from_hf_json(str(f))
