"""Reference-checkpoint interop.

The reference ships `.pth` files of the form {"epoch": int, "model": <pickled
full nn.Module>} loaded via `checkpoint["model"].state_dict()`
(/root/reference/CODON_X4/test.py:56-59); the X16 variant wraps the model in
DataParallel so keys carry a `module.` prefix (CODON_X16/test.py:52).

This module converts either a raw state-dict-of-numpy-arrays or a real .pth
into the codon_tpu parameter pytree (and back):
  * conv weights OIHW -> HWIO
  * Linear weights (out, in) -> (in, out)
  * per-stage attention_{c,s}{0..4} -> stacked `cac` subtree
  * `module.` prefixes stripped; dead attention_{c5,s5} heads mapped when
    cfg.dead_heads else dropped.

The numpy-dict core has no torch dependency; only `load_pth` imports torch.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp

from codon_tpu.models.codon_net import CodonConfig

_CONV_NAMES = [
    "input", "conv_input", "conv1", "conv2", "conv3", "confuse",
    "input_c", "conv_input_c", "conv4", "conv5", "conv6", "confuse_c",
    "conv7", "conv8", "conv9", "conv10", "confuse_fuse", "conv11", "output",
]


def _np(x):
    return np.asarray(x)


def _strip_module(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def torch_state_dict_to_params(sd: Mapping[str, "np.ndarray"],
                               cfg: CodonConfig = CodonConfig()):
    """numpy state dict (reference names) -> codon_tpu param pytree."""
    sd = _strip_module({k: _np(v) for k, v in sd.items()})
    params = {}
    for name in _CONV_NAMES:
        w = sd[f"{name}.weight"]                      # (O, I, kh, kw)
        params[name] = jnp.asarray(w.transpose(2, 3, 1, 0))  # HWIO

    if cfg.use_cac:
        ch_w1, ch_b1, ch_w2, ch_b2, sp_w = [], [], [], [], []
        for i in range(cfg.num_mc):
            ch_w1.append(sd[f"attention_c{i}.mlp.1.weight"].T)  # (2W, hid)
            ch_b1.append(sd[f"attention_c{i}.mlp.1.bias"])
            ch_w2.append(sd[f"attention_c{i}.mlp.3.weight"].T)  # (hid, W)
            ch_b2.append(sd[f"attention_c{i}.mlp.3.bias"])
            sp_w.append(sd[f"attention_s{i}.spatial.conv.weight"]
                        .transpose(2, 3, 1, 0))                 # (5,5,2,1)
        params["cac"] = {
            "ch_w1": jnp.asarray(np.stack(ch_w1)),
            "ch_b1": jnp.asarray(np.stack(ch_b1)),
            "ch_w2": jnp.asarray(np.stack(ch_w2)),
            "ch_b2": jnp.asarray(np.stack(ch_b2)),
            "sp_w": jnp.asarray(np.stack(sp_w)),
        }

    if cfg.dead_heads and "attention_c5.mlp.1.weight" in sd:
        params["attention_c5"] = {
            "w1": jnp.asarray(sd["attention_c5.mlp.1.weight"].T),
            "b1": jnp.asarray(sd["attention_c5.mlp.1.bias"]),
            "w2": jnp.asarray(sd["attention_c5.mlp.3.weight"].T),
            "b2": jnp.asarray(sd["attention_c5.mlp.3.bias"]),
        }
        params["attention_s5"] = {
            "sp_w": jnp.asarray(sd["attention_s5.spatial.conv.weight"]
                                .transpose(2, 3, 1, 0)),
        }
    return params


def params_to_torch_state_dict(params, cfg: CodonConfig = CodonConfig(),
                               module_prefix: bool = False):
    """codon_tpu pytree -> reference-named numpy state dict (round-trip)."""
    sd: Dict[str, np.ndarray] = {}
    for name in _CONV_NAMES:
        sd[f"{name}.weight"] = _np(params[name]).transpose(3, 2, 0, 1)
    if cfg.use_cac:
        cac = params["cac"]
        for i in range(cfg.num_mc):
            sd[f"attention_c{i}.mlp.1.weight"] = _np(cac["ch_w1"][i]).T
            sd[f"attention_c{i}.mlp.1.bias"] = _np(cac["ch_b1"][i])
            sd[f"attention_c{i}.mlp.3.weight"] = _np(cac["ch_w2"][i]).T
            sd[f"attention_c{i}.mlp.3.bias"] = _np(cac["ch_b2"][i])
            sd[f"attention_s{i}.spatial.conv.weight"] = (
                _np(cac["sp_w"][i]).transpose(3, 2, 0, 1))
    if cfg.dead_heads and "attention_c5" in params:
        c5 = params["attention_c5"]
        sd["attention_c5.mlp.1.weight"] = _np(c5["w1"]).T
        sd["attention_c5.mlp.1.bias"] = _np(c5["b1"])
        sd["attention_c5.mlp.3.weight"] = _np(c5["w2"]).T
        sd["attention_c5.mlp.3.bias"] = _np(c5["b2"])
        sd["attention_s5.spatial.conv.weight"] = (
            _np(params["attention_s5"]["sp_w"]).transpose(3, 2, 0, 1))
    if module_prefix:
        sd = {f"module.{k}": v for k, v in sd.items()}
    return sd


def load_pth(path: str, cfg: CodonConfig = CodonConfig()):
    """Load a reference .pth (full-module pickle or plain state dict)."""
    import torch  # local import: converter core stays torch-free

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        obj = ckpt["model"]
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        epoch = int(ckpt.get("epoch", -1))
    elif hasattr(ckpt, "state_dict"):
        sd, epoch = ckpt.state_dict(), -1
    else:
        sd, epoch = ckpt, -1
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    return torch_state_dict_to_params(sd, cfg), epoch


def generic_state_dict_to_flat(sd: Mapping[str, "np.ndarray"]):
    """Torch state dict -> flat codon_tpu zoo params by rank-based layout:

      4D conv weight OIHW -> HWIO, 2D Linear (out,in) -> (in,out),
      1D tensors (biases, norm affine/stats) unchanged, `module.` stripped,
      `num_batches_tracked` dropped.

    Works for any zoo variant because zoo params are keyed by the torch
    names themselves.
    """
    sd = _strip_module({k: _np(v) for k, v in sd.items()})
    out: Dict[str, "jnp.ndarray"] = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if v.ndim == 4:
            out[k] = jnp.asarray(v.transpose(2, 3, 1, 0))
        elif v.ndim == 2:
            out[k] = jnp.asarray(v.T)
        else:
            out[k] = jnp.asarray(v)
    return out
