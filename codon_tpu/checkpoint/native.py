"""Native checkpoint save/load: flat .npz with '/'-joined pytree paths.

Simple, dependency-light, and exact (fp32 arrays round-trip bitwise). An
orbax-based path can be layered on later; npz is the canonical format for
converted reference checkpoints.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_npz(path: str, params) -> None:
    # write to the EXACT path given: np.savez(path_str) silently appends
    # ".npz" for extensionless paths, which load_npz would then not find
    with open(path, "wb") as f:
        np.savez(f, **_flatten(params))


def load_npz(path: str):
    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return tree
