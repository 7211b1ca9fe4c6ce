"""Device mesh helpers.

The reference's only parallelism is torch DataParallel replication
(/root/reference/CODON_X16/test.py:52). The TPU-native equivalents are:
  * dp — batch data parallelism over images (the DataParallel analog)
  * sp — spatial tiling: the image's H axis sharded across devices, with
         halo exchange for conv stencils and psum'd global-pool statistics
         for the CAC channel gates (this workload's "sequence parallelism")
Meshes here ride ICI; collectives are XLA psum/pmax/ppermute.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(axis_sizes: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("dp", "sp"),
              devices=None) -> Mesh:
    """Build a Mesh over available devices.

    Default: all devices on `sp` (spatial) if axis_sizes is None and there
    is one axis name left unsized; otherwise reshape to axis_sizes.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = [1] * (len(axis_names) - 1) + [n]
    need = int(np.prod(axis_sizes))
    if need > n:
        raise ValueError(f"axis_sizes {axis_sizes} needs {need} devices, "
                         f"only {n} available")
    arr = np.asarray(devices[:need]).reshape(axis_sizes)
    return Mesh(arr, axis_names)
