"""Spatially-tiled (sharded-image) execution — pjit/shard_map entry points.

`make_sharded_forward` builds a jitted forward where:
  * the batch axis rides the `dp` mesh axis (DataParallel analog),
  * the image H axis rides the `sp` mesh axis (tiled large-frame inference),
  * inside shard_map, ShardedOps supplies halo-exchange convs and
    psum/pmax'd CAC pooling so results are bit-exact with single-device
    execution (validated in tests/test_parallel.py).

The reference has no equivalent — its DataParallel wrap replicates the whole
image per GPU (/root/reference/CODON_X16/test.py:52); sharding the frame is
what lets one model instance span chips for large inputs.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from codon_tpu.parallel.mesh import make_mesh
from codon_tpu.parallel.ops import ShardedOps


def make_sharded_forward(variant, mesh: Mesh, batch_axis: Optional[str] = "dp",
                         spatial_axis: Optional[str] = "sp",
                         jit_compile: bool = True):
    """(params, depth, color, mask) -> out, sharded over `mesh`.

    mask is REQUIRED here (pass ones): specs are static over the pytree.
    jit_compile=False returns the bare shard_map'd function — differentiable,
    for composition inside a larger jit (e.g. the train step).
    """
    dt = variant.cfg.dtypes
    ops = ShardedOps(spatial_axis, acc_dtype=dt.acc_dtype,
                     precision=dt.precision) if spatial_axis else None

    def local_fwd(params, depth, color, mask):
        return variant.forward(params, depth, color, mask=mask, ops=ops)

    img_spec = P(batch_axis, spatial_axis, None, None)
    fn = shard_map(
        local_fwd, mesh=mesh,
        in_specs=(P(), img_spec, img_spec, img_spec),
        out_specs=img_spec,
        check_vma=False,
    )
    return jax.jit(fn) if jit_compile else fn


def _pad_to(x: np.ndarray, h: int, axis: int = 1) -> np.ndarray:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, h - x.shape[axis])
    return np.pad(x, pad) if h > x.shape[axis] else x


def tiled_infer(variant, params, depth, color, mask=None, mesh=None,
                n_devices: Optional[int] = None):
    """Convenience one-call tiled inference.

    depth/color: (B, H, W, 1) host arrays. Pads H to a multiple of the sp
    axis (mask keeps padding exact), shards, runs, crops back.
    """
    if mesh is None:
        n = n_devices or len(jax.devices())
        mesh = make_mesh([1, n])
    n_sp = mesh.shape["sp"]
    B, H, W, _ = depth.shape
    Hp = -(-H // n_sp) * n_sp
    if mask is None:
        mask = np.ones((B, H, W, 1), np.float32)
    depth = _pad_to(np.asarray(depth), Hp)
    color = _pad_to(np.asarray(color), Hp)
    mask = _pad_to(np.asarray(mask), Hp)
    fwd = make_sharded_forward(variant, mesh)
    out = fwd(params, jnp.asarray(depth), jnp.asarray(color),
              jnp.asarray(mask))
    return np.asarray(out)[:, :H]


def make_tiled_forward(variant, n_devices: int):
    """CLI hook: returns fwd(params, depth, color, mask) over an sp mesh."""
    mesh = make_mesh([1, n_devices])
    fwd = make_sharded_forward(variant, mesh)

    def run(params, depth, color, mask):
        B, H, Wd, _ = depth.shape
        n_sp = mesh.shape["sp"]
        Hp = -(-H // n_sp) * n_sp
        if mask is None:
            mask = jnp.ones((B, H, Wd, 1), jnp.float32)
        if Hp != H:
            padw = [(0, 0), (0, Hp - H), (0, 0), (0, 0)]
            depth = jnp.pad(depth, padw)
            color = jnp.pad(color, padw)
            mask = jnp.pad(mask, padw)
        return fwd(params, depth, color, mask)[:, :H]

    return run
