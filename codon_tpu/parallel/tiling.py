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
                         jit_compile: bool = True, ops_factory=None,
                         local_ops=None, scales_factory=None):
    """(params, depth, color, mask) -> out, sharded over `mesh`.

    mask is REQUIRED here (pass ones): specs are static over the pytree.
    jit_compile=False returns the bare shard_map'd function — differentiable,
    for composition inside a larger jit (e.g. the train step).
    ops_factory(axis_name, acc_dtype=..., precision=...) overrides the
    per-shard Ops backend (e.g. quant_ops.Int8ShardedOps for tiled int8);
    local_ops is the Ops instance used when spatial_axis is None (pure dp
    replicates the whole image per shard, so a plain single-device backend
    such as quant_ops.Int8Ops is correct there).
    scales_factory(act_scales, spatial_axis_or_None, acc_dtype=...,
    precision=...) builds a static-int8 backend from scales found under
    params["act_scales"] AT CALL TIME: the scales then ride the params
    pytree as jit arguments instead of closure constants, so the compiled
    program is shared by every checkpoint of the same shape family (the
    remote compile service makes baked-constant programs minutes per
    checkpoint — same discipline as the single-device eval path).
    """
    dt = variant.cfg.dtypes
    if spatial_axis:
        factory = ops_factory or ShardedOps
        ops = factory(spatial_axis, acc_dtype=dt.acc_dtype,
                      precision=dt.precision)
    else:
        ops = local_ops

    def local_fwd(params, depth, color, mask):
        o = ops
        if (scales_factory is not None and isinstance(params, dict)
                and "act_scales" in params):
            params = dict(params)
            o = scales_factory(params.pop("act_scales"), spatial_axis,
                               acc_dtype=dt.acc_dtype,
                               precision=dt.precision)
        return variant.forward(params, depth, color, mask=mask, ops=o)

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


def make_tiled_forward(variant, n_devices: int, dp_devices: int = 1,
                       ops_factory=None, local_ops=None,
                       scales_factory=None):
    """CLI hook: fwd(params, depth, color, mask) over a dp x sp mesh.

    n_devices shards the image H axis (sp, spatial tiling); dp_devices
    shards the batch (dp — the user-facing DataParallel analog of
    /root/reference/CODON_X16/test.py:52). Either may be 1. Input batches
    are padded to a dp multiple (with all-ones masks on padding so the CAC
    pool counts stay nonzero) and H to an sp multiple; both pads are
    cropped/dropped from the output.
    """
    sp = max(1, n_devices)
    dp = max(1, dp_devices)
    mesh = make_mesh([dp, sp])
    fwd = make_sharded_forward(
        variant, mesh,
        batch_axis="dp" if dp > 1 else None,
        spatial_axis="sp" if sp > 1 else None,
        ops_factory=ops_factory, local_ops=local_ops,
        scales_factory=scales_factory)

    def run(params, depth, color, mask):
        B, H, Wd, _ = depth.shape
        Hp = -(-H // sp) * sp
        Bp = -(-B // dp) * dp
        if mask is None:
            mask = jnp.ones((B, H, Wd, 1), jnp.float32)
        if Hp != H:
            padw = [(0, 0), (0, Hp - H), (0, 0), (0, 0)]
            depth = jnp.pad(depth, padw)
            color = jnp.pad(color, padw)
            mask = jnp.pad(mask, padw)
        if Bp != B:
            padb = [(0, Bp - B), (0, 0), (0, 0), (0, 0)]
            depth = jnp.pad(depth, padb)
            color = jnp.pad(color, padb)
            # padding images keep mask=1: an all-zero "image" is perfectly
            # valid input, while a zero mask would 0/0 the CAC avg pool
            mask = jnp.pad(mask, padb, constant_values=1.0)
        return fwd(params, depth, color, mask)[:B, :H]

    return run
