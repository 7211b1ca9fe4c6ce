"""Sharded ops backend: exact spatially-tiled execution inside shard_map.

The H axis of every activation is sharded across the `axis_name` mesh axis.
Two things make tiled inference bit-exact with untiled (the hard parts
identified in SURVEY.md §7):

  * conv stencils: each stride-1 SAME conv needs (k-1)//2 neighbor rows on
    each side — fetched with `lax.ppermute` halo exchange; mesh-edge devices
    zero-pad, reproducing SAME semantics at the true image boundary.
  * CAC channel gates pool GLOBALLY over H,W (reference CAC_module.py:43,47)
    — local sums/maxes are combined with `lax.psum`/`lax.pmax` per MC stage,
    so the collective rides ICI inside the loop. This is the one place
    communication and compute genuinely interleave.

W-axis sharding would work symmetrically; H is chosen because NHWC keeps C
on lanes and W on sublanes, so splitting H never fights the tiling.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from codon_tpu.core.ops import Ops, conv2d_nhwc


def _halo_exchange_h(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Append `halo` rows from each H-neighbor: (N,H,W,C) -> (N,H+2h,W,C).

    Edge shards receive zeros (== SAME zero padding at the image boundary).
    """
    n = lax.axis_size(axis_name)
    if halo <= 0:
        return x
    top_from_prev = x[:, -halo:, :, :]   # my bottom rows -> next device's top
    bot_from_next = x[:, :halo, :, :]    # my top rows -> prev device's bottom
    if n > 1:
        fwd = [(i, i + 1) for i in range(n - 1)]     # i sends to i+1
        bwd = [(i + 1, i) for i in range(n - 1)]     # i+1 sends to i
        top = lax.ppermute(top_from_prev, axis_name, fwd)
        bot = lax.ppermute(bot_from_next, axis_name, bwd)
    else:
        top = jnp.zeros_like(top_from_prev)
        bot = jnp.zeros_like(bot_from_next)
    idx = lax.axis_index(axis_name)
    # ppermute leaves un-targeted shards (the mesh edges) zero-filled, which
    # is exactly SAME-padding semantics; no masking needed beyond that.
    del idx
    return jnp.concatenate([top, x, bot], axis=1)


class ShardedOps(Ops):
    """Ops for model code running INSIDE shard_map with H sharded."""

    def __init__(self, axis_name: str = "sp", acc_dtype=jnp.float32,
                 precision=None):
        self.axis_name = axis_name
        self.acc_dtype = acc_dtype
        self.precision = precision

    def conv2d(self, x, w, *, padding="SAME", mask=None, groups=1,
               name=None):
        del name
        if padding != "SAME":
            raise ValueError(
                "ShardedOps.conv2d implements SAME padding only (halo "
                f"exchange reproduces it at shard seams); got {padding!r}")
        kh = w.shape[0]
        halo = (kh - 1) // 2
        xh = _halo_exchange_h(x, halo, self.axis_name)
        out = conv2d_nhwc(
            xh, w,
            padding=((0, 0), ((w.shape[1] - 1) // 2,) * 2),
            acc_dtype=self.acc_dtype, precision=self.precision,
            groups=groups)
        return self.apply_mask(out, mask)

    def global_avg(self, x, mask=None):
        if mask is None:
            s = jnp.sum(x, axis=(1, 2), keepdims=True)
            cnt = jnp.asarray(x.shape[1] * x.shape[2], x.dtype)
        else:
            m = mask.astype(x.dtype)
            s = jnp.sum(x * m, axis=(1, 2), keepdims=True)
            cnt = jnp.sum(m, axis=(1, 2), keepdims=True)
        s = lax.psum(s, self.axis_name)
        cnt = lax.psum(cnt, self.axis_name)
        return s / cnt

    def global_max(self, x, mask=None):
        if mask is None:
            m = jnp.max(x, axis=(1, 2), keepdims=True)
        else:
            neg = jnp.asarray(-jnp.inf, x.dtype)
            m = jnp.max(jnp.where(mask.astype(bool), x, neg),
                        axis=(1, 2), keepdims=True)
        # all_gather+max instead of pmax: differentiable (pmax has no VJP),
        # and the gathered stats are tiny — (n_dev, N, 1, 1, C).
        g = lax.all_gather(m, self.axis_name)
        return jnp.max(g, axis=0)

    def global_sum(self, x, mask=None):
        if mask is not None:
            x = x * mask.astype(x.dtype)
        return lax.psum(jnp.sum(x, axis=(1, 2), keepdims=True),
                        self.axis_name)
