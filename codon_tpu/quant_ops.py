"""Quantization Ops backends: QAT fake-quant and real int8 inference.

PTQ with static calibration was measured insufficient for this workload
(x4 RMSE 1.66 -> 9.1: heavy-tailed activations compound over the 5
recurrent stages; percentile clipping is worse — depth edges ARE the
outliers). Frozen-scale QAT (two calibrate+retune iterations) recovered
only RMSE 3.50: per-tensor static scales stay too coarse for this net's
activation spread, and the CAC global pools see patches during training vs
full frames at eval. Dynamic scales win on quality; the engineering problem
is making them cheap (see Int8Ops notes below). Backends:

  FakeQuantOps   training backend — every conv sees int8-rounded weights
                 (per-output-channel scales) and activations (PER-SAMPLE,
                 DYNAMIC absmax), straight-through gradients. Fine-tuning
                 a float checkpoint for a few k steps teaches it to live
                 on the int8 grid.
  Int8Ops        inference backend — the SAME dynamic scales, but the conv
                 actually runs int8 x int8 -> int32 on the MXU (~2x the
                 bf16 conv rate on v5e), requant epilogue fused.
  Int8ShardedOps spatially-tiled inference (H sharded inside shard_map):
                 halo-exchange convs + all-reduced per-sample absmax so
                 every shard quantizes with the SAME scale — tiled int8
                 is exact w.r.t. untiled int8.

Activation scales are PER SAMPLE (absmax over each batch element's H,W,C),
not per tensor: a padded mixed-size batch therefore computes exactly what
per-image execution would — batch composition cannot leak between images
(zero padding never raises an absmax). Weight scales are per output
channel. Dynamic scales mean no calibration pass and exact
training/inference consistency. Tiny convs (guidance/gate convs with <=2
in or out channels, i.e. the stems' first layer, the output head and the
CAC spatial gate) stay in the float path in ALL backends.

Because these are Ops backends, every model in the framework (flagship +
zoo) can run quantized without touching model code.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from codon_tpu.core.ops import XlaOps, conv2d_nhwc
from codon_tpu.parallel.ops import ShardedOps, _halo_exchange_h

_DN = ("NHWC", "HWIO", "NHWC")


def _skip_quant(w) -> bool:
    return w.shape[2] <= 2 or w.shape[3] <= 2


def _w_scales(w):
    return jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0


def _x_scale(x):
    """Per-sample dynamic activation scale: (N, 1, 1, 1)."""
    return jnp.maximum(jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True),
                       1e-8) / 127.0


def _int8_conv(x, w, *, padding, groups, sx):
    """int8 x int8 MXU conv with fused dequant epilogue.

    sx: (N, 1, 1, 1) f32 per-sample activation scale (already all-reduced
    under sharding). Weight scales are per output channel.

    The conv's preferred_element_type is the ACTIVATION dtype, not int32:
    asking XLA for an s32 result materializes a 4-byte accumulator tensor
    to HBM per conv (measured: that round-trip ate the entire int8 MXU
    gain at 463x370/b16). With a bf16 result the accumulator converts on
    the way out and the tensor hits HBM at 2 bytes. bf16 rounding of the
    s32 accumulator (~2^-8 relative) matches what the bf16 compute policy
    already does to every QAT conv output, so deployment numerics stay in
    the same class; fp32 activations keep an exact f32 accumulation path
    (used by the op-exactness tests).
    """
    out_dt = (x.dtype if jnp.issubdtype(x.dtype, jnp.floating)
              else jnp.float32)
    sw = _w_scales(w).astype(jnp.float32)
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                  -127, 127).astype(jnp.int8)
    w8 = jnp.clip(jnp.round(w.astype(jnp.float32) /
                            sw[None, None, None, :]),
                  -127, 127).astype(jnp.int8)
    acc = lax.conv_general_dilated(
        x8, w8, (1, 1), padding, dimension_numbers=_DN,
        feature_group_count=groups,
        preferred_element_type=out_dt)
    return acc * (sx * sw[None, None, None, :]).astype(out_dt)


class FakeQuantOps(XlaOps):
    """QAT backend: float conv on int8-rounded values, STE gradients."""

    def conv2d(self, x, w, *, padding="SAME", mask=None, groups=1):
        if _skip_quant(w):
            return super().conv2d(x, w, padding=padding, mask=mask,
                                  groups=groups)

        def fq(t, s):
            q = jnp.clip(jnp.round(t / s), -127, 127) * s
            return t + lax.stop_gradient(q - t.astype(q.dtype)).astype(
                t.dtype)

        xq = fq(x, _x_scale(x).astype(x.dtype))
        wq = fq(w, _w_scales(w)[None, None, None, :].astype(w.dtype))
        out = conv2d_nhwc(xq, wq, padding=padding, groups=groups,
                          precision=self.precision)
        return self.apply_mask(out, mask)


class Int8Ops(XlaOps):
    """Inference backend: real int8 MXU convs with dynamic scales."""

    def conv2d(self, x, w, *, padding="SAME", mask=None, groups=1):
        if _skip_quant(w):
            return super().conv2d(x, w, padding=padding, mask=mask,
                                  groups=groups)
        out = _int8_conv(x, w, padding=padding, groups=groups,
                         sx=_x_scale(x).astype(jnp.float32))
        return self.apply_mask(out, mask)


class Int8ShardedOps(ShardedOps):
    """Spatially-tiled int8 inference: exact w.r.t. untiled Int8Ops.

    The per-sample activation absmax is all-reduced over the sharded H axis
    (all_gather of the (N,1,1,1) local maxes — tiny) so every shard
    quantizes on the identical grid; halo rows arrive in float and are
    quantized locally with that same scale, matching the rows' quantization
    on their home shard bit-for-bit.
    """

    def conv2d(self, x, w, *, padding="SAME", mask=None, groups=1):
        if _skip_quant(w):
            return super().conv2d(x, w, padding=padding, mask=mask,
                                  groups=groups)
        kh, kw = w.shape[0], w.shape[1]
        xh = _halo_exchange_h(x, (kh - 1) // 2, self.axis_name)
        local = jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True)
        g = lax.all_gather(local, self.axis_name)
        sx = (jnp.maximum(jnp.max(g, axis=0), 1e-8) / 127.0).astype(
            jnp.float32)
        out = _int8_conv(xh, w,
                         padding=((0, 0), ((kw - 1) // 2,) * 2),
                         groups=groups, sx=sx)
        return self.apply_mask(out, mask)
