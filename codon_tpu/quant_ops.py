"""Quantization Ops backends: QAT fake-quant and real int8 inference.

Scale-granularity history (each step measured on this workload):
  * per-tensor static PTQ: x4 RMSE 1.66 -> 9.1 (heavy-tailed activations
    compound over the 5 recurrent stages; percentile clipping worse —
    depth edges ARE the outliers).
  * per-tensor static + frozen-scale QAT: floor at RMSE 3.50.
  * per-sample DYNAMIC + QAT: RMSE 1.75 — quality solved, but the absmax
    reduction + quantize round-trip per conv eat the whole int8 MXU gain
    (52.8 img/s vs 52.7 bf16 at 463x370/b16 on v5e).
  * per-INPUT-CHANNEL STATIC + QAT (the shipping path): RMSE parity AND
    the full MXU gain — 81.7 img/s at b32 vs 52.7 bf16. Per-channel
    scales fold exactly into the weights (see Int8StaticOps), so
    quantization is a reduction-free elementwise op that XLA fuses into
    the producer's epilogue and activations cross HBM at 1 byte.

Backends:

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
  Int8StaticOps / Int8StaticShardedOps / FakeQuantStaticOps /
  CalibrationOps — the static per-channel family (see section below).

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


def _gathered_sample_scale(x, axis_name):
    """Per-sample dynamic scale all-reduced over the sharded H axis: every
    shard quantizes with the SAME scale (the (N,1,1,1) local maxes are a
    tiny all_gather)."""
    local = jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True)
    g = lax.all_gather(local, axis_name)
    return (jnp.maximum(jnp.max(g, axis=0), 1e-8) / 127.0).astype(
        jnp.float32)


def _fq(t, s, clipped_ste=False):
    """Fake-quantize on grid `s` with straight-through gradients.

    The quotient is computed in f32, matching deployment: _int8_conv rounds
    t.astype(f32) / s — a bf16 quotient (spacing 0.5 in the top octave of
    the grid) would round a measurable fraction of values to a DIFFERENT
    int8 code than inference uses.

    clipped_ste=True zeroes the gradient where the grid CLIPS (static
    frozen scales do clip outliers; letting gradients pass through the
    clip teaches weights to chase unrepresentable values).
    """
    q = (jnp.clip(jnp.round(t.astype(jnp.float32) / s), -127, 127)
         * s).astype(t.dtype)
    ste = t + lax.stop_gradient(q - t)
    if not clipped_ste:
        return ste
    inside = jnp.abs(t.astype(jnp.float32)) <= 127.0 * s
    return jnp.where(inside, ste, lax.stop_gradient(q))


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

    def conv2d(self, x, w, *, padding="SAME", mask=None, groups=1,
               name=None):
        del name
        if _skip_quant(w):
            return super().conv2d(x, w, padding=padding, mask=mask,
                                  groups=groups)
        xq = _fq(x, _x_scale(x).astype(jnp.float32))
        wq = _fq(w, _w_scales(w)[None, None, None, :].astype(jnp.float32))
        out = conv2d_nhwc(xq, wq, padding=padding, groups=groups,
                          precision=self.precision)
        return self.apply_mask(out, mask)


class Int8Ops(XlaOps):
    """Inference backend: real int8 MXU convs with dynamic scales."""

    def conv2d(self, x, w, *, padding="SAME", mask=None, groups=1,
               name=None):
        del name
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
    quantizes with the SAME scale; halo rows arrive in float and are
    quantized locally with that same scale, matching the rows' quantization
    on their home shard bit-for-bit.
    """

    def conv2d(self, x, w, *, padding="SAME", mask=None, groups=1,
               name=None):
        del name
        if _skip_quant(w):
            return super().conv2d(x, w, padding=padding, mask=mask,
                                  groups=groups)
        kh, kw = w.shape[0], w.shape[1]
        xh = _halo_exchange_h(x, (kh - 1) // 2, self.axis_name)
        out = _int8_conv(xh, w,
                         padding=((0, 0), ((kw - 1) // 2,) * 2),
                         groups=groups,
                         sx=_gathered_sample_scale(x, self.axis_name))
        return self.apply_mask(out, mask)


# ---------------------------------------------------------------------------
# Static per-channel activation scales
# ---------------------------------------------------------------------------
#
# The dynamic backends above preserve quality but pay two extra full HBM
# passes per conv (absmax reduction + quantize round-trip) — measured to eat
# the entire int8 MXU gain at 463x370 (52.8 vs 52.7 img/s bf16 at b16).
# STATIC scales remove both: quantization becomes a pure elementwise op that
# XLA fuses into the producing conv's epilogue, activations cross HBM at
# 1 byte, and the MXU runs int8 at ~2x the bf16 rate.
#
# Per-TENSOR static scales were measured insufficient (RMSE floor 3.5, see
# module docstring). The fix is PER-INPUT-CHANNEL static scales s_c, which
# fold EXACTLY into the weights:
#
#     sum_c (x_c) w_co  ==  sum_c (x_c / s_c) (s_c w_co)
#     x8 = round(x / s)           — elementwise, no reduction
#     w8, sw = quantize(w * s)    — per-OUT-channel scales, trace-time const
#     out = conv_int8(x8, w8) * sw
#
# Scales are calibrated per conv SITE (the `name` threaded through
# Ops.conv2d) over full-resolution frames, then optionally QAT-fine-tuned
# with FakeQuantStaticOps so the weights adapt to the frozen grid.


# Ops.roundtrip (elementwise-consumer handoff) site names — calibration
# records them; strip them from a scales dict to deploy without the
# handoff (pure conv-site quantization, the round-2 numerics)
HANDOFF_SITES = ("gate_d", "gate_c", "stem_d", "stem_c", "fuse_r")


# Grouped convs in the merged-tower forward (codon_forward_fused) carry
# COMPOUND site names, one standard site per group ("conv3+conv6"): the
# grouped input is the channel-concat of the standard sites' inputs, so
# its per-channel scale is the concat of their calibrated scales. The
# packed-cell shipping checkpoints calibrate the merged sites packed_d/
# packed_c/packed_f instead of conv1/conv2 etc.; the alias map routes a
# standard name to the packed site that saw the IDENTICAL input tensor.
_SITE_ALIASES = {"conv1": "packed_d", "conv2": "packed_d",
                 "conv4": "packed_c", "conv5": "packed_c",
                 "conv8": "packed_f", "conv9": "packed_f"}


def _lookup_site(act_scales, name):
    sc = act_scales.get(name)
    if sc is not None:
        return sc
    alias = _SITE_ALIASES.get(name)
    return act_scales.get(alias) if alias else None


def _site_scale(act_scales, name, groups):
    """(C_in,) static scale for a conv site, or None (dynamic fallback).

    Direct keys win (a calibration run on the grouped forward records the
    compound name itself); otherwise a compound "a+b" name with one part
    per group resolves to the concat of the parts' scales.
    """
    if name is None:
        return None
    direct = act_scales.get(name)
    if direct is not None:
        return direct
    parts = name.split("+")
    if len(parts) == 1:
        return _lookup_site(act_scales, name) if groups == 1 else None
    if len(parts) != max(groups, 1):
        return None
    scs = [_lookup_site(act_scales, p) for p in parts]
    if any(s is None for s in scs):
        return None
    return jnp.concatenate([jnp.asarray(s, jnp.float32) for s in scs])


def _scale_per_kernel_input(sc, groups, cg, co):
    """Map (C_in,) global act scales onto the (kh,kw,cg,co) kernel layout.

    feature_group_count semantics: output channel o belongs to group
    g = o // (co/groups), and its kernel input channel i reads global
    input channel g*cg + i — so for grouped convs the fold factor depends
    on the OUTPUT channel too.
    """
    if groups == 1:
        return sc[None, None, :, None]
    scg = jnp.reshape(sc, (groups, cg))            # (G, cg)
    per_o = jnp.repeat(scg, co // groups, axis=0)  # (co, cg)
    return per_o.T[None, None, :, :]               # (1, 1, cg, co)


def _fold_weights(w, sc, groups=1):
    """Fold per-input-channel act scales into w; returns (w8, sw)."""
    wf = w.astype(jnp.float32) * _scale_per_kernel_input(
        sc, groups, w.shape[2], w.shape[3])
    sw = _w_scales(wf)
    w8 = jnp.clip(jnp.round(wf / sw), -127, 127).astype(jnp.int8)
    return w8, sw


def quantize_static(x, sc):
    """Per-channel int8 quantization (elementwise; fuses into producers)."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / sc),
                    -127, 127).astype(jnp.int8)


class _StaticHandoffMixin:
    """precommit/roundtrip for the static-scale backends — ONE copy shared
    by Int8StaticOps and Int8StaticShardedOps: static grids are
    position-independent, so the handoffs need no collective even under
    spatial sharding."""

    def precommit(self, x, name=None):
        """Stage-boundary handoff: store the tensor AS int8 on the
        consuming site's grid. Kills the float intermediate's HBM
        round-trip (the consuming conv2d would quantize with the SAME
        scale, so results are bitwise identical). Idempotent on already-
        committed int8 input."""
        sc = _site_scale(self.act_scales, name, 1)
        if sc is None or x.dtype == jnp.int8:
            return x
        return quantize_static(x, sc)

    def roundtrip(self, x, name=None):
        """Elementwise-consumer handoff (CAC gate inputs, stem outputs):
        materialize int8, dequant inline — consumers read 1-byte HBM and
        fuse the per-channel dequant into their own pass. Inactive (site
        absent from act_scales) on checkpoints calibrated before the
        handoff existed, keeping their numerics bit-stable."""
        if x.dtype == jnp.int8:
            raise ValueError(
                f"roundtrip({name!r}): int8 input — roundtrip sites are "
                f"float-in/float-out; an int8 tensor here means a "
                f"precommit was misrouted to an elementwise consumer")
        sc = _site_scale(self.act_scales, name, 1)
        if sc is None:
            return x
        q = quantize_static(x, sc)
        return (q.astype(jnp.float32) * sc).astype(x.dtype)


class Int8StaticOps(_StaticHandoffMixin, XlaOps):
    """Inference backend: int8 MXU convs with static per-channel scales.

    `act_scales`: {site_name: (C_in,) f32} from `calibrate_act_scales`.
    Sites without a calibrated scale fall back to the dynamic path; tiny
    guidance convs stay float as in all quant backends.
    """

    def __init__(self, act_scales, acc_dtype=jnp.float32, precision=None,
                 compute_dtype=jnp.float32):
        super().__init__(acc_dtype=acc_dtype, precision=precision)
        self.act_scales = {k: jnp.asarray(v, jnp.float32)
                           for k, v in act_scales.items()}
        # float dtype of conv outputs when the input arrives pre-quantized
        # (int8 carries no float dtype to inherit) — set to the model's
        # compute dtype
        self.compute_dtype = compute_dtype

    def conv2d(self, x, w, *, padding="SAME", mask=None, groups=1,
               name=None):
        if _skip_quant(w):
            return super().conv2d(x, w, padding=padding, mask=mask,
                                  groups=groups)
        sc = _site_scale(self.act_scales, name, groups)
        if sc is None:
            if x.dtype == jnp.int8:
                raise ValueError(
                    f"pre-quantized input at uncalibrated site {name!r}")
            out = _int8_conv(x, w, padding=padding, groups=groups,
                             sx=_x_scale(x).astype(jnp.float32))
            return self.apply_mask(out, mask)
        if x.dtype == jnp.int8:
            x8, out_dt = x, self.compute_dtype
        else:
            x8 = quantize_static(x, sc)
            out_dt = (x.dtype if jnp.issubdtype(x.dtype, jnp.floating)
                      else self.compute_dtype)
        w8, sw = _fold_weights(w, sc, groups)
        acc = lax.conv_general_dilated(
            x8, w8, (1, 1), padding, dimension_numbers=_DN,
            feature_group_count=groups,
            preferred_element_type=out_dt)
        return self.apply_mask(acc * sw.astype(out_dt), mask)


class Int8StaticShardedOps(_StaticHandoffMixin, ShardedOps):
    """Spatially-tiled static int8.

    Static scales are position-independent, so no collective is needed at
    all: each shard quantizes on the identical grid by construction, and the
    halo rows are exchanged ALREADY QUANTIZED (1-byte ICI traffic, and the
    neighbor's rows are bit-identical to their home-shard quantization).
    Tiled == untiled up to a few activation LSBs: the float values feeding
    round() carry reduction-order noise (psum'd CAC stats, conv sum order)
    that grid-boundary rounding amplifies to single LSB flips — inherent to
    quantizing after float collectives, and identical for Int8ShardedOps.
    """

    def __init__(self, act_scales, axis_name="sp", acc_dtype=jnp.float32,
                 precision=None, compute_dtype=jnp.float32):
        super().__init__(axis_name=axis_name, acc_dtype=acc_dtype,
                         precision=precision)
        self.act_scales = {k: jnp.asarray(v, jnp.float32)
                           for k, v in act_scales.items()}
        self.compute_dtype = compute_dtype

    def conv2d(self, x, w, *, padding="SAME", mask=None, groups=1,
               name=None):
        if _skip_quant(w):
            return super().conv2d(x, w, padding=padding, mask=mask,
                                  groups=groups)
        kh, kw = w.shape[0], w.shape[1]
        sc = _site_scale(self.act_scales, name, groups)
        wpad = ((0, 0), ((kw - 1) // 2,) * 2)
        if sc is None:
            if x.dtype == jnp.int8:
                raise ValueError(
                    f"pre-quantized input at uncalibrated site {name!r}")
            xh = _halo_exchange_h(x, (kh - 1) // 2, self.axis_name)
            sx = _gathered_sample_scale(x, self.axis_name)
            out = _int8_conv(xh, w, padding=wpad, groups=groups, sx=sx)
            return self.apply_mask(out, mask)
        if x.dtype == jnp.int8:
            x8, out_dt = x, self.compute_dtype
        else:
            x8 = quantize_static(x, sc)
            out_dt = (x.dtype if jnp.issubdtype(x.dtype, jnp.floating)
                      else self.compute_dtype)
        x8h = _halo_exchange_h(x8, (kh - 1) // 2, self.axis_name)
        w8, sw = _fold_weights(w, sc, groups)
        acc = lax.conv_general_dilated(
            x8h, w8, (1, 1), wpad, dimension_numbers=_DN,
            feature_group_count=groups,
            preferred_element_type=out_dt)
        return self.apply_mask(acc * sw.astype(out_dt), mask)


class _StaticFakeQuantMixin:
    """Frozen-grid fake-quant logic shared by FakeQuantStaticOps and its
    sharded twin (static per-channel grids are position-independent, so
    fake-quantizing needs no collective even under spatial sharding)."""

    def roundtrip(self, x, name=None):
        """QAT model of Int8StaticOps.roundtrip: fake-quant on the frozen
        per-channel grid, identity when the site is uncalibrated —
        training sees exactly the rounding deployment applies at the
        gate/stem handoffs.

        PLAIN STE, deliberately not the clipped form conv2d uses: the
        clipped where/stop_gradient pattern produced NaN gradients on the
        TPU stack when the fake-quant output feeds the CAC max-pools
        inside the scan'd stage loop (measured: scan+clipped nan,
        scan+plain finite, unroll+clipped finite — same data, same
        scales; /tmp-bisect 2026-08-17). Plain STE merely forgoes the
        zero-gradient-outside-grid refinement."""
        sc = _site_scale(self.act_scales, name, 1)
        if sc is None:
            return x
        return _fq(x, sc, clipped_ste=False)

    def _fq_site(self, x, w, sc, x_scale=None, groups=1):
        """Fake-quantize (x, w) for one conv site on the frozen grid
        (clipped STE for activations), or the dynamic grid when the site
        is uncalibrated. `x_scale` overrides the dynamic activation scale
        for that fallback (the sharded twin passes the sp-gathered scale
        so tiled == untiled)."""
        if sc is None:
            if x_scale is None:
                x_scale = _x_scale(x).astype(jnp.float32)
            xq = _fq(x, x_scale)
            wq = _fq(w, _w_scales(w)[None, None, None, :])
        else:
            xq = _fq(x, sc, clipped_ste=True)
            # weight grid of the deployed fold: sw_o / s_c per element
            # (group-mapped for grouped convs)
            sk = _scale_per_kernel_input(sc, groups, w.shape[2],
                                         w.shape[3])
            sw = _w_scales(w.astype(jnp.float32) * sk)
            wq = _fq(w, sw[None, None, None, :] / sk)
        return xq, wq


class FakeQuantStaticOps(_StaticFakeQuantMixin, XlaOps):
    """QAT backend for the static grid: frozen per-site scales, clipped STE.

    Numerically simulates Int8StaticOps in float: activations fake-quantize
    on the frozen per-channel grid (gradient zero where the static grid
    CLIPS — unlike dynamic absmax, static scales do clip outliers, and
    letting gradients pass through the clip teaches weights to chase
    unrepresentable values). Weights fake-quantize on the folded grid
    sw_o / s_c — exactly the grid Int8StaticOps deploys.
    """

    def __init__(self, act_scales, acc_dtype=jnp.float32, precision=None):
        super().__init__(acc_dtype=acc_dtype, precision=precision)
        self.act_scales = {k: jnp.asarray(v, jnp.float32)
                           for k, v in act_scales.items()}

    def conv2d(self, x, w, *, padding="SAME", mask=None, groups=1,
               name=None):
        if _skip_quant(w):
            return super().conv2d(x, w, padding=padding, mask=mask,
                                  groups=groups)
        xq, wq = self._fq_site(x, w, _site_scale(self.act_scales, name,
                                                 groups), groups=groups)
        out = conv2d_nhwc(xq, wq, padding=padding, groups=groups,
                          precision=self.precision)
        return self.apply_mask(out, mask)


class FakeQuantShardedOps(ShardedOps):
    """Dynamic-scale QAT under spatial sharding (QAT x mesh training).

    The per-sample scale is all-reduced over the sharded H axis — exactly
    the values _x_scale sees untiled — and fake-quant is elementwise on
    that shared scale, so halo rows exchanged AFTER fake-quant are
    bit-identical to their home-shard values: the sharded QAT step matches
    the single-device FakeQuantOps step (tested in test_train.py).
    """

    def conv2d(self, x, w, *, padding="SAME", mask=None, groups=1,
               name=None):
        del name
        if _skip_quant(w):
            return super().conv2d(x, w, padding=padding, mask=mask,
                                  groups=groups)
        xq = _fq(x, _gathered_sample_scale(x, self.axis_name))
        wq = _fq(w, _w_scales(w)[None, None, None, :].astype(jnp.float32))
        return super().conv2d(xq, wq, padding=padding, mask=mask,
                              groups=groups)


class FakeQuantStaticShardedOps(_StaticFakeQuantMixin, ShardedOps):
    """Frozen-grid QAT under spatial sharding: no scale collective at all
    (static grids are position-independent); the halo-exchange float conv
    runs on fake-quantized tensors, matching FakeQuantStaticOps exactly.
    """

    def __init__(self, act_scales, axis_name="sp", acc_dtype=jnp.float32,
                 precision=None):
        super().__init__(axis_name=axis_name, acc_dtype=acc_dtype,
                         precision=precision)
        self.act_scales = {k: jnp.asarray(v, jnp.float32)
                           for k, v in act_scales.items()}

    def conv2d(self, x, w, *, padding="SAME", mask=None, groups=1,
               name=None):
        if _skip_quant(w):
            return super().conv2d(x, w, padding=padding, mask=mask,
                                  groups=groups)
        sc = _site_scale(self.act_scales, name, groups)
        # uncalibrated-site dynamic fallback: the activation scale must
        # still be shared across shards for tiled == untiled
        xq, wq = self._fq_site(
            x, w, sc,
            x_scale=(None if sc is not None else
                     _gathered_sample_scale(x, self.axis_name)),
            groups=groups)
        return super().conv2d(xq, wq, padding=padding, mask=mask,
                              groups=groups)


class CalibrationOps(XlaOps):
    """Float backend that records per-input-channel absmax per conv site.

    Runs inside jit: `absmax` holds traced (C,) values; return it from the
    traced function to fetch. Padded batches are safe — zero padding never
    raises an absmax.
    """

    def __init__(self, acc_dtype=jnp.float32, precision=None):
        super().__init__(acc_dtype=acc_dtype, precision=precision)
        self.absmax = {}

    def _record(self, name, x):
        am = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(0, 1, 2))
        prev = self.absmax.get(name)
        self.absmax[name] = am if prev is None else jnp.maximum(prev, am)

    def conv2d(self, x, w, *, padding="SAME", mask=None, groups=1,
               name=None):
        # grouped sites record too (under their compound name): the
        # (C_in,) global absmax quantizes grouped convs the same way
        if name is not None and not _skip_quant(w):
            self._record(name, x)
        return super().conv2d(x, w, padding=padding, mask=mask,
                              groups=groups)

    def roundtrip(self, x, name=None):
        """Record the handoff site's per-channel absmax so new
        calibrations ship gate/stem grids (activating the int8 handoff
        in the static backends)."""
        if name is not None:
            self._record(name, x)
        return x


def calibrate_act_scales(forward, params, batches):
    """Per-site per-channel static scales from full-frame forwards.

    forward(params, depth, color, ops=..., mask=...) — a variant forward.
    batches: iterable of (depth, color, mask_or_None).
    Returns {site: (C_in,) float32 numpy} with scale = absmax / 127.
    """
    import numpy as np

    import jax

    def f(p, d, c, m):
        ops = CalibrationOps()
        forward(p, d, c, ops=ops, mask=m)
        return ops.absmax

    jf = jax.jit(f)
    acc: dict = {}
    for depth, color, m in batches:
        am = jax.device_get(jf(params, depth, color, m))
        for k, v in am.items():
            acc[k] = v if k not in acc else np.maximum(acc[k], v)
    return {k: (np.maximum(v, 1e-8) / 127.0).astype(np.float32)
            for k, v in acc.items()}
