"""W8A8 static-quantized CODONNet inference.

The v5e MXU runs int8 convs at ~1.6x the bf16 rate with the requantize
epilogue fused (measured: 15.1ms -> 9.2ms for the dominant 5x5/128 conv at
b16). This module adds an opt-in quantized inference path:

  calibrate()        bf16 forward instrumented to record per-tensor absmax
                     at every quantization point, maxed over a calibration
                     set (the bundled images).
  quantize_params()  weights -> per-tensor symmetric int8 (+ scales).
  forward_w8a8()     all 19 convs in int8 x int8 -> int32; CAC gates,
                     residual adds and the head stay bf16/f32 (negligible
                     FLOPs, precision-critical).

Activation scale points (per MC stage i / fusion stage j, since conv
weights are shared but activation ranges differ per stage):
  out{i}, outc{i}       stage inputs (post residual add)
  dcat{i}, ccat{i}      cell concats (both halves share one scale)
  d3{i}, c6{i}          post-relu conv3/conv6 outputs (confuse inputs)
  fuse_in{j}, fcat{j}, f10{j}, head_in, head_mid
Quality is validated against the fp/bf16 path on the bundled set
(eval --dtype int8; see tests/test_quant.py for the mechanics).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")
_CONVS = ["input", "conv_input", "conv1", "conv2", "conv3", "confuse",
          "input_c", "conv_input_c", "conv4", "conv5", "conv6", "confuse_c",
          "conv7", "conv8", "conv9", "conv10", "confuse_fuse", "conv11",
          "output"]


def _absmax(t):
    """Activation range for calibration. absmax, deliberately: percentile
    clipping was measured WORSE on RMSE (depth discontinuities are the
    outliers and they carry the signal)."""
    return jnp.max(jnp.abs(t)).astype(jnp.float32)


def _stages(cfg):
    return range(cfg.num_mc), range(cfg.num_fuse)


def calibrate_batch(params, depth, color, cfg):
    """One bf16 forward returning {scale_point: absmax} for a batch."""
    from codon_tpu.models.codon_net import (cac_channel_gate,
                                            cac_spatial_gate)
    from codon_tpu.core.ops import XlaOps

    ops = XlaOps()
    relu = jax.nn.relu
    conv = lambda n, t: ops.conv2d(t, params[n].astype(t.dtype))
    stats: Dict[str, jax.Array] = {}

    x = depth.astype(jnp.bfloat16)
    y = color.astype(jnp.bfloat16)
    stats["in"] = _absmax(x)
    inputs = relu(conv("conv_input", relu(conv("input", x))))
    inputs_c = relu(conv("conv_input_c", relu(conv("input_c", y))))
    # stems' intermediate
    stats["stem_mid"] = jnp.maximum(_absmax(relu(conv("input", x))),
                                    _absmax(relu(conv("input_c", y))))
    out, out_c = inputs, inputs_c
    cac = params["cac"]
    mc_r, fu_r = _stages(cfg)
    for i in mc_r:
        stats[f"out{i}"] = _absmax(out)
        stats[f"outc{i}"] = _absmax(out_c)
        a1, a2 = relu(conv("conv1", out)), relu(conv("conv2", out))
        b1, b2 = relu(conv("conv4", out_c)), relu(conv("conv5", out_c))
        stats[f"dcat{i}"] = jnp.maximum(_absmax(a1), _absmax(a2))
        stats[f"ccat{i}"] = jnp.maximum(_absmax(b1), _absmax(b2))
        d3 = relu(conv("conv3", jnp.concatenate([a1, a2], -1)))
        c6 = relu(conv("conv6", jnp.concatenate([b1, b2], -1)))
        stats[f"d3_{i}"] = _absmax(d3)
        stats[f"c6_{i}"] = _absmax(c6)
        out = conv("confuse", d3)
        out_c = conv("confuse_c", c6)
        fcat = (out_c, out)
        ch = cac_channel_gate(fcat, cac["ch_w1"][i], cac["ch_b1"][i],
                              cac["ch_w2"][i], cac["ch_b2"][i], ops)
        sp = cac_spatial_gate(fcat, cac["sp_w"][i], ops)
        ad = ch * sp
        out = out * ad + inputs
        out_c = out_c * ad + inputs_c
    fuse = relu(conv("conv7", jnp.concatenate([out, out_c], -1)))
    stats["out_last"] = _absmax(out)
    stats["outc_last"] = _absmax(out_c)
    out_f = fuse
    for j in fu_r:
        stats[f"fuse_in{j}"] = _absmax(out_f)
        f1, f2 = relu(conv("conv8", out_f)), relu(conv("conv9", out_f))
        stats[f"fcat{j}"] = jnp.maximum(_absmax(f1), _absmax(f2))
        f10 = relu(conv("conv10", jnp.concatenate([f1, f2], -1)))
        stats[f"f10_{j}"] = _absmax(f10)
        out_f = conv("confuse_fuse", f10) + fuse
    stats["head_in"] = _absmax(out_f)
    stats["head_mid"] = _absmax(relu(conv("conv11", out_f)))
    return stats


def calibrate(params, batches, cfg) -> Dict[str, float]:
    """Max of calibrate_batch over an iterable of (depth, color) batches."""
    fn = jax.jit(lambda d, c: calibrate_batch(params, d, c, cfg))
    agg: Dict[str, float] = {}
    for depth, color in batches:
        stats = jax.device_get(fn(depth, color))
        for k, v in stats.items():
            agg[k] = max(agg.get(k, 0.0), float(v))
    return agg


# Edge convs stay bf16: stems see the raw input and the head produces the
# residual delta (tiny values — int8 error lands directly on the output).
# They are also the cheapest convs in the net (1<->64 channels).
_FLOAT_CONVS = {"input", "input_c", "conv11", "output"}


def quantize_params(params) -> Tuple[dict, Dict[str, jnp.ndarray]]:
    """Per-OUTPUT-CHANNEL symmetric int8 weights + scale vectors."""
    q, w_scales = {}, {}
    for name in _CONVS:
        w = np.asarray(params[name], np.float32)
        if name in _FLOAT_CONVS:
            q[name] = jnp.asarray(w)
            continue
        s = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12) / 127.0
        q[name] = jnp.asarray(
            np.clip(np.round(w / s[None, None, None, :]), -127, 127)
            .astype(np.int8))
        w_scales[name] = jnp.asarray(s, jnp.float32)   # (Cout,)
    q["cac"] = params["cac"]     # gates stay float
    return q, w_scales


def _qconv(x_i8, w_i8, sx, sw):
    """int8 x int8 -> int32 conv; returns float32.

    sw: per-output-channel scale vector (Cout,)."""
    acc = lax.conv_general_dilated(
        x_i8, w_i8, (1, 1), "SAME", dimension_numbers=_DN,
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (sx * sw[None, None, None, :])


def _fconv(x, w):
    """bf16 conv for the precision-critical edge layers."""
    return lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=_DN).astype(jnp.float32)


def _rq(f, scale):
    """float -> int8 at activation scale (relu already applied)."""
    return jnp.clip(jnp.round(f * (1.0 / scale)), -127, 127
                    ).astype(jnp.int8)


def forward_w8a8(qparams, w_scales, a_scales, depth, color, cfg):
    """Quantized CODONNet forward. Returns float32 (N,H,W,1)."""
    from codon_tpu.models.codon_net import (cac_channel_gate,
                                            cac_spatial_gate)
    from codon_tpu.core.ops import XlaOps

    ops = XlaOps()
    relu = jax.nn.relu
    s = lambda k: a_scales[k] / 127.0
    qw = lambda n: qparams[n]
    sw = lambda n: w_scales[n]

    x = depth.astype(jnp.float32)
    residual = x
    # stems: first conv bf16 (raw-input precision), second int8
    sm = relu(_fconv(x, qw("input")))
    inputs = relu(_qconv(_rq(sm, s("stem_mid")), qw("conv_input"),
                         s("stem_mid"), sw("conv_input")))
    smc = relu(_fconv(color.astype(jnp.float32), qw("input_c")))
    inputs_c = relu(_qconv(_rq(smc, s("stem_mid")), qw("conv_input_c"),
                           s("stem_mid"), sw("conv_input_c")))
    out, out_c = inputs, inputs_c
    cac = qparams["cac"]

    mc_r, fu_r = _stages(cfg)
    for i in mc_r:
        o8 = _rq(out, s(f"out{i}"))
        oc8 = _rq(out_c, s(f"outc{i}"))
        a1 = relu(_qconv(o8, qw("conv1"), s(f"out{i}"), sw("conv1")))
        a2 = relu(_qconv(o8, qw("conv2"), s(f"out{i}"), sw("conv2")))
        b1 = relu(_qconv(oc8, qw("conv4"), s(f"outc{i}"), sw("conv4")))
        b2 = relu(_qconv(oc8, qw("conv5"), s(f"outc{i}"), sw("conv5")))
        dcat = jnp.concatenate([_rq(a1, s(f"dcat{i}")),
                                _rq(a2, s(f"dcat{i}"))], -1)
        ccat = jnp.concatenate([_rq(b1, s(f"ccat{i}")),
                                _rq(b2, s(f"ccat{i}"))], -1)
        d3 = relu(_qconv(dcat, qw("conv3"), s(f"dcat{i}"), sw("conv3")))
        c6 = relu(_qconv(ccat, qw("conv6"), s(f"ccat{i}"), sw("conv6")))
        out = _qconv(_rq(d3, s(f"d3_{i}")), qw("confuse"),
                     s(f"d3_{i}"), sw("confuse"))
        out_c = _qconv(_rq(c6, s(f"c6_{i}")), qw("confuse_c"),
                       s(f"c6_{i}"), sw("confuse_c"))
        # gates + residual in float
        fcat = (out_c, out)
        ch = cac_channel_gate(fcat, cac["ch_w1"][i], cac["ch_b1"][i],
                              cac["ch_w2"][i], cac["ch_b2"][i], ops)
        sp = cac_spatial_gate(fcat, cac["sp_w"][i], ops, impl="stencil")
        ad = ch * sp
        out = out * ad + inputs
        out_c = out_c * ad + inputs_c

    # both halves must share one scale for the int8 concat
    s_cat = max(a_scales["out_last"], a_scales["outc_last"]) / 127.0
    cat_in = jnp.concatenate([_rq(out, s_cat), _rq(out_c, s_cat)], -1)
    fuse = relu(_qconv(cat_in, qw("conv7"), s_cat, sw("conv7")))
    out_f = fuse
    for j in fu_r:
        fi8 = _rq(out_f, s(f"fuse_in{j}"))
        f1 = relu(_qconv(fi8, qw("conv8"), s(f"fuse_in{j}"), sw("conv8")))
        f2 = relu(_qconv(fi8, qw("conv9"), s(f"fuse_in{j}"), sw("conv9")))
        fcat8 = jnp.concatenate([_rq(f1, s(f"fcat{j}")),
                                 _rq(f2, s(f"fcat{j}"))], -1)
        f10 = relu(_qconv(fcat8, qw("conv10"), s(f"fcat{j}"),
                          sw("conv10")))
        out_f = _qconv(_rq(f10, s(f"f10_{j}")), qw("confuse_fuse"),
                       s(f"f10_{j}"), sw("confuse_fuse")) + fuse
    # head in bf16: the output conv produces the residual DELTA (small
    # values); int8 error here lands directly on the depth map
    hm = relu(_fconv(out_f, qw("conv11")))
    head = _fconv(hm, qw("output"))
    return (head + residual).astype(jnp.float32)


# ---------------------------------------------------------------------------
# frozen-scale QAT: train float params against the EXACT static-int8 grid
# ---------------------------------------------------------------------------

def _ste(t, q):
    """Straight-through: forward q, gradient of t."""
    return t + lax.stop_gradient(q - t)


def _fq_act(f, scale):
    q = jnp.clip(jnp.round(f * (1.0 / scale)), -127, 127) * scale
    return _ste(f, q)


def _fq_w(w):
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / s), -127, 127) * s
    return _ste(w, q)


def forward_w8a8_fake(params, a_scales, depth, color, cfg):
    """STE twin of forward_w8a8: float convs over the SAME quantization
    grid the static int8 path uses (fixed calibrated activation scales,
    per-channel weight scales). Fine-tuning against this makes the fast
    static path (forward_w8a8) hold quality at inference."""
    from codon_tpu.models.codon_net import (cac_channel_gate,
                                            cac_spatial_gate)
    from codon_tpu.core.ops import XlaOps

    ops = XlaOps()
    relu = jax.nn.relu
    s = lambda k: a_scales[k] / 127.0
    conv = lambda w, t: lax.conv_general_dilated(
        t, w.astype(t.dtype), (1, 1), "SAME", dimension_numbers=_DN)
    qconv = lambda w, t, sk: conv(_fq_w(w), _fq_act(t, s(sk)))

    x = depth.astype(jnp.float32)
    residual = x
    sm = relu(conv(params["input"], x))
    inputs = relu(qconv(params["conv_input"], sm, "stem_mid"))
    smc = relu(conv(params["input_c"], color.astype(jnp.float32)))
    inputs_c = relu(qconv(params["conv_input_c"], smc, "stem_mid"))
    out, out_c = inputs, inputs_c
    cac = params["cac"]
    mc_r, fu_r = _stages(cfg)
    for i in mc_r:
        a1 = relu(qconv(params["conv1"], out, f"out{i}"))
        a2 = relu(qconv(params["conv2"], out, f"out{i}"))
        b1 = relu(qconv(params["conv4"], out_c, f"outc{i}"))
        b2 = relu(qconv(params["conv5"], out_c, f"outc{i}"))
        dcat = jnp.concatenate([_fq_act(a1, s(f"dcat{i}")),
                                _fq_act(a2, s(f"dcat{i}"))], -1)
        ccat = jnp.concatenate([_fq_act(b1, s(f"ccat{i}")),
                                _fq_act(b2, s(f"ccat{i}"))], -1)
        d3 = relu(conv(_fq_w(params["conv3"]), dcat))
        c6 = relu(conv(_fq_w(params["conv6"]), ccat))
        out = qconv(params["confuse"], d3, f"d3_{i}")
        out_c = qconv(params["confuse_c"], c6, f"c6_{i}")
        fcat = (out_c, out)
        ch = cac_channel_gate(fcat, cac["ch_w1"][i], cac["ch_b1"][i],
                              cac["ch_w2"][i], cac["ch_b2"][i], ops)
        sp = cac_spatial_gate(fcat, cac["sp_w"][i], ops, impl="stencil")
        ad = ch * sp
        out = out * ad + inputs
        out_c = out_c * ad + inputs_c
    s_cat = max(a_scales["out_last"], a_scales["outc_last"]) / 127.0
    cat_in = jnp.concatenate([_fq_act(out, s_cat),
                              _fq_act(out_c, s_cat)], -1)
    fuse = relu(conv(_fq_w(params["conv7"]), cat_in))
    out_f = fuse
    for j in fu_r:
        f1 = relu(qconv(params["conv8"], out_f, f"fuse_in{j}"))
        f2 = relu(qconv(params["conv9"], out_f, f"fuse_in{j}"))
        fcat8 = jnp.concatenate([_fq_act(f1, s(f"fcat{j}")),
                                 _fq_act(f2, s(f"fcat{j}"))], -1)
        f10 = relu(conv(_fq_w(params["conv10"]), fcat8))
        out_f = qconv(params["confuse_fuse"], f10, f"f10_{j}") + fuse
    hm = relu(conv(params["conv11"], out_f))
    head = conv(params["output"], hm)
    return (head + residual).astype(jnp.float32)


def save_scales(path, a_scales):
    np.savez(path, **{k: np.float32(v) for k, v in a_scales.items()})


def load_scales(path):
    data = np.load(path)
    return {k: float(data[k]) for k in data.files}
