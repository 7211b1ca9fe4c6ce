"""The ablation-network zoo — every BaseNet_* variant of the reference.

The reference ships these as ~23 copy-pasted classes in one 3395-line file
(/root/reference/CODON_X4/base_net_withoutBN.py; catalog in SURVEY.md §2.2).
Here each variant is a (param-spec, forward) pair built from shared family
machinery; parameters are FLAT dicts keyed by the reference's torch names
(TPU layouts), so torch state dicts convert mechanically and parity tests
run against the oracle directly.

Reference quirks reproduced deliberately (they live in shipped checkpoints):
  * `fuse * ChannelGate(fuse)` double-multiplication — ResCBAM's ChannelGate
    returns x*scale and the nets multiply AGAIN (e.g. :1185-1186, :2301-2302)
  * RCAN cross-overwrite: `out = att_c(out_c); out_c = att_d(out)` uses the
    NEW depth tensor, and stage 4 reuses stage-3 gates (:2971-2985)
  * ECCV multiplies towers by CBAM OUTPUTS (not scales) (:2865-2889)
  * dead parameters (unused attention heads, pa/ca modules, SEPNON conv6/7)
    are materialized so state dicts round-trip

Variant line ranges are cited per entry. Forward order of ops follows the
reference statement-for-statement (including cat orders, which differ
between families: CAC nets cat color-first, Cross nets cat depth-first).
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from codon_tpu.core.ops import XlaOps
from codon_tpu.core.params import FP32
from codon_tpu.models import attention as A


# ---------------------------------------------------------------------------
# parameter-spec machinery
# ---------------------------------------------------------------------------

def _init_flat(key, spec: Dict[str, tuple], dtype=jnp.float32):
    """spec: name -> ("conv",kh,cin,cout) | ("convb",kh,cin,cout) |
    ("linear",cin,cout) | ("zeros",shape) | ("ones",shape) |
    ("conv_zeros",kh,cin,cout,groups)."""
    params = {}
    keys = jax.random.split(key, max(2, len(spec)))
    for i, (name, s) in enumerate(sorted(spec.items())):
        k = keys[i % len(keys)]
        kind = s[0]
        if kind in ("conv", "convb"):
            _, kh, cin, cout = s
            std = math.sqrt(2.0 / (kh * kh * cout))
            params[f"{name}.weight"] = std * jax.random.normal(
                k, (kh, kh, cin, cout), dtype)
            if kind == "convb":
                bound = 1.0 / math.sqrt(cin * kh * kh)
                params[f"{name}.bias"] = jax.random.uniform(
                    k, (cout,), dtype, -bound, bound)
        elif kind == "conv_zeros":
            _, kh, cin, cout, groups = s
            params[f"{name}.weight"] = jnp.zeros(
                (kh, kh, cin // groups, cout), dtype)
        elif kind == "linear":
            _, cin, cout = s
            bound = 1.0 / math.sqrt(cin)
            k1, k2 = jax.random.split(k)
            params[f"{name}.weight"] = jax.random.uniform(
                k1, (cin, cout), dtype, -bound, bound)
            params[f"{name}.bias"] = jax.random.uniform(
                k2, (cout,), dtype, -bound, bound)
        elif kind == "zeros":
            params[name] = jnp.zeros(s[1], dtype)
        elif kind == "ones":
            params[name] = jnp.ones(s[1], dtype)
        else:
            raise ValueError(kind)
    return params


def _spec_channel_gate(spec, prefix, c, reduction):
    spec[f"{prefix}.mlp.1"] = ("linear", c, c // reduction)
    spec[f"{prefix}.mlp.3"] = ("linear", c // reduction, c)


def _spec_cac_channel(spec, prefix, c=128, reduction=16):
    spec[f"{prefix}.mlp.1"] = ("linear", c, c // reduction)
    spec[f"{prefix}.mlp.3"] = ("linear", c // reduction, c // 2)


def _spec_spatial_gate(spec, prefix, k=5):
    spec[f"{prefix}.spatial.conv"] = ("conv", k, 2, 1)


def _spec_rescbam(spec, prefix, c=64, reduction=8):
    _spec_channel_gate(spec, f"{prefix}.ChannelGate", c, reduction)
    _spec_spatial_gate(spec, f"{prefix}.SpatialGate")


def _spec_cbam(spec, prefix, c=64, reduction=16):
    _spec_channel_gate(spec, f"{prefix}.ChannelGate", c, reduction)
    _spec_spatial_gate(spec, f"{prefix}.SpatialGate")


def _spec_ca(spec, prefix, c=64, reduction=16):  # wechat_2.CA interp
    _spec_channel_gate(spec, prefix, c, reduction)


def _spec_calayer(spec, prefix, c=64, reduction=16):
    spec[f"{prefix}.conv_du.0"] = ("convb", 1, c, c // reduction)
    spec[f"{prefix}.conv_du.2"] = ("convb", 1, c // reduction, c)


def _spec_pam(spec, prefix, c):
    spec[f"{prefix}.query_conv"] = ("convb", 1, c, c // 8)
    spec[f"{prefix}.key_conv"] = ("convb", 1, c, c // 8)
    spec[f"{prefix}.value_conv"] = ("convb", 1, c, c)
    spec[f"{prefix}.gamma"] = ("zeros", (1,))


def _spec_cam(spec, prefix):
    spec[f"{prefix}.gamma"] = ("zeros", (1,))


def _spec_cgnl(spec, prefix, c=64, planes=32, groups=8):
    for n in ("t", "p", "g"):
        spec[f"{prefix}.{n}"] = ("conv", 1, c, planes)
    spec[f"{prefix}.z"] = ("conv_zeros", 1, planes, c, groups)
    spec[f"{prefix}.gn.weight"] = ("ones", (c,))
    spec[f"{prefix}.gn.bias"] = ("zeros", (c,))


def _spec_unrolled_backbone():
    spec = {"input": ("conv", 3, 1, 64), "conv_input": ("conv", 3, 64, 64),
            "input_c": ("conv", 3, 1, 64), "conv_inputc": ("conv", 3, 64, 64),
            "output": ("conv", 3, 64, 1),
            "conv11": ("conv", 3, 128, 64)}
    for i in range(1, 11):
        spec[f"conv{i}_1"] = ("conv", 3, 64, 64)
        spec[f"conv{i}_2"] = ("conv", 3, 64, 64)
    for i in range(12, 19):
        spec[f"conv{i}"] = ("conv", 3, 64, 64)
    return spec


def _spec_mc_backbone(fusion: str = "mc"):
    spec = {"input": ("conv", 3, 1, 64), "conv_input": ("conv", 3, 64, 64),
            "conv1": ("conv", 3, 64, 64), "conv2": ("conv", 5, 64, 64),
            "conv3": ("conv", 5, 128, 128), "confuse": ("conv", 1, 128, 64),
            "input_c": ("conv", 3, 1, 64),
            "conv_input_c": ("conv", 3, 64, 64),
            "conv4": ("conv", 5, 64, 64), "conv5": ("conv", 3, 64, 64),
            "conv6": ("conv", 5, 128, 128), "confuse_c": ("conv", 1, 128, 64),
            "conv7": ("conv", 3, 128, 64), "output": ("conv", 3, 64, 1)}
    if fusion == "mc":
        spec.update({"conv8": ("conv", 5, 64, 64), "conv9": ("conv", 3, 64, 64),
                     "conv10": ("conv", 5, 128, 128),
                     "confuse_fuse": ("conv", 1, 128, 64),
                     "conv11": ("conv", 3, 64, 64)})
    else:  # plain 2-conv fusion (BaseNet_RMCR :779-782)
        spec.update({"conv8": ("conv", 3, 64, 64), "conv9": ("conv", 3, 64, 64),
                     "conv10": ("conv", 3, 64, 64)})
    return spec


def _spec_cac_stack(spec, with_c5=True):
    for i in range(5):
        _spec_cac_channel(spec, f"attention_c{i}")
        _spec_spatial_gate(spec, f"attention_s{i}")
    if with_c5:
        _spec_channel_gate(spec, "attention_c5", 64, 16)
        _spec_spatial_gate(spec, "attention_s5")


# ---------------------------------------------------------------------------
# family forwards
# ---------------------------------------------------------------------------

def _prep(depth, color, mask, dtypes, ops):
    if ops is None:
        ops = XlaOps(acc_dtype=dtypes.acc_dtype, precision=dtypes.precision)
    cdt = dtypes.compute_dtype
    x, y = depth.astype(cdt), color.astype(cdt)
    if mask is not None:
        mask = mask.astype(cdt)
        x, y = x * mask, y * mask
    return x, y, mask, ops


def _fuse_chain(p, fuse, ops, mask, hook17=None):
    """conv12..conv18 chain; optional attention after conv17 output."""
    relu = jax.nn.relu
    c = lambda n, t: A.conv_p(p, n, t, ops, mask)
    f1 = relu(c("conv13", relu(c("conv12", fuse))))
    f2 = relu(c("conv15", relu(c("conv14", f1))))
    f3 = relu(c("conv17", relu(c("conv16", f2))))
    if hook17 is not None:
        f3 = hook17(f3)
    return relu(c("conv18", f3))


def _fuse_gate_c5s5(p, fuse, ops, mask):
    """fuse = fuse*(ChannelGate out) -> *spatial scale -> +res (:1184-1188)."""
    res = fuse
    fuse = fuse * A.channel_gate(p, "attention_c5", fuse, ops, mask,
                                 ("avg", "max"))
    fuse = fuse * A.spatial_gate_scale(p, "attention_s5", fuse, ops, mask)
    return fuse + res


def unrolled_forward(p, depth, color, *, dtypes=FP32, ops=None, mask=None,
                     tower_att=None, cat_order="dc", stage_gate=None,
                     fuse_att=None, cat_att=False):
    """Unrolled 10-conv dual towers (BaseNet family, :174-1790).

    tower_att: None | (fn_d, fn_c, fn_fuse, fuse_pos) applied at tower ends
               and in the fusion chain; fuse_pos in {"conv11", "conv17"}.
    cat_order: "dc" depth-first | "cd" color-first fusion concat.
    stage_gate: None | "seq" | "seq_nores" | "par" | "par_res" — the Cross
                family per-2-conv cross gates.
    fuse_att: None | "c5s5" post-conv11 gate.
    cat_att: non_cat style — attention output concatenated + 1x1 reduced.
    """
    x, y, mask, ops = _prep(depth, color, mask, dtypes, ops)
    relu = jax.nn.relu
    c = lambda n, t: A.conv_p(p, n, t, ops, mask)

    residual = x
    out_d = relu(c("conv_input", relu(c("input", x))))
    out_c = relu(c("conv_inputc", relu(c("input_c", y))))

    if stage_gate is None:
        for i in range(1, 11):
            out_d = relu(c(f"conv{i}_1", out_d))
        for i in range(1, 11):
            out_c = relu(c(f"conv{i}_2", out_c))
    else:
        # interleaved pairs with a cross gate after convs (2,4,6,8,10)
        for s in range(5):
            i1, i2 = 2 * s + 1, 2 * s + 2
            out_d = relu(c(f"conv{i1}_1", out_d))
            out_c = relu(c(f"conv{i1}_2", out_c))
            out_d = relu(c(f"conv{i2}_1", out_d))
            out_c = relu(c(f"conv{i2}_2", out_c))
            res_d, res_c = out_d, out_c
            fcat = (out_d, out_c)          # depth-first (:1272)
            if stage_gate in ("seq", "seq_nores"):
                # CAC_channel: half-width gate from the 128-ch cat
                ch = _cac_half_gate(p, f"attention_c{s}", fcat, ops, mask)
                out_d, out_c = out_d * ch, out_c * ch
                sp = A.spatial_gate_scale(p, f"attention_s{s}",
                                          (out_d, out_c), ops, mask)
                out_d, out_c = out_d * sp, out_c * sp
            else:  # "par" / "par_res": parallel mask (advise1, :1579-1584)
                ch = _cac_half_gate(p, f"attention_c{s}", fcat, ops, mask)
                sp = A.spatial_gate_scale(p, f"attention_s{s}", fcat, ops,
                                          mask)
                ad = ch * sp
                out_d, out_c = out_d * ad, out_c * ad
            if stage_gate in ("seq", "par_res"):
                out_d, out_c = out_d + res_d, out_c + res_c

    if tower_att is not None:
        fn_d, fn_c, fn_f, fuse_pos = tower_att
        if cat_att:
            ad = fn_d(out_d, ops, mask)
            out_d = c("concat_d", jnp.concatenate([out_d, ad], -1))
            ac = fn_c(out_c, ops, mask)
            out_c = c("concat_c", jnp.concatenate([out_c, ac], -1))
        else:
            out_d = fn_d(out_d, ops, mask)
            out_c = fn_c(out_c, ops, mask)

    pair = (out_d, out_c) if cat_order == "dc" else (out_c, out_d)
    fuse = relu(c("conv11", jnp.concatenate(pair, -1)))

    hook17 = None
    if fuse_att == "c5s5":
        fuse = _fuse_gate_c5s5(p, fuse, ops, mask)
    if tower_att is not None:
        fn_d, fn_c, fn_f, fuse_pos = tower_att
        if fn_f is not None:
            if cat_att:
                af = fn_f(fuse, ops, mask)
                fuse = c("concat_fuse", jnp.concatenate([fuse, af], -1))
            elif fuse_pos == "conv11":
                fuse = fn_f(fuse, ops, mask)
            else:
                hook17 = lambda t: fn_f(t, ops, mask)

    out = _fuse_chain(p, fuse, ops, mask, hook17)
    return (c("output", out) + residual).astype(jnp.float32)


# wechat_guide.ChannelGate == CAC_channel (128-cat -> 64-wide scale) is
# exactly attention.channel_gate_scale; keep ONE implementation
_cac_half_gate = A.channel_gate_scale


def mc_forward(p, depth, color, *, dtypes=FP32, ops=None, mask=None,
               towers="sequential", stage_gate=None, fusion="mc",
               tower_att=None, fusion_att=None, fuse_gate=False):
    """MC-cell dual-tower family (RMCR/fuseRMCR/cross*, :759-3395).

    towers: "sequential" | "interleaved".
    stage_gate (interleaved only): None | "cac_par" | "cac_seq" |
        "cac_seq_fused" | "cac_par2" | "cac_s" | "cac_c" | "cbam_tower" |
        "rcan_cross" | "ca_sa_depth" | "ca_sa_depth_c".
    fusion: "mc" | "plain".
    tower_att / fusion_att: optional fns (RMCR_NLAR CGNL heads).
    fuse_gate: post-conv7 c5/s5 gate (cross/cross2/cross3).
    """
    x, y, mask, ops = _prep(depth, color, mask, dtypes, ops)
    relu = jax.nn.relu
    c = lambda n, t: A.conv_p(p, n, t, ops, mask)

    residual = x
    inputs_d = relu(c("conv_input", relu(c("input", x))))
    inputs_c = relu(c("conv_input_c", relu(c("input_c", y))))

    def d_cell(t):
        cat = jnp.concatenate([relu(c("conv1", t)), relu(c("conv2", t))], -1)
        return c("confuse", relu(c("conv3", cat)))

    def c_cell(t):
        cat = jnp.concatenate([relu(c("conv4", t)), relu(c("conv5", t))], -1)
        return c("confuse_c", relu(c("conv6", cat)))

    if towers == "sequential":
        out_d = inputs_d
        for _ in range(5):
            out_d = d_cell(out_d) + inputs_d
        out_c = inputs_c
        for _ in range(5):
            out_c = c_cell(out_c) + inputs_c
    else:
        out_d, out_c = inputs_d, inputs_c
        for i in range(5):
            nd, nc = d_cell(out_d), c_cell(out_c)
            out_d, out_c = nd, nc
            fcat = (out_c, out_d)            # color-first (:2107,:2511...)
            if stage_gate == "cac_par":      # == CODONNet
                ch = _cac_half_gate(p, f"attention_c{i}", fcat, ops, mask)
                sp = A.spatial_gate_scale(p, f"attention_s{i}", fcat, ops,
                                          mask)
                ad = ch * sp
                out_d, out_c = out_d * ad, out_c * ad
            elif stage_gate == "cac_par2":   # advise1_parall (:2512-2561)
                ch = _cac_half_gate(p, f"attention_c{i}", fcat, ops, mask)
                sp = A.spatial_gate_scale(p, f"attention_s{i}", fcat, ops,
                                          mask)
                ch1 = _cac_half_gate(p, f"attention_c{i}1", fcat, ops, mask)
                sp1 = A.spatial_gate_scale(p, f"attention_s{i}1", fcat, ops,
                                           mask)
                out_d = out_d * (ch * sp)
                out_c = out_c * (ch1 * sp1)
            elif stage_gate in ("cac_seq", "cac_seq_fused"):
                ch = _cac_half_gate(p, f"attention_c{i}", fcat, ops, mask)
                out_c, out_d = out_c * ch, out_d * ch
                fcat2 = (out_c, out_d)
                sp = A.spatial_gate_scale(p, f"attention_s{i}", fcat2, ops,
                                          mask)
                out_c, out_d = out_c * sp, out_d * sp
                if stage_gate == "cac_seq_fused":   # advise2 (:2116-2118)
                    ad = ch * sp
                    out_c, out_d = out_c * ad, out_d * ad
            elif stage_gate == "cac_s":
                sp = A.spatial_gate_scale(p, f"attention_s{i}", fcat, ops,
                                          mask)
                out_d, out_c = out_d * sp, out_c * sp
            elif stage_gate == "cac_c":
                ch = _cac_half_gate(p, f"attention_c{i}", fcat, ops, mask)
                out_d, out_c = out_d * ch, out_c * ch
            elif stage_gate == "cbam_tower":     # ECCV (:2865-2889)
                att_c = A.cbam(p, f"attention_c{i}", out_c, ops, mask)
                att_d = A.cbam(p, f"attention_d{i}", out_d, ops, mask)
                out_d = out_d * att_d
                out_c = out_c * att_c
            elif stage_gate == "rcan_cross":     # RCAN (:2971-2985)
                j = min(i, 3)                    # stage 4 reuses stage-3!
                new_d = A.ca_layer(p, f"attention_c{j}", out_c, ops, mask)
                new_c = A.ca_layer(p, f"attention_d{j}", new_d, ops, mask)
                out_d, out_c = new_d, new_c
            elif stage_gate in ("ca_sa_depth", "ca_sa_depth_c"):
                # cross2/cross3 (:3204-3238, :3338-3372): gates from depth
                ch = A.channel_gate_scale(p, f"attention_c{i}", out_d, ops,
                                          mask)
                if stage_gate == "ca_sa_depth_c":
                    out_c = out_c * A.channel_gate_scale(
                        p, f"attention_c{i}_c", out_c, ops, mask)
                else:
                    out_c = out_c * ch
                out_d = out_d * ch
                sp = A.spatial_gate_scale(p, f"attention_s{i}", out_d, ops,
                                          mask)
                out_c, out_d = out_c * sp, out_d * sp
            out_c = out_c + inputs_c
            out_d = out_d + inputs_d

    if tower_att is not None:
        out_d = tower_att[0](out_d, ops, mask)
        out_c = tower_att[1](out_c, ops, mask)

    fuse = relu(c("conv7", jnp.concatenate([out_d, out_c], -1)))

    if fuse_gate == "c5s5":                      # cross (:2300-2304)
        fuse = _fuse_gate_c5s5(p, fuse, ops, mask)
    elif fuse_gate == "ca_sa":                   # cross2/3 (:3244-3248)
        res = fuse
        fuse = fuse * A.channel_gate_scale(p, "attention_c5", fuse, ops,
                                           mask)
        fuse = fuse * A.spatial_gate_scale(p, "attention_s5", fuse, ops,
                                           mask)
        fuse = fuse + res

    out_f = fuse
    if fusion == "mc":
        for _ in range(3):
            cat = jnp.concatenate([relu(c("conv8", out_f)),
                                   relu(c("conv9", out_f))], -1)
            out_f = c("confuse_fuse", relu(c("conv10", cat))) + fuse
        if fusion_att is not None:
            out_f = fusion_att(out_f, ops, mask)
        out = relu(c("conv11", out_f))
    else:
        for _ in range(3):
            out_f = relu(c("conv9", relu(c("conv8", out_f)))) + fuse
        if fusion_att is not None:
            out_f = fusion_att(out_f, ops, mask)
        out = relu(c("conv10", out_f))

    return (c("output", out) + residual).astype(jnp.float32)


# ---------------------------------------------------------------------------
# variant registry
# ---------------------------------------------------------------------------

ZOO: Dict[str, dict] = {}


def _entry(name, spec_fn, forward_fn, doc):
    ZOO[name] = {"spec": spec_fn, "forward": forward_fn, "doc": doc}


def zoo_init(name, key, dtype=jnp.float32):
    return _init_flat(key, ZOO[name]["spec"](), dtype)


def zoo_forward(name, params, depth, color, *, dtypes=FP32, ops=None,
                mask=None):
    return ZOO[name]["forward"](params, depth, color, dtypes=dtypes,
                                ops=ops, mask=mask)


def list_zoo():
    return sorted(ZOO)


# ---- unrolled family ------------------------------------------------------

def _spec_basenet():
    return _spec_unrolled_backbone()


def _fwd_basenet(p, d, c, **kw):
    return unrolled_forward(p, d, c, cat_order="dc", **kw)


_entry("basenet", _spec_basenet, _fwd_basenet,
       "plain unrolled towers, no attention (base_net_withoutBN.py:1010)")


def _spec_non():
    spec = _spec_unrolled_backbone()
    for n in ("non1", "non2", "non3"):
        _spec_rescbam(spec, n)
    return spec


def _mk_fwd_non(fuse_pos, pools=(("avg", "max"),) * 3):
    def fwd(p, d, c, dtypes=FP32, ops=None, mask=None):
        att = tuple(
            [(lambda name, pt: lambda t, o, m:
              A.res_cbam(p, name, t, o, m, pt))(f"non{i+1}", pools[i])
             for i in range(3)]) + (fuse_pos,)
        return unrolled_forward(p, d, c, dtypes=dtypes, ops=ops, mask=mask,
                                tower_att=att, cat_order="cd")
    return fwd


def _spec_non_pa_ca():
    spec = _spec_non()
    _spec_pam(spec, "pa", 64)       # dead modules (non2/non3 :361-362)
    _spec_cam(spec, "ca")
    return spec


_entry("basenet_non_corr", _spec_non, _mk_fwd_non("conv11"),
       "unrolled towers + ResCBAM heads at tower ends and post-conv11 "
       "(base_net_withoutBN.py:174)")
_entry("basenet_non", _spec_non, _mk_fwd_non("conv11"),
       "duplicate of basenet_non_corr in the reference (:266)")
_entry("basenet_non2", _spec_non_pa_ca, _mk_fwd_non("conv17"),
       "ResCBAM heads, third one after conv17; dead pa/ca modules (:358)")
_entry("basenet_non3", _spec_non_pa_ca,
       _mk_fwd_non("conv11", (("max",), ("avg",), ("avg", "max"))),
       "asymmetric ResCBAM_d/_c tower heads (:451)")


def _spec_non_cat():
    spec = _spec_non()
    spec["concat_d"] = ("conv", 1, 128, 64)
    spec["concat_c"] = ("conv", 1, 128, 64)
    spec["concat_fuse"] = ("conv", 1, 128, 64)
    return spec


def _fwd_non_cat(p, d, c, dtypes=FP32, ops=None, mask=None):
    att = (lambda t, o, m: A.res_cbam(p, "non1", t, o, m),
           lambda t, o, m: A.res_cbam(p, "non2", t, o, m),
           lambda t, o, m: A.res_cbam(p, "non3", t, o, m),
           "conv11")
    return unrolled_forward(p, d, c, dtypes=dtypes, ops=ops, mask=mask,
                            tower_att=att, cat_order="cd", cat_att=True)


_entry("basenet_non_cat", _spec_non_cat, _fwd_non_cat,
       "attention outputs concatenated + 1x1 reduced instead of added (:544)")


def _spec_nlar():
    spec = _spec_unrolled_backbone()
    for n in ("non1", "non2", "non3"):
        _spec_cgnl(spec, n)
    return spec


def _fwd_nlar(p, d, c, dtypes=FP32, ops=None, mask=None):
    att = (lambda t, o, m: A.spatial_cgnl(p, "non1", t, o, m),
           lambda t, o, m: A.spatial_cgnl(p, "non2", t, o, m),
           lambda t, o, m: A.spatial_cgnl(p, "non3", t, o, m),
           "conv17")
    return unrolled_forward(p, d, c, dtypes=dtypes, ops=ops, mask=mask,
                            tower_att=att, cat_order="dc")


_entry("basenet_nlar", _spec_nlar, _fwd_nlar,
       "unrolled towers + SpatialCGNL(64,32,g8) heads (:1790)")


def _spec_cross_family():
    spec = _spec_unrolled_backbone()
    _spec_cac_stack(spec, with_c5=True)
    return spec


_entry("basenet_only_fuse_attention", _spec_cross_family,
       lambda p, d, c, **kw: unrolled_forward(p, d, c, fuse_att="c5s5", **kw),
       "attention only after fusion; c0..s4 dead (:1095)")
_entry("basenet_cross", _spec_cross_family,
       lambda p, d, c, **kw: unrolled_forward(p, d, c, stage_gate="seq",
                                              fuse_att="c5s5", **kw),
       "sequential cross gates per stage + post-fusion gate (:1200)")
_entry("basenet_only_cross_attention", _spec_cross_family,
       lambda p, d, c, **kw: unrolled_forward(p, d, c, stage_gate="seq",
                                              **kw),
       "sequential cross gates, no fusion gate; c5/s5 dead (:1358)")
_entry("basenet_only_cross_attention_advise1_nores", _spec_cross_family,
       lambda p, d, c, **kw: unrolled_forward(p, d, c, stage_gate="par",
                                              **kw),
       "parallel ch*sp mask, no per-stage residual (:1510)")
_entry("basenet_only_cross_attention_advise1", _spec_cross_family,
       lambda p, d, c, **kw: unrolled_forward(p, d, c, stage_gate="par_res",
                                              **kw),
       "parallel ch*sp mask + per-stage residual (:1649)")


# ---- MC family ------------------------------------------------------------

def _spec_rmcr():
    return _spec_mc_backbone("plain")


_entry("rmcr", _spec_rmcr,
       lambda p, d, c, **kw: mc_forward(p, d, c, towers="sequential",
                                        fusion="plain", **kw),
       "sequential MC towers + plain 2-conv fusion (:759)")


def _spec_rmcr_nlar():
    spec = _spec_mc_backbone("plain")
    for n in ("non1", "non2", "non3"):
        _spec_cgnl(spec, n)
    return spec


def _fwd_rmcr_nlar(p, d, c, dtypes=FP32, ops=None, mask=None):
    return mc_forward(
        p, d, c, dtypes=dtypes, ops=ops, mask=mask, towers="sequential",
        fusion="plain",
        tower_att=(lambda t, o, m: A.spatial_cgnl(p, "non1", t, o, m),
                   lambda t, o, m: A.spatial_cgnl(p, "non2", t, o, m)),
        fusion_att=lambda t, o, m: A.spatial_cgnl(p, "non3", t, o, m))


_entry("rmcr_nlar", _spec_rmcr_nlar, _fwd_rmcr_nlar,
       "RMCR + three SpatialCGNL heads (:828)")


def _spec_fuse_rmcr():
    return _spec_mc_backbone("mc")


_entry("rmcr_fuse_rmcr", _spec_fuse_rmcr,
       lambda p, d, c, **kw: mc_forward(p, d, c, towers="sequential", **kw),
       "attention-free CODON skeleton (:1882; inlined at CODON_x16.py:16)")
_entry("rmcr_fuse_rmcr_2", _spec_fuse_rmcr,
       lambda p, d, c, **kw: mc_forward(p, d, c, towers="sequential", **kw),
       "byte-duplicate of rmcr_fuse_rmcr in the reference (:1961)")


def _spec_mc_cac(with_c5=True):
    def f():
        spec = _spec_mc_backbone("mc")
        _spec_cac_stack(spec, with_c5=with_c5)
        return spec
    return f


_entry("rmcr_fuse_rmcr_cross_advise2", _spec_mc_cac(),
       lambda p, d, c, **kw: mc_forward(p, d, c, towers="interleaved",
                                        stage_gate="cac_seq_fused", **kw),
       "sequential gates + extra fused-mask multiply; c5/s5 dead (:2040)")
_entry("rmcr_fuse_rmcr_cross", _spec_mc_cac(),
       lambda p, d, c, **kw: mc_forward(p, d, c, towers="interleaved",
                                        stage_gate="cac_seq",
                                        fuse_gate="c5s5", **kw),
       "sequential cross gates + post-fusion c5/s5 gate (:2186)")
_entry("rmcr_fuse_rmcr_cross_only_corss_advise1", _spec_mc_cac(),
       lambda p, d, c, **kw: mc_forward(p, d, c, towers="interleaved",
                                        stage_gate="cac_par", **kw),
       "== the published CODONNet (:2319; see models.codon_net for the "
       "optimized stacked-pytree implementation)")
_entry("rmcr_fuse_rmcr_cross_only_corss", _spec_mc_cac(),
       lambda p, d, c, **kw: mc_forward(p, d, c, towers="interleaved",
                                        stage_gate="cac_seq", **kw),
       "sequential cross gates, no post-fusion gate; c5/s5 dead (:3004)")
_entry("rmcr_fuse_rmcr_cross_only_corss_advise1_onlys", _spec_mc_cac(),
       lambda p, d, c, **kw: mc_forward(p, d, c, towers="interleaved",
                                        stage_gate="cac_s", **kw),
       "spatial-only CAC mask; channel heads dead (:2580)")
_entry("rmcr_fuse_rmcr_cross_only_corss_advise1_onlyc", _spec_mc_cac(),
       lambda p, d, c, **kw: mc_forward(p, d, c, towers="interleaved",
                                        stage_gate="cac_c", **kw),
       "channel-only CAC mask; spatial heads dead (:2691)")


def _spec_parall():
    spec = _spec_mc_backbone("mc")
    for i in range(5):
        _spec_cac_channel(spec, f"attention_c{i}")
        _spec_spatial_gate(spec, f"attention_s{i}")
        _spec_cac_channel(spec, f"attention_c{i}1")
        _spec_spatial_gate(spec, f"attention_s{i}1")
    return spec


_entry("rmcr_fuse_rmcr_cross_only_corss_advise1_parall", _spec_parall,
       lambda p, d, c, **kw: mc_forward(p, d, c, towers="interleaved",
                                        stage_gate="cac_par2", **kw),
       "two independent CAC masks, one per tower (:2435)")


def _spec_eccv():
    spec = _spec_mc_backbone("mc")
    for i in range(5):
        _spec_cbam(spec, f"attention_c{i}")
        _spec_cbam(spec, f"attention_d{i}")
    return spec


_entry("rmcr_fuse_rmcr_eccv", _spec_eccv,
       lambda p, d, c, **kw: mc_forward(p, d, c, towers="interleaved",
                                        stage_gate="cbam_tower", **kw),
       "per-tower CBAM outputs multiplied in (:2802; CBAM interpreted — "
       "attention.CBAM missing from the release)")


def _spec_rcan():
    spec = _spec_mc_backbone("mc")
    for i in range(5):
        _spec_calayer(spec, f"attention_c{i}")
        _spec_calayer(spec, f"attention_d{i}")
    return spec


_entry("rmcr_fuse_rmcr_rcan", _spec_rcan,
       lambda p, d, c, **kw: mc_forward(p, d, c, towers="interleaved",
                                        stage_gate="rcan_cross", **kw),
       "cross-wired CALayers incl. the reference's stage-4 gate reuse and "
       "tower-overwrite quirk (:2908)")


def _spec_cross2():
    spec = _spec_mc_backbone("mc")
    for i in range(5):
        _spec_ca(spec, f"attention_c{i}")
        _spec_spatial_gate(spec, f"attention_s{i}")
    _spec_ca(spec, "attention_c5")
    _spec_spatial_gate(spec, "attention_s5")
    return spec


def _spec_cross3():
    spec = _spec_cross2()
    for i in range(5):
        _spec_ca(spec, f"attention_c{i}_c")
    return spec


_entry("rmcr_fuse_rmcr_cross2", _spec_cross2,
       lambda p, d, c, **kw: mc_forward(p, d, c, towers="interleaved",
                                        stage_gate="ca_sa_depth",
                                        fuse_gate="ca_sa", **kw),
       "gates computed from the depth tower only (:3137; wechat_2 CA/SA "
       "interpreted — missing from the release)")
_entry("rmcr_fuse_rmcr_cross3", _spec_cross3,
       lambda p, d, c, **kw: mc_forward(p, d, c, towers="interleaved",
                                        stage_gate="ca_sa_depth_c",
                                        fuse_gate="ca_sa", **kw),
       "cross2 + per-color channel gates (:3264)")
