"""CODONNet — the flagship cross-domain attention depth-SR network, TPU-native.

Functional JAX re-design of the reference network (behavioral spec:
/root/reference/CODON_X4/CODON_x4.py:18-132 and CODON_X16/CODON_x16.py:92-202;
CAC gates: /root/reference/CODON_X4/CAC_module.py:26-94). Same math, different
architecture: NHWC activations / HWIO kernels sized to the MXU, a single
parameter pytree with the per-stage CAC parameters stacked on a leading axis,
and all global reductions routed through an `Ops` backend so the identical
model function runs single-device, batched-DP, or spatially sharded with
psum'd attention statistics.

Structure (all convs stride-1 shape-preserving, bias-free; width 64):
  depth stem:  input(1->64,3x3)  -> conv_input(64->64,3x3)        [relu each]
  color stem:  input_c(1->64,3x3)-> conv_input_c(64->64,3x3)
  5x interleaved MC+CAC stages (shared conv weights, per-stage CAC weights):
    depth cell: cat(relu(conv1 3x3), relu(conv2 5x5)) -> relu(conv3 5x5,128)
                -> confuse 1x1 -> 64
    color cell: cat(relu(conv4 5x5), relu(conv5 3x3)) [conv4 (5x5) output
                first, matching reference CODON_x4.py:79-80; only the
                CODON_X16/model/CODONet.py flavor (color_cat_swapped) swaps
                it] -> relu(conv6 5x5,128) -> confuse_c 1x1 -> 64
    CAC: cat(out_c, out) [color first] -> channel gate (global avg+max pool
         -> MLP 128->8->64 -> sigmoid) * spatial gate (channel max+mean ->
         5x5 conv 2->1 -> sigmoid); both towers multiplied by the same gate,
         then long skip +stem.
  fusion: cat(out, out_c) -> conv7 3x3 128->64; 3x fusion MC stages
          (conv8 5x5 || conv9 3x3 -> cat -> conv10 5x5,128 -> confuse_fuse 1x1
          -> +fuse); head: relu(conv11 3x3) -> output 64->1 3x3 -> +x.

The X4/X8 release checkpoints additionally carry dead parameters
(`attention_c5`/`attention_s5`, never used in forward — CODON_x4.py:64-65);
`CodonConfig.dead_heads=True` materializes them for checkpoint compatibility.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from codon_tpu.core.ops import Ops, XlaOps
from codon_tpu.core.params import conv_kernel_init, linear_init, DTypePolicy, FP32


@dataclasses.dataclass(frozen=True)
class CodonConfig:
    width: int = 64
    num_mc: int = 5            # cross-attention MC stages
    num_fuse: int = 3          # fusion MC stages
    # depth-stem input channels. 2 = scale-conditioned joint training
    # (channel 1 carries a constant scale/16 plane so ONE model learns
    # all three shipped degradations and can tell them apart — the
    # disambiguation unconditioned --mix-scales lacked when it regressed;
    # VERDICT r4 item 1 arm (b)). The global residual and the output head
    # always read depth channel 0.
    in_channels: int = 1
    use_cac: bool = True       # False -> BaseNet_RMCR_fuseRMCR-style (no gates)
    cac_reduction: int = 16    # channel-gate MLP bottleneck: 2W/reduction
    spatial_kernel: int = 5    # CAC spatial gate conv kernel
    dead_heads: bool = False   # X4/X8 checkpoint-compat unused params
    # CODON_X16/model/CODONet.py:146-150 flavor: color cell cats
    # (conv5-out, conv4-out) = (3x3, 5x5) instead of (5x5, 3x3) —
    # weight-compatible with the main net, activation-different.
    color_cat_swapped: bool = False
    dtypes: DTypePolicy = FP32
    # CAC stage implementation: "xla" | "pallas" | "auto" (pallas on TPU).
    # The Pallas path fuses pools/stencil/gating into 3 kernels; it applies
    # only on the single-device ops path (ShardedOps keeps XLA collectives).
    cac_impl: str = "auto"
    # Loop lowering: "unroll" emits num_mc copies of the stage into HLO
    # (maximal fusion freedom, best steady-state); "scan" emits one body
    # (~5x smaller HLO, much faster compiles — the default for training,
    # whose fwd+bwd program otherwise takes minutes on the remote compiler).
    loop_impl: str = "unroll"
    # Cell lowering: "packed" merges each cell's 3x3 || 5x5 conv pair into
    # ONE 5x5 C->2C conv (the 3x3 zero-embedded into a 5x5 kernel at trace
    # time). The MXU is 128 lanes wide, so the separate 64-out-channel convs
    # ran at half lane utilization; the merged conv runs full-lane AND
    # removes the concat. Numerically identical math (the zero ring
    # contributes exact 0.0 products); same checkpoints. "split" keeps the
    # reference op structure (conv1/conv2 separate).
    cell_impl: str = "packed"

    @property
    def cat_width(self) -> int:
        return 2 * self.width


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def init_codon_params(key: jax.Array, cfg: CodonConfig = CodonConfig()):
    """Build the CODONNet parameter pytree.

    Conv kernels: HWIO, N(0, sqrt(2/(k^2*C_out))) as in the reference init.
    CAC params stacked over stages on a leading axis of size num_mc.
    """
    w, cw = cfg.width, cfg.cat_width
    hid = cw // cfg.cac_reduction
    keys = iter(jax.random.split(key, 64))
    nk = lambda: next(keys)
    pd = cfg.dtypes.param_dtype

    def conv(kh, ci, co):
        return conv_kernel_init(nk(), kh, kh, ci, co, dtype=pd)

    params = {
        # depth tower
        "input": conv(3, cfg.in_channels, w),
        "conv_input": conv(3, w, w),
        "conv1": conv(3, w, w),
        "conv2": conv(5, w, w),
        "conv3": conv(5, cw, cw),
        "confuse": conv(1, cw, w),
        # color tower
        "input_c": conv(3, 1, w),
        "conv_input_c": conv(3, w, w),
        "conv4": conv(5, w, w),
        "conv5": conv(3, w, w),
        "conv6": conv(5, cw, cw),
        "confuse_c": conv(1, cw, w),
        # fusion trunk
        "conv7": conv(3, cw, w),
        "conv8": conv(5, w, w),
        "conv9": conv(3, w, w),
        "conv10": conv(5, cw, cw),
        "confuse_fuse": conv(1, cw, w),
        "conv11": conv(3, w, w),
        "output": conv(3, w, 1),
    }

    if cfg.use_cac:
        ch_w1, ch_b1, ch_w2, ch_b2, sp_w = [], [], [], [], []
        sk = cfg.spatial_kernel
        for _ in range(cfg.num_mc):
            w1, b1 = linear_init(nk(), cw, hid, dtype=pd)
            w2, b2 = linear_init(nk(), hid, w, dtype=pd)
            ch_w1.append(w1); ch_b1.append(b1)
            ch_w2.append(w2); ch_b2.append(b2)
            sp_w.append(conv_kernel_init(nk(), sk, sk, 2, 1, dtype=pd))
        params["cac"] = {
            "ch_w1": jnp.stack(ch_w1), "ch_b1": jnp.stack(ch_b1),
            "ch_w2": jnp.stack(ch_w2), "ch_b2": jnp.stack(ch_b2),
            "sp_w": jnp.stack(sp_w),
        }

    if cfg.dead_heads:
        # Unused in forward; carried so X4/X8 reference checkpoints round-trip
        # (reference: CODON_x4.py:64-65, attention/ResCBAM.py:26-35).
        hid5 = w // cfg.cac_reduction
        w1, b1 = linear_init(nk(), w, hid5, dtype=pd)
        w2, b2 = linear_init(nk(), hid5, w, dtype=pd)
        params["attention_c5"] = {"w1": w1, "b1": b1, "w2": w2, "b2": b2}
        params["attention_s5"] = {
            "sp_w": conv_kernel_init(nk(), cfg.spatial_kernel,
                                     cfg.spatial_kernel, 2, 1, dtype=pd)
        }

    return params


def widen_stem_params(params, in_channels: int = 2):
    """Function-preserving stem widening for scale-conditioned warm starts.

    Pads the 1-channel `input` stem kernel to `in_channels` with ZERO
    slices, so a codon_sc model initialized from a trained 1-channel
    ancestor computes EXACTLY the ancestor's function for every value of
    the conditioning plane; joint training then learns the conditioning
    as a delta from a working basin. (The from-scratch alternative
    collapsed into total ReLU death —
    checkpoints/x4_holdout_sc_collapsed.npz.)
    """
    import numpy as np
    k = np.asarray(params["input"])
    if k.shape[2] != 1:
        raise ValueError(f"widen_stem_params expects a 1-channel stem, "
                         f"got {k.shape}")
    out = dict(params)
    out["input"] = np.concatenate(
        [k] + [np.zeros_like(k)] * (in_channels - 1), axis=2)
    return out


# --------------------------------------------------------------------------
# kernel packing (cell_impl="packed")
# --------------------------------------------------------------------------

def pack_kernel_pair(ka, kb):
    """Merge two same-input conv kernels into one wider-output kernel.

    (kh_a,kw_a,C,Oa) + (kh_b,kw_b,C,Ob) -> (kh,kw,C,Oa+Ob) with the smaller
    kernel zero-embedded in the larger window. relu(conv(x, packed)) ==
    cat(relu(conv(x, ka)), relu(conv(x, kb))) exactly (the zero ring
    contributes 0.0 products), but runs as ONE full-lane MXU conv instead
    of two half-lane ones — the dominant single-chip win on this net, where
    every 64-out-channel conv wastes half the 128-wide MXU.
    """
    kh = max(ka.shape[0], kb.shape[0])

    def emb(k):
        ph = (kh - k.shape[0]) // 2
        pw = (kh - k.shape[1]) // 2
        if ph == 0 and pw == 0:
            return k
        return jnp.pad(k, ((ph, ph), (pw, pw), (0, 0), (0, 0)))

    return jnp.concatenate([emb(ka), emb(kb)], axis=3)


# --------------------------------------------------------------------------
# CAC gates
# --------------------------------------------------------------------------

def cac_channel_gate(x, w1, b1, w2, b2, ops: Ops, mask=None):
    """Global avg+max pool over HW -> shared MLP -> sigmoid.

    x: (N, H, W, 2W) concat of both towers — OR a (color, depth) tuple,
    in which case the pooled stats are computed per tower and concatenated
    on the tiny pooled vectors instead of materializing the 2W-channel
    activation (saves a full HBM round-trip per stage).
    Returns (N, 1, 1, W) gate. Reference semantics: CAC_module.py:38-63
    (mlp applied to each pooled vector separately, summed pre-sigmoid;
    output half the input channels).
    """
    if isinstance(x, tuple):
        a, b = x
        avg = jnp.concatenate([ops.global_avg(a, mask)[:, 0, 0, :],
                               ops.global_avg(b, mask)[:, 0, 0, :]], -1)
        mx = jnp.concatenate([ops.global_max(a, mask)[:, 0, 0, :],
                              ops.global_max(b, mask)[:, 0, 0, :]], -1)
    else:
        avg = ops.global_avg(x, mask)[:, 0, 0, :]   # (N, 2W)
        mx = ops.global_max(x, mask)[:, 0, 0, :]

    def mlp(v):
        h = jax.nn.relu(v @ w1.astype(v.dtype) + b1.astype(v.dtype))
        return h @ w2.astype(v.dtype) + b2.astype(v.dtype)

    gate = jax.nn.sigmoid(mlp(avg) + mlp(mx))    # (N, W)
    return gate[:, None, None, :]


def cac_spatial_gate(x, sp_w, ops: Ops, mask=None, impl: str = "conv"):
    """Channel max+mean -> 5x5 conv (2->1) -> sigmoid. (N,H,W,1) gate.

    Reference semantics: CAC_module.py:78-94 (max first, then mean).
    Accepts the concat activation or a (color, depth) tuple (channel
    reductions decompose over the concat: max=max(max_a,max_b),
    mean=(mean_a+mean_b)/2 for equal widths).

    impl="stencil": the 2->1 conv unrolled as k*k*2 shifted multiply-adds
    on (N,H,W) planes — dodges the 1-2 channel conv layouts that are
    MXU/lane-hostile on TPU. Equal numerics (same taps, same zero SAME
    padding); only usable on the unsharded path (XlaOps).
    """
    if isinstance(x, tuple):
        a, b = x
        cmax = jnp.maximum(jnp.max(a, -1, keepdims=True),
                           jnp.max(b, -1, keepdims=True))
        cmean = (jnp.mean(a, -1, keepdims=True) +
                 jnp.mean(b, -1, keepdims=True)) * 0.5
    else:
        cmax = jnp.max(x, axis=-1, keepdims=True)
        cmean = jnp.mean(x, axis=-1, keepdims=True)

    if impl == "stencil" and isinstance(ops, XlaOps):
        k = sp_w.shape[0]
        r = (k - 1) // 2
        n, h, w, _ = cmax.shape
        # two separate (N,H,W) planes: keeps W on lanes, avoids the
        # lane-hostile (N,H,W,2) layout entirely
        pa = jnp.pad(cmax[..., 0], ((0, 0), (r, r), (r, r)))
        pb = jnp.pad(cmean[..., 0], ((0, 0), (r, r), (r, r)))
        wk = sp_w.astype(pa.dtype)
        acc = None
        for dy in range(k):
            for dx in range(k):
                tap = (pa[:, dy:dy + h, dx:dx + w] * wk[dy, dx, 0, 0] +
                       pb[:, dy:dy + h, dx:dx + w] * wk[dy, dx, 1, 0])
                acc = tap if acc is None else acc + tap
        logits = acc[..., None]
        if mask is not None:
            logits = logits * mask.astype(logits.dtype)
        return jax.nn.sigmoid(logits)

    pooled = jnp.concatenate([cmax, cmean], axis=-1)
    logits = ops.conv2d(pooled, sp_w, mask=mask)
    return jax.nn.sigmoid(logits)


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _use_pallas_cac(cfg: CodonConfig, ops) -> bool:
    """Pallas CAC only on the plain single-device ops path on TPU.

    "auto" resolves to the XLA path: the fused kernels are correct
    (tests/test_kernels.py) but the platform's Pallas DMA path moves
    ~110-180 GB/s where XLA elementwise moves ~360 (probe data + isolated
    stage shootout in kernels/cac.py docstring), so the memory-bound CAC
    stage cannot win there; opt in with cac_impl="pallas".
    """
    if cfg.cac_impl == "xla" or not isinstance(ops, XlaOps):
        return False
    if cfg.cac_impl == "pallas":
        return True
    return False


def _spatial_gate_impl(cfg: CodonConfig, ops) -> str:
    """Spatial-gate lowering: the unrolled-stencil form beats the 2->1 conv
    on TPU (lane-hostile 1-2 channel layouts; +5% end-to-end, measured);
    "auto" selects it on the TPU backend, explicit values win."""
    if cfg.cac_impl == "xla_stencil":
        return "stencil"
    if cfg.cac_impl == "auto" and isinstance(ops, XlaOps):
        import jax as _jax
        if _jax.default_backend() == "tpu":
            return "stencil"
    return "conv"


def codon_forward(params, depth, color, *, cfg: CodonConfig = CodonConfig(),
                  ops: Optional[Ops] = None, mask=None):
    """Run CODONNet. depth/color: (N, H, W, 1) in [0, 1]. Returns (N, H, W, 1).

    `mask` (N, H, W, 1, optional): validity mask for padded batches; keeps
    batched mixed-size inference exact w.r.t. per-image execution.
    """
    if ops is None:
        ops = XlaOps(acc_dtype=cfg.dtypes.acc_dtype, precision=cfg.dtypes.precision)
    cdt = cfg.dtypes.compute_dtype
    relu = jax.nn.relu

    x = depth.astype(cdt)
    y = color.astype(cdt)
    if mask is not None:
        mask = mask.astype(cdt)
        x = x * mask
        y = y * mask
    p = {k: v for k, v in params.items()}

    def conv(name_or_w, t, site=None):
        if isinstance(name_or_w, str):
            w, site = p[name_or_w], name_or_w
        else:
            w = name_or_w
        return ops.conv2d(t, w, mask=mask, name=site)

    # channel 0 is always the depth map; extra channels (scale
    # conditioning, in_channels=2) feed the stem but not the residual
    residual = x[..., :1]
    inputs = relu(conv("conv_input", relu(conv("input", x))))
    inputs_c = relu(conv("conv_input_c", relu(conv("input_c", y))))
    # int8 handoff (active only when the checkpoint calibrated these
    # sites): the stem outputs are read by every stage's residual add —
    # store them 1-byte, dequant inline per consumer (Ops.roundtrip)
    inputs = ops.roundtrip(inputs, name="stem_d")
    inputs_c = ops.roundtrip(inputs_c, name="stem_c")
    out, out_c = inputs, inputs_c

    cac = p.get("cac") if cfg.use_cac else None
    use_pallas = cac is not None and _use_pallas_cac(cfg, ops)

    packed = cfg.cell_impl == "packed"
    if packed:
        # depth cell cats (conv1 3x3, conv2 5x5); color cell cats
        # (conv4 5x5, conv5 3x3) — reference CODON_x4.py:79-80; the
        # X16-model-dir flavor swaps the color order (CODONet.py:146-150)
        m_d = pack_kernel_pair(p["conv1"], p["conv2"])
        c_pair = [p["conv4"], p["conv5"]]
        if cfg.color_cat_swapped:
            c_pair.reverse()
        m_c = pack_kernel_pair(*c_pair)
        m_f = pack_kernel_pair(p["conv8"], p["conv9"])

    def mc_stage(out, out_c, cac_i):
        """One MC+CAC stage. cac_i: per-stage CAC param slice or None."""
        if packed:
            d_cat = relu(conv(m_d, out, site="packed_d"))
            c_cat = relu(conv(m_c, out_c, site="packed_c"))
        else:
            d_cat = jnp.concatenate([relu(conv("conv1", out)),
                                     relu(conv("conv2", out))], axis=-1)
            c_parts = [relu(conv("conv4", out_c)),
                       relu(conv("conv5", out_c))]
            if cfg.color_cat_swapped:
                c_parts.reverse()
            c_cat = jnp.concatenate(c_parts, axis=-1)
        out = conv("confuse", relu(conv("conv3", d_cat)))
        out_c = conv("confuse_c", relu(conv("conv6", c_cat)))
        # int8 handoff for the gate/apply passes: the confuse outputs are
        # the most-re-read tensors in the net (global pools, channel
        # pools, gate multiply) — HBM traffic halves when they cross as
        # int8. Trained-for under QAT (FakeQuantStaticOps.roundtrip).
        out = ops.roundtrip(out, name="gate_d")
        out_c = ops.roundtrip(out_c, name="gate_c")

        if use_pallas:
            from codon_tpu.kernels.cac import cac_stage_pallas
            return cac_stage_pallas(
                out, out_c, inputs, inputs_c,
                cac_i["ch_w1"], cac_i["ch_b1"],
                cac_i["ch_w2"], cac_i["ch_b2"], cac_i["sp_w"], mask)

        if cac_i is not None:
            # Fcat = cat(color, depth) — color first (CODON_x4.py:85);
            # passed as a tuple so the 2W-channel concat is never built.
            fcat = (out_c, out)
            ch = cac_channel_gate(fcat, cac_i["ch_w1"], cac_i["ch_b1"],
                                  cac_i["ch_w2"], cac_i["ch_b2"], ops, mask)
            sp = cac_spatial_gate(fcat, cac_i["sp_w"], ops, mask,
                                  impl=_spatial_gate_impl(cfg, ops))
            ad = ch * sp                      # (N, H, W, W) via broadcast
            out = out * ad
            out_c = out_c * ad
        return out + inputs, out_c + inputs_c

    def fuse_stage(out_f, fuse):
        if packed:
            f_cat = relu(conv(m_f, out_f, site="packed_f"))
        else:
            f_cat = jnp.concatenate([relu(conv("conv8", out_f)),
                                     relu(conv("conv9", out_f))], axis=-1)
        return conv("confuse_fuse", relu(conv("conv10", f_cat))) + fuse

    if cfg.loop_impl == "scan" and not use_pallas:
        # HLO contains ONE stage body instead of num_mc copies — much
        # faster XLA compiles (the fwd+bwd training program especially);
        # the per-stage CAC params are already stacked on a leading axis.
        def mc_body(carry, cac_i):
            o, oc = mc_stage(*carry, cac_i if cfg.use_cac else None)
            return (o, oc), None

        (out, out_c), _ = jax.lax.scan(
            mc_body, (out, out_c),
            cac if cfg.use_cac else jnp.zeros((cfg.num_mc,)),
            length=cfg.num_mc)
    else:
        # stage-boundary precommit (packed+unrolled only): the carried
        # tensors' ONLY consumer is the next stage's packed conv, so
        # quantized backends hand them over already in int8. Bitwise-
        # identical results (same scale as quantize-at-use); the LAST
        # iteration stays float (its consumer is conv7/conv11, a
        # different site). Skipped under scan (carry dtype must be
        # uniform) and in split mode (conv1/conv2 share the input with
        # separate scales). Measured perf-NEUTRAL on v5e (XLA already
        # fuses apply+quantize and elides the float intermediate); kept
        # as the explicit storage-format contract so the int8 handoff is
        # structural rather than an optimizer outcome.
        pc = (ops.precommit if packed
              else (lambda t, s=None, *, name=None: t))
        out = pc(out, name="packed_d")
        out_c = pc(out_c, name="packed_c")
        for i in range(cfg.num_mc):
            cac_i = ({k: v[i] for k, v in cac.items()}
                     if cac is not None else None)
            out, out_c = mc_stage(out, out_c, cac_i)
            if i < cfg.num_mc - 1:
                out = pc(out, name="packed_d")
                out_c = pc(out_c, name="packed_c")

    fuse = relu(conv("conv7", jnp.concatenate([out, out_c], axis=-1)))
    # conv7's output is re-read by all num_fuse residual adds
    fuse = ops.roundtrip(fuse, name="fuse_r")

    if cfg.loop_impl == "scan":
        def fuse_body(out_f, _):
            return fuse_stage(out_f, fuse), None
        out_f, _ = jax.lax.scan(fuse_body, fuse, None, length=cfg.num_fuse)
    else:
        pc = (ops.precommit if packed
              else (lambda t, s=None, *, name=None: t))
        out_f = pc(fuse, name="packed_f")
        for j in range(cfg.num_fuse):
            out_f = fuse_stage(out_f, fuse)
            if j < cfg.num_fuse - 1:
                out_f = pc(out_f, name="packed_f")

    out = relu(conv("conv11", out_f))
    return (conv("output", out) + residual).astype(jnp.float32)


def codon_forward_fused(params, depth, color, *,
                        cfg: CodonConfig = CodonConfig(),
                        ops: Optional[Ops] = None, mask=None):
    """Merged-tower CODONNet forward: same math, half the conv ops.

    The depth and color towers run in ONE 2W-channel tensor T=[out | out_c]
    with grouped convs (feature_group_count=2): [conv1|conv5] as one 3x3,
    [conv2|conv4] as one 5x5, [conv3|conv6] as one 5x5 on 4W channels,
    [confuse|confuse_c] as one 1x1. Fewer, wider ops -> fewer XLA fusion
    boundaries and better lane utilization; numerically identical to
    `codon_forward` (same weights, same adds — verified in tests).

    Weight packing happens at trace time from the SAME parameter pytree, so
    checkpoints are interchangeable between the two forwards.

    The grouped convs carry COMPOUND site names ("conv3+conv6": one
    standard site per group), so the static-int8 family quantizes this
    forward too: quant_ops._site_scale concatenates the parts' calibrated
    per-channel scales (routing conv1/conv2/conv4/conv5/conv8/conv9
    through the packed_d/packed_c/packed_f aliases — the packed sites
    saw the identical input tensors), and the weight fold maps scales
    per group (quant_ops._scale_per_kernel_input). The shipping
    int8-static path remains `codon_forward` with packed cells, which
    was measured FASTER than this merged-tower lowering on v5e (grouped
    4W convs tile worse on the MXU than the packed C->2C cells); kept as
    the reference-shaped ablation point. `color_cat_swapped` is not
    lowered here (the cell concat order is hardcoded) and raises.
    """
    if cfg.color_cat_swapped:
        raise NotImplementedError(
            "codon_forward_fused hardcodes the cell concat order; use "
            "codon_forward for color_cat_swapped configs")
    if ops is None:
        ops = XlaOps(acc_dtype=cfg.dtypes.acc_dtype,
                     precision=cfg.dtypes.precision)
    cdt = cfg.dtypes.compute_dtype
    relu = jax.nn.relu
    w = cfg.width

    x = depth.astype(cdt)
    y = color.astype(cdt)
    if mask is not None:
        mask = mask.astype(cdt)
        x = x * mask
        y = y * mask
    p = params

    def conv(wk, t, site=None):
        return ops.conv2d(t, wk, mask=mask, name=site)

    cat = lambda *ts: jnp.concatenate(ts, axis=-1)
    # grouped kernels: (kh, kw, C_in/groups, C_out) with O blocked per group;
    # the stems run grouped over the 2-channel [depth | color] stack
    stem_in = cat(x, y)                                # (N,H,W,2)
    k_in = jnp.concatenate([p["input"], p["input_c"]], axis=3)   # (3,3,1,128)
    T = relu(ops.conv2d(stem_in, k_in, mask=mask, groups=2,
                        name="input+input_c"))
    k_ci = jnp.concatenate([p["conv_input"], p["conv_input_c"]], axis=3)
    inputs2 = relu(ops.conv2d(T, k_ci, mask=mask, groups=2,
                              name="conv_input+conv_input_c"))
    T = inputs2

    k_3x3 = jnp.concatenate([p["conv1"], p["conv5"]], axis=3)   # (3,3,64,128)
    k_5x5 = jnp.concatenate([p["conv2"], p["conv4"]], axis=3)   # (5,5,64,128)
    k_big = jnp.concatenate([p["conv3"], p["conv6"]], axis=3)   # (5,5,128,256)
    k_fuse1 = jnp.concatenate([p["confuse"], p["confuse_c"]], axis=3)

    cac = p.get("cac") if cfg.use_cac else None

    for i in range(cfg.num_mc):
        A = relu(ops.conv2d(T, k_3x3, mask=mask, groups=2,
                            name="conv1+conv5"))              # [d3|c3]
        B = relu(ops.conv2d(T, k_5x5, mask=mask, groups=2,
                            name="conv2+conv4"))              # [d5|c5]
        # depth cell input cat(d3, d5); color cell input cat(c5, c3)
        # (reference cat orders: CODON_x4.py:79-80 — depth (conv1, conv2),
        #  color (conv4, conv5) = (5x5, 3x3))
        mixed = cat(A[..., :w], B[..., :w], B[..., w:], A[..., w:])
        R2 = relu(ops.conv2d(mixed, k_big, mask=mask, groups=2,
                             name="conv3+conv6"))
        T = ops.conv2d(R2, k_fuse1, mask=mask, groups=2,
                       name="confuse+confuse_c")             # [out|out_c]

        if cac is not None:
            out, out_c = T[..., :w], T[..., w:]
            ch = cac_channel_gate((out_c, out), cac["ch_w1"][i],
                                  cac["ch_b1"][i], cac["ch_w2"][i],
                                  cac["ch_b2"][i], ops, mask)
            sp = cac_spatial_gate((out_c, out), cac["sp_w"][i], ops, mask)
            ad2 = jnp.concatenate([ch, ch], axis=-1) * sp    # (N,H,W,2W)
            T = T * ad2
        T = T + inputs2

    # fusion trunk consumes cat(out, out_c) == T directly
    fuse = relu(conv(p["conv7"], T, site="conv7"))
    out_f = fuse
    for _ in range(cfg.num_fuse):
        f_cat = cat(relu(conv(p["conv8"], out_f, site="conv8")),
                    relu(conv(p["conv9"], out_f, site="conv9")))
        out_f = conv(p["confuse_fuse"],
                     relu(conv(p["conv10"], f_cat, site="conv10")),
                     site="confuse_fuse") + fuse

    out = relu(conv(p["conv11"], out_f, site="conv11"))
    return (conv(p["output"], out, site="output") + x).astype(jnp.float32)


def sequential_tower_forward(params, depth, color, *,
                             cfg: CodonConfig = CodonConfig(),
                             ops: Optional[Ops] = None, mask=None):
    """BaseNet_RMCR_fuseRMCR semantics: towers run sequentially, no CAC.

    Behavioral spec: /root/reference/CODON_X16/CODON_x16.py:16-90 (same cell
    concat order, conv4-out then conv5-out, as the interleaved net; only the
    CODON_X16/model/CODONet.py:146-150 variant swaps it).
    """
    cfg = dataclasses.replace(cfg, use_cac=False)
    if ops is None:
        ops = XlaOps(acc_dtype=cfg.dtypes.acc_dtype, precision=cfg.dtypes.precision)
    relu = jax.nn.relu
    cdt = cfg.dtypes.compute_dtype
    x, y = depth.astype(cdt), color.astype(cdt)
    if mask is not None:
        mask = mask.astype(cdt)
        x = x * mask
        y = y * mask

    def conv(n, t, site=None):
        if isinstance(n, str):
            wk, site = params[n], n
        else:
            wk = n
        return ops.conv2d(t, wk, mask=mask, name=site)

    packed = cfg.cell_impl == "packed"
    if packed:
        m_d = pack_kernel_pair(params["conv1"], params["conv2"])
        m_c = pack_kernel_pair(params["conv4"], params["conv5"])
        m_f = pack_kernel_pair(params["conv8"], params["conv9"])

    residual = x
    inputs = relu(conv("conv_input", relu(conv("input", x))))
    out = inputs
    for _ in range(cfg.num_mc):
        cat = (relu(conv(m_d, out, site="packed_d")) if packed else
               jnp.concatenate([relu(conv("conv1", out)),
                                relu(conv("conv2", out))], axis=-1))
        out = conv("confuse", relu(conv("conv3", cat))) + inputs

    inputs_c = relu(conv("conv_input_c", relu(conv("input_c", y))))
    out_c = inputs_c
    for _ in range(cfg.num_mc):
        cat = (relu(conv(m_c, out_c, site="packed_c")) if packed else
               jnp.concatenate([relu(conv("conv4", out_c)),
                                relu(conv("conv5", out_c))], axis=-1))
        out_c = conv("confuse_c", relu(conv("conv6", cat))) + inputs_c

    fuse = relu(conv("conv7", jnp.concatenate([out, out_c], axis=-1)))
    out_f = fuse
    for _ in range(cfg.num_fuse):
        cat = (relu(conv(m_f, out_f, site="packed_f")) if packed else
               jnp.concatenate([relu(conv("conv8", out_f)),
                                relu(conv("conv9", out_f))], axis=-1))
        out_f = conv("confuse_fuse", relu(conv("conv10", cat))) + fuse

    out = relu(conv("conv11", out_f))
    return (conv("output", out) + residual).astype(jnp.float32)
