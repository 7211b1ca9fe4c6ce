"""Pallas TPU kernels for the CAC cross-domain attention stage.

Status (round 2, measured): CORRECT BUT NOT DEPLOYED — XLA wins on this
platform, and we know exactly why. Isolated CAC-stage shootout at
b32/463x370/bf16 on v5e (scripts/perf_cac.py): XLA stencil lowering
15.8 ms, XLA 2ch-conv 16.7 ms, these kernels 41.9 ms (stats 15.3 +
logits 2.0 + apply 33.7). A layout probe (scripts/perf_pallas_probe.py)
pins the cause below the kernel code: a PURE PALLAS COPY of the same
tensor moves ~110 GB/s with (1,64,W,64) blocks (best observed layout,
flat (1,8,W*C): ~180) while a plain XLA elementwise pass moves ~360 GB/s
— the Pallas DMA path on this stack runs 2-3x under XLA's, so no amount
of in-kernel cleverness closes a gap that exists for memory-bound ops.
The native-tier effort that DID land is the static per-channel int8
design (quant_ops.py): quantization became a reduction-free elementwise
epilogue XLA fuses for free — 81.8 img/s vs 52.7 bf16, on by default in
shipping checkpoints. These kernels stay as the opt-in
(`cac_impl="pallas"`), fully tested reference implementation, and the
measurement harnesses stay in scripts/ for re-evaluation on stacks where
Pallas DMA reaches HBM speed.

Original design rationale (the reference leaned on cuDNN for these ops —
/root/reference/CODON_X4/CAC_module.py). Three fused kernels:

  cac_stats      one pass over both towers -> global channel sum+max (for
                 the channel-gate MLP) AND the channel-pooled max/mean maps
                 (for the spatial gate), W kept on lanes for the maps.
  spatial_logits whole-image 5x5 stencil on the pooled maps (2->1 conv as
                 25 unrolled VPU taps — the MXU-hostile conv eliminated).
  cac_apply      ad = channel_gate x sigmoid(logits); both towers gated,
                 long-skip added: 4 reads + 2 writes, single pass.

Stage semantics match CAC_module.py:26-94 + CODON_x4.py:85-118 exactly
(channel order color-first in Fcat, shared MLP over avg & max pools summed
pre-sigmoid, gate applied to both towers, then +stem residual).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# kernel 1: global channel stats + channel-pooled spatial maps
# ---------------------------------------------------------------------------

def _stats_kernel(*refs, th: int, h_total: int, c: int, with_mask: bool):
    if with_mask:
        (out_ref, outc_ref, mask_ref,
         sum_ref, max_ref, cmax_ref, cmean_ref) = refs
    else:
        out_ref, outc_ref, sum_ref, max_ref, cmax_ref, cmean_ref = refs
        mask_ref = None
    h = pl.program_id(1)
    x = out_ref[0]      # (TH, W, C) depth tower
    y = outc_ref[0]     # color tower
    dt = x.dtype
    row0 = h * th
    rows = jax.lax.broadcasted_iota(jnp.int32, (th, 1, 1), 0) + row0
    rows_ok = rows < h_total
    # global-reduction validity: row padding AND (for padded batches) the
    # image mask — sums are unaffected by the mask (masked convs already
    # zero the padding) but the max must exclude it.
    # All full-tile temporaries stay in the input dtype (VMEM budget);
    # reductions accumulate in f32 via the dtype= argument.
    valid = rows_ok
    if mask_ref is not None:
        valid = jnp.logical_and(valid, mask_ref[0] > 0)

    neg = jnp.asarray(-3.0e38, dt)
    # (TH, C) row-validity mask: full-rank iota avoids a Mosaic relayout
    # bug with lane-replicated (TH, 1) broadcasts into (TH, C) f32.
    rows_tc = (jax.lax.broadcasted_iota(jnp.int32, (th, c), 0)
               + row0) < h_total

    # Reduce over W FIRST (axis 1) so masking happens on (TH, C) rows —
    # no full-tile temporaries in the unmasked path (VMEM budget: a
    # (TH,W,C) temp costs 2x its logical size, C=64 padding to 128 lanes).
    def row_sum(t):
        return jnp.where(rows_tc, t.sum(1, dtype=jnp.float32), 0.0).sum(0)

    if mask_ref is None:
        def row_max(t):
            return jnp.where(rows_tc, t.max(1).astype(jnp.float32),
                             -3.0e38).max(0)
        mx_x, mx_y = row_max(x), row_max(y)
    else:
        xn = jnp.where(valid, x, neg)          # full-tile temp (mask path)
        yn = jnp.where(valid, y, neg)
        mx_x = xn.max((0, 1)).astype(jnp.float32)
        mx_y = yn.max((0, 1)).astype(jnp.float32)

    # Fcat channel order: color first (reference CODON_x4.py:85)
    tile_sum = jnp.concatenate([row_sum(y), row_sum(x)])[None, None, :]
    tile_max = jnp.concatenate([mx_y, mx_x])[None, None, :]

    @pl.when(h == 0)
    def _():
        sum_ref[...] = tile_sum
        max_ref[...] = tile_max

    @pl.when(h > 0)
    def _():
        sum_ref[...] += tile_sum
        max_ref[...] = jnp.maximum(max_ref[...], tile_max)

    # channel-pooled maps over the 2C concat (decomposes per tower) —
    # computed from RAW values: masked positions are already zero upstream
    # (matching the XLA path's zeros), and rows >= h_total are clipped on
    # store, so no masking belongs here.
    cmax_ref[0] = jnp.maximum(x.max(-1), y.max(-1)).astype(cmax_ref.dtype)
    cmean_ref[0] = ((x.sum(-1, dtype=jnp.float32) +
                     y.sum(-1, dtype=jnp.float32)) / (2 * c)
                    ).astype(cmean_ref.dtype)


def cac_stats(out: jax.Array, out_c: jax.Array, mask=None, *,
              tile_h: int = 64, interpret: bool = False):
    """-> (ch_sum (N,2C) f32, ch_max (N,2C) f32, cmax (N,H,W), cmean).

    mask: optional (N,H,W,1) validity — excludes padding from the max.
    """
    n, h, w, c = out.shape
    th = min(tile_h, h)
    grid = (n, _cdiv(h, th))
    kern = functools.partial(_stats_kernel, th=th, h_total=h, c=c,
                             with_mask=mask is not None)
    img = pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM)
    in_specs = [img, img]
    args = [out, out_c]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, th, w, 1), lambda i, j: (i, j, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_specs=[
            pl.BlockSpec((1, 1, 2 * c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1, 2 * c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, 2 * c), jnp.float32),
            jax.ShapeDtypeStruct((n, h, w), out.dtype),
            jax.ShapeDtypeStruct((n, h, w), out.dtype),
        ],
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# kernel 2: 5x5 stencil (2->1 "conv") on the pooled maps, whole image in VMEM
# ---------------------------------------------------------------------------

def _logits_kernel(cmax_ref, cmean_ref, w_ref, out_ref, *, k: int):
    r = (k - 1) // 2
    a = cmax_ref[0].astype(jnp.float32)    # (H, W)
    b = cmean_ref[0].astype(jnp.float32)
    h, w = a.shape
    ap = jnp.pad(a, ((r, r), (r, r)))
    bp = jnp.pad(b, ((r, r), (r, r)))
    acc = jnp.zeros((h, w), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            acc = acc + (w_ref[dy, dx, 0, 0] * ap[dy:dy + h, dx:dx + w] +
                         w_ref[dy, dx, 1, 0] * bp[dy:dy + h, dx:dx + w])
    out_ref[0] = acc.astype(out_ref.dtype)


def spatial_logits(cmax: jax.Array, cmean: jax.Array, sp_w: jax.Array,
                   *, interpret: bool = False):
    """sp_w: (k, k, 2, 1) HWIO (channel 0 = max, 1 = mean). -> (N,H,W)."""
    n, h, w = cmax.shape
    k = sp_w.shape[0]
    return pl.pallas_call(
        functools.partial(_logits_kernel, k=k),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), cmax.dtype),
        interpret=interpret,
    )(cmax, cmean, sp_w.astype(jnp.float32))


# ---------------------------------------------------------------------------
# kernel 3: fused gate application + long-skip residual
# ---------------------------------------------------------------------------

def _apply_kernel(out_ref, outc_ref, in_ref, inc_ref, gate_ref, sp_ref,
                  new_out_ref, new_outc_ref):
    # Build the gate in f32 (Mosaic only supports minor-dim insertion on
    # 32-bit types), cast once, then gate in the activation dtype — one
    # f32 + one bf16 temp instead of four f32 tiles.
    # (A flat (TH, W*C) full-lane variant was tried: pltpu.repeat has TILE
    # semantics, not np.repeat, so the sp(w)xg(c) pattern can't be built
    # without a relayout — keep NHWC.)
    dt = out_ref.dtype
    g = gate_ref[0, 0]                                    # (C,) f32
    sp = jax.nn.sigmoid(sp_ref[0].astype(jnp.float32))    # (TH, W) f32
    ad = (sp[:, :, None] * g[None, None, :]).astype(dt)   # (TH, W, C)
    new_out_ref[0] = out_ref[0] * ad + in_ref[0]
    new_outc_ref[0] = outc_ref[0] * ad + inc_ref[0]


def cac_apply(out, out_c, inputs, inputs_c, gate, sp_logits, *,
              tile_h: int = 64, interpret: bool = False):
    """out/out_c/inputs/inputs_c: (N,H,W,C); gate (N,1,C) f32 post-sigmoid;
    sp_logits (N,H,W) pre-sigmoid. Returns gated+residual towers."""
    n, h, w, c = out.shape
    th = min(tile_h, h)
    grid = (n, _cdiv(h, th))
    img = pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _apply_kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[img, img, img, img,
                  pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, th, w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[img, img],
        out_shape=[jax.ShapeDtypeStruct(out.shape, out.dtype),
                   jax.ShapeDtypeStruct(out.shape, out.dtype)],
        interpret=interpret,
    )(out, out_c, inputs, inputs_c, gate, sp_logits)


# ---------------------------------------------------------------------------
# full stage
# ---------------------------------------------------------------------------

def cac_stage_pallas(out, out_c, inputs, inputs_c, w1, b1, w2, b2, sp_w,
                     mask=None, *, interpret: bool = False):
    """One CAC stage, Pallas-fused. Returns (new_out, new_out_c).

    mask: optional (N,H,W,1) validity for padded batches. Sums and the
    pooled spatial maps are correct without it (masked convs already zero
    the padding — zeros match SAME-padding semantics); the global max and
    the avg denominator need it.
    """
    n, h, w, c = out.shape
    ch_sum, ch_max, cmax, cmean = cac_stats(out, out_c, mask,
                                            interpret=interpret)
    if mask is not None:
        denom = jnp.sum(mask.astype(jnp.float32),
                        axis=(1, 2, 3))[:, None, None]   # (N,1,1)
    else:
        denom = float(h * w)
    avg = ch_sum / denom                                  # (N,1,2C)

    def mlp(v):
        hdd = jax.nn.relu(v @ w1.astype(v.dtype) + b1.astype(v.dtype))
        return hdd @ w2.astype(v.dtype) + b2.astype(v.dtype)

    gate = jax.nn.sigmoid(mlp(avg) + mlp(ch_max))        # (N, C) f32
    sp = spatial_logits(cmax, cmean, sp_w, interpret=interpret)
    return cac_apply(out, out_c, inputs, inputs_c, gate, sp,
                     interpret=interpret)
