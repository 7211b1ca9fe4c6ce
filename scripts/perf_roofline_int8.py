"""Per-conv-site int8 roofline at the shipping operating point (b32).

Round-4 verdict weak #3: the int8 program runs at ~53% of the v5e's
~394 TOPS peak and the conv cells at ~64%, but no artifact says WHICH
shapes carry the shortfall. This script times every conv site of the
packed flagship forward IN ISOLATION at the b32 463x370 shipping shape,
with the shipped checkpoint's weights and static scales, in two input
regimes:

  float  — bf16 input, fused quantize -> int8 conv -> dequant epilogue
           (what a site pays when its producer hands over float)
  int8   — pre-quantized input (the precommit/handoff regime): the conv
           alone + dequant epilogue

Per site it reports ms, achieved TOPS, and % of peak; the weighted sum
(site ms x occurrence count) is compared against the measured full
program so the attribution is checked against reality rather than
assumed. Also times the merged-tower grouped lowering (codon_fused,
now quantizable via compound site names — VERDICT r4 item 6) as a full
program for the archived win/lose number.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
           python scripts/perf_roofline_int8.py --json out.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

B, H, W = 32, 370, 463
PEAK_TOPS = 394.0   # v5e int8
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# (site, weight key(s), kernel hw, cin, cout, occurrences per forward)
# packed_d/c/f kernels are built by pack_kernel_pair at trace time
SITES = [
    ("packed_d", ("conv1", "conv2"), 5, 64, 128, 5),
    ("packed_c", ("conv4", "conv5"), 5, 64, 128, 5),
    ("conv3", ("conv3",), 5, 128, 128, 5),
    ("conv6", ("conv6",), 5, 128, 128, 5),
    ("confuse", ("confuse",), 1, 128, 64, 5),
    ("confuse_c", ("confuse_c",), 1, 128, 64, 5),
    ("conv_input", ("conv_input",), 3, 64, 64, 1),
    ("conv_input_c", ("conv_input_c",), 3, 64, 64, 1),
    ("conv7", ("conv7",), 3, 128, 64, 1),
    ("packed_f", ("conv8", "conv9"), 5, 64, 128, 3),
    ("conv10", ("conv10",), 5, 128, 128, 3),
    ("confuse_fuse", ("confuse_fuse",), 1, 128, 64, 3),
    ("conv11", ("conv11",), 3, 64, 64, 1),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--device-loop", action="store_true",
                    help="time each site inside a device-side fori_loop "
                         "dependency chain instead of host-dispatched "
                         "iterations — removes the per-dispatch host/"
                         "tunnel overhead that pins small isolated "
                         "programs at ~10-15 ms on this platform (first "
                         "run's artifact showed confuse 1x1 'costing' "
                         "10.3 ms = dispatch floor, not compute)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from codon_tpu.checkpoint import load_npz
    from codon_tpu.core.params import BF16
    from codon_tpu.models.codon_net import pack_kernel_pair
    from codon_tpu.models.variants import get_variant
    from codon_tpu.quant_ops import (Int8StaticOps, calibrate_act_scales,
                                     quantize_static)
    from codon_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.RandomState(0)
    ck = next(p for p in ("x4_ship4_qat_static.npz", "x4_qat_static.npz")
              if os.path.exists(os.path.join(REPO, "checkpoints", p)))
    params = load_npz(os.path.join(REPO, "checkpoints", ck))
    scales = params.pop("act_scales")
    ops = Int8StaticOps(scales, compute_dtype=jnp.bfloat16)

    def sync(x):
        np.asarray(x.ravel()[0])

    def timeit(f, *xs):
        jf = jax.jit(f)
        sync(jf(*xs))
        sync(jf(*xs))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jf(*xs)
        sync(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    from jax import lax

    def chain_ms(op, x0, feed_sc, iters=16):
        """ms/op from a device-side dependency chain: y=op(x) feeds back
        into x's shape/dtype (slice or tile channels; re-quantize for the
        int8 regime — the real epilogue), lax.fori_loop'd inside ONE jit.
        Reported as (t_iters - t_1)/(iters-1): dispatch overhead and the
        chain's boundary effects cancel."""
        cin = x0.shape[-1]

        def body(_, x):
            y = op(x)
            z = (y[..., :cin] if y.shape[-1] >= cin
                 else jnp.concatenate([y] * (cin // y.shape[-1]), -1))
            if x0.dtype == jnp.int8:
                return quantize_static(z, feed_sc)
            return z.astype(x0.dtype)

        def prog(n):
            jf = jax.jit(lambda x: lax.fori_loop(0, n, body, x))
            sync(jf(x0))
            sync(jf(x0))
            t0 = time.perf_counter()
            sync(jf(x0))
            return time.perf_counter() - t0

        t_k, t_1 = prog(iters), prog(1)
        return max(t_k - t_1, 1e-9) / (iters - 1) * 1e3

    rows = []
    total_float = total_int8 = total_tflop = 0.0
    for site, wkeys, k, cin, cout, n in SITES:
        if len(wkeys) == 2:
            wkern = pack_kernel_pair(params[wkeys[0]], params[wkeys[1]])
        else:
            wkern = params[wkeys[0]]
        x = jax.device_put(
            (rng.rand(B, H, W, cin) - 0.5).astype(np.float32) * 0.5)
        xb = x.astype(jnp.bfloat16)
        sc = jnp.asarray(np.asarray(scales[site]), jnp.float32)
        x8 = jax.jit(lambda t: quantize_static(t, sc))(xb)
        op = lambda t: ops.conv2d(t, wkern, name=site)
        if args.device_loop:
            ms_f = chain_ms(op, xb, sc)
            ms_q = chain_ms(op, x8, sc)
        else:
            ms_f = timeit(op, xb)
            ms_q = timeit(op, x8)
        tflop = 2 * B * H * W * k * k * cin * cout / 1e12
        rows.append({
            "site": site, "k": k, "cin": cin, "cout": cout, "count": n,
            "ms_float_in": ms_f, "ms_int8_in": ms_q,
            "tflop": tflop,
            "tops_float_in": tflop / (ms_f / 1e3),
            "tops_int8_in": tflop / (ms_q / 1e3),
            "pct_peak_int8_in": tflop / (ms_q / 1e3) / PEAK_TOPS * 100,
        })
        total_float += n * ms_f
        total_int8 += n * ms_q
        total_tflop += n * tflop
        r = rows[-1]
        print(f"RESULT {site:13s} {k}x{k} {cin:3d}->{cout:3d} x{n}: "
              f"float-in {ms_f:6.2f} ms  int8-in {ms_q:6.2f} ms  "
              f"{r['tops_int8_in']:5.0f} TOPS "
              f"({r['pct_peak_int8_in']:4.1f}% peak)", flush=True)

    # full programs for attribution checks
    v = get_variant("codon", dtypes=BF16)
    d = jax.device_put(rng.rand(B, H, W, 1).astype(np.float32))
    c = jax.device_put(rng.rand(B, H, W, 1).astype(np.float32))
    full_ms = timeit(lambda a, b: v.forward(params, a, b, ops=ops), d, c)
    vf = get_variant("codon_fused", dtypes=BF16)
    fused_scales = calibrate_act_scales(
        lambda p, a, b, ops, mask: vf.forward(p, a, b, ops=ops, mask=mask),
        params, [(d[:2], c[:2], None)])
    fops = Int8StaticOps(fused_scales, compute_dtype=jnp.bfloat16)
    fused_ms = timeit(lambda a, b: vf.forward(params, a, b, ops=fops),
                      d, c)

    print()
    print(f"sum of isolated conv sites (float-in): {total_float:7.1f} ms")
    print(f"sum of isolated conv sites (int8-in) : {total_int8:7.1f} ms")
    print(f"conv TFLOP per b{B} batch             : {total_tflop:7.2f}")
    print(f"full packed program                  : {full_ms:7.1f} ms "
          f"({B / full_ms * 1e3:5.1f} img/s)")
    print(f"full merged-tower grouped program    : {fused_ms:7.1f} ms "
          f"({B / fused_ms * 1e3:5.1f} img/s)")
    print(f"program TOPS: {2.54 * B / (full_ms / 1e3):5.0f} "
          f"({2.54 * B / (full_ms / 1e3) / PEAK_TOPS * 100:4.1f}% peak)")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({
                "checkpoint": ck, "batch": B, "hw": [H, W],
                "iters": args.iters, "peak_tops": PEAK_TOPS,
                "sites": rows,
                "sum_sites_float_in_ms": total_float,
                "sum_sites_int8_in_ms": total_int8,
                "conv_tflop_per_batch": total_tflop,
                "full_packed_ms": full_ms,
                "full_fused_grouped_ms": fused_ms,
            }, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
