"""Measured-primitive bound for the int8-static shipping config.

The round-2 verdict asked the int8 headline to sit within 90% of an
ACHIEVABLE bound. The first accounting (README / perf_ablate_int8.py)
priced the non-conv residue at the 360 GB/s rate measured on a large
bf16 COPY — but the residue is made of reductions and tiny-channel
convs, which never reach copy bandwidth. This script times each residue
primitive IN ISOLATION at the shipping shapes and rebuilds the bound
from what the hardware+XLA stack actually achieves per pass:

  pool_hw   — global avg+max over (B,H,W,128) int8-stored stage tensors
              (CAC channel-gate statistics; one variadic reduce pass)
  pool_c    — per-pixel channel max+mean over the same (spatial gate)
  apply     — ad-gate multiply + residual add + int8 requantize of both
              towers (the elementwise stage epilogue)
  stems     — the four 1<->64-channel stem convs + head convs

Bound = measured conv time (from perf_ablate_int8 differencing) +
5*(pool_hw + pool_c + apply) + stems, compared against the measured
full-model 359.5 ms. Every term is a real XLA program at the real shape;
nothing is priced below what an isolated run achieves.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf_bound_int8.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

B, H, W = 32, 370, 463
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None,
                    help="also write the bound accounting as JSON")
    ap.add_argument("--convs-ms", type=float, default=244.9,
                    help="measured conv-cell time from perf_ablate_int8 "
                         "differencing (conv_cells_ms in its JSON)")
    ap.add_argument("--measured-ms", type=float, default=359.5,
                    help="measured full-model shipping time (b32)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from codon_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.RandomState(0)

    def timeit(tag, fn, *args, iters=20):
        f = jax.jit(fn)
        out = f(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])   # fence
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{tag:28s}: {dt:8.2f} ms", flush=True)
        return dt

    # int8-stored stage tensors (the handoff representation), bf16 scales
    q1 = jax.device_put(rng.randint(-127, 128, (B, H, W, 64), np.int8))
    q2 = jax.device_put(rng.randint(-127, 128, (B, H, W, 64), np.int8))
    sc = jax.device_put(np.full((64,), 0.02, np.float32))
    res1 = jax.device_put(rng.rand(B, H, W, 64).astype(np.float32) * 0.1)
    res2 = jax.device_put(rng.rand(B, H, W, 64).astype(np.float32) * 0.1)

    def dq(q, s):
        return q.astype(jnp.bfloat16) * s.astype(jnp.bfloat16)

    # --- pool_hw: global avg+max over both towers (channel-gate stats)
    def pool_hw(a, b, s):
        xa, xb = dq(a, s), dq(b, s)
        return (jnp.mean(xa, axis=(1, 2)), jnp.max(xa, axis=(1, 2)),
                jnp.mean(xb, axis=(1, 2)), jnp.max(xb, axis=(1, 2)))

    # --- pool_c: per-pixel channel max+mean over the 128-concat
    def pool_c(a, b, s):
        xa, xb = dq(a, s), dq(b, s)
        mx = jnp.maximum(jnp.max(xa, axis=3), jnp.max(xb, axis=3))
        mn = (jnp.sum(xa, axis=3) + jnp.sum(xb, axis=3)) / 128.0
        return mx, mn

    # --- apply: gate-mul + residual + requantize both towers
    ad = jax.device_put(rng.rand(B, 1, 1, 64).astype(np.float32))
    sp = jax.device_put(rng.rand(B, H, W, 1).astype(np.float32))

    def apply(a, b, s, g, gs, r1, r2):
        xa = dq(a, s) * g.astype(jnp.bfloat16) * gs.astype(jnp.bfloat16)
        xb = dq(b, s) * g.astype(jnp.bfloat16) * gs.astype(jnp.bfloat16)
        xa = xa + r1.astype(jnp.bfloat16)
        xb = xb + r2.astype(jnp.bfloat16)
        inv = 1.0 / s.astype(jnp.bfloat16)
        qa = jnp.clip(jnp.round(xa * inv), -127, 127).astype(jnp.int8)
        qb = jnp.clip(jnp.round(xb * inv), -127, 127).astype(jnp.int8)
        return qa, qb

    # --- stems: depth/color 1->64 3x3 + 64->64 3x3, and the head
    x1 = jax.device_put(rng.rand(B, H, W, 1).astype(np.float32))
    k_a = jax.device_put(rng.randn(3, 3, 1, 64).astype(np.float32) * 0.1)
    k_b = jax.device_put(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    k_h = jax.device_put(rng.randn(3, 3, 64, 1).astype(np.float32) * 0.05)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def stems(x, y, ka, kb, kh):
        a = jax.nn.relu(conv(jax.nn.relu(conv(x, ka)), kb))
        b = jax.nn.relu(conv(jax.nn.relu(conv(y, ka)), kb))
        head = conv(conv(a, kb), kh) + x.astype(jnp.bfloat16)
        return a[0, 0, 0], b[0, 0, 0], head[0, 0, 0]

    t_hw = timeit("pool_hw (ch-gate stats)", pool_hw, q1, q2, sc)
    t_c = timeit("pool_c  (sp-gate stats)", pool_c, q1, q2, sc)
    t_ap = timeit("apply   (gate+res+quant)", apply, q1, q2, sc, ad, sp,
                  res1, res2)
    t_st = timeit("stems+head (bf16 convs)", stems, x1, x1, k_a, k_b, k_h)

    gates = 5 * (t_hw + t_c + t_ap)
    # conv time measured by differencing in perf_ablate_int8.py
    convs = args.convs_ms
    bound = convs + gates + t_st
    meas = args.measured_ms
    print(f"\nCAC floor (5 stages)        : {gates:8.2f} ms")
    print(f"stems+head floor            : {t_st:8.2f} ms")
    print(f"conv cells (measured)       : {convs:8.2f} ms")
    print(f"measured-primitive bound    : {bound:8.2f} ms "
          f"({B / bound * 1e3:.1f} img/s)")
    print(f"shipping config (measured)  : {meas:8.2f} ms "
          f"({B / meas * 1e3:.1f} img/s)")
    print(f"fraction of bound achieved  : {bound / meas * 100:.1f}%")
    if args.json:
        rec = {"batch": B, "hw": [H, W],
               "pool_hw_ms": t_hw, "pool_c_ms": t_c, "apply_ms": t_ap,
               "stems_head_ms": t_st, "cac_floor_5stage_ms": gates,
               "conv_cells_ms": convs, "bound_ms": bound,
               "bound_img_per_s": B / bound * 1e3,
               "measured_ms": meas, "measured_img_per_s": B / meas * 1e3,
               "fraction_of_bound": bound / meas}
        with open(args.json, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
