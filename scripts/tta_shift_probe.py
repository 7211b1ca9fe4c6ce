"""Probe: does translation self-ensembling (shift-TTA) help at eval time?

Extends the dihedral TTA family (models/tta.py) with +-1 px translations:
predict on edge-padded shifted copies of the input pair, unshift the
predictions, and average them INTO the 4-flip TTA output. The degradation
in input_depth is phase-locked to the subsampling grid, so a 1-px shift
changes the input's phase relative to that grid — the probe measures
whether averaging over phases denoises (like flips do) or mismatches the
learned degradation (like the pyramid/mix-scales/TTT family, all measured
negative in ROUND3.md).

Pure eval-time lever: no training, ONE float-output TTA4 program shared
by all shifts and batches (a fresh compile — the cli eval program fuses
uint8 quantization and is a different cache entry).

Usage:
  python scripts/tta_shift_probe.py --scale 4 \
      --ckpt checkpoints/x4_holdout2.npz --json /tmp/shift_probe.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def shift2d(a: np.ndarray, dy: int, dx: int) -> np.ndarray:
    """Shift a (H, W) array by (dy, dx) with edge replication."""
    p = np.pad(a, ((1, 1), (1, 1)), mode="edge")
    h, w = a.shape
    return p[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]


SHIFTS = ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--data-root", default="/root/reference")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--variant", default="codon")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    from codon_tpu.checkpoint import load_npz
    from codon_tpu.core.params import BF16
    from codon_tpu.data.io import discover_pairs, load_sample
    from codon_tpu.data.pipeline import make_batch
    from codon_tpu.metrics import masked_rmse, ssim_exact
    from codon_tpu.models.tta import make_tta_forward
    from codon_tpu.models.variants import get_variant
    from codon_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    scale_dir = os.path.join(args.data_root, f"CODON_X{args.scale}")
    names = discover_pairs(scale_dir)
    variant = get_variant(args.variant, dtypes=BF16)
    params = load_npz(args.ckpt)
    params.pop("act_scales", None)

    base = lambda p, d, c, m: variant.forward(p, d, c, mask=m)
    fwd = jax.jit(make_tta_forward(base))  # standard TTA4, float out

    samples = [load_sample(scale_dir, n) for n in names]
    # one dataset-wide padded shape (the cli eval pad_to_max policy): all
    # 5 shifts x all batches reuse ONE compiled program
    from codon_tpu.data.pipeline import _round_up
    pad = 32  # cli --pad-multiple default
    fixed_hw = (_round_up(max(s.depth.shape[0] for s in samples), pad),
                _round_up(max(s.depth.shape[1] for s in samples), pad))
    # accumulate float predictions per image: {name: {shift: (h,w) float}}
    preds = {n: {} for n in names}
    for dy, dx in SHIFTS:
        shifted = []
        for s in samples:
            import dataclasses as _dc
            shifted.append(_dc.replace(
                s,
                depth=shift2d(s.depth, dy, dx),
                color=shift2d(s.color, dy, dx)))
        for i in range(0, len(shifted), args.batch):
            group = shifted[i:i + args.batch]
            b = make_batch(group, pad, target_batch=args.batch,
                           fixed_hw=fixed_hw)
            # keep ONE jit signature: make_batch returns mask=None for a
            # uniform batch, which would retrace the program
            m = b.mask
            if m is None:
                import jax.numpy as jnp
                m = jnp.ones_like(b.depth)
            out = np.asarray(fwd(params, b.depth, b.color, m))
            for j, name in enumerate(b.names):
                h, w = b.sizes[j]
                pred = out[j, :h, :w, 0].astype(np.float64)
                preds[name][(dy, dx)] = shift2d(pred, -dy, -dx)
        print(f"shift ({dy:+d},{dx:+d}) done", flush=True)

    def score(name, pred_float):
        label = next(s.label for s in samples if s.name == name)
        # match the deployment quantization (cli fwd_u8 truncates
        # (clip(out,0,1)*255).astype(uint8) in f32 ON DEVICE) — clip and
        # multiply in f32 so the rare half-ulp-below-integer pixels
        # truncate the same way they would on device
        f32 = np.clip(pred_float.astype(np.float32), np.float32(0.0),
                      np.float32(1.0)) * np.float32(255.0)
        u8 = f32.astype(np.uint8)
        return (masked_rmse(label, u8), ssim_exact(label / 255, u8 / 255))

    rows = []
    for n in names:
        r0, s0 = score(n, preds[n][(0, 0)])                 # plain TTA4
        avg5 = np.mean([preds[n][sh] for sh in SHIFTS], 0)  # + 4 shifts
        r5, s5 = score(n, avg5)
        rows.append({"name": n, "tta4_rmse": r0, "tta4_ssim": s0,
                     "shift5_rmse": r5, "shift5_ssim": s5})
        print(f"{n}: tta4 {r0:.4f} -> shift5 {r5:.4f}", flush=True)
    m0 = float(np.mean([r["tta4_rmse"] for r in rows]))
    m5 = float(np.mean([r["shift5_rmse"] for r in rows]))
    print(f"mean tta4 {m0:.4f} -> +4-shift ensemble {m5:.4f}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"scale": args.scale, "ckpt": args.ckpt,
                       "mean_tta4": m0, "mean_shift5": m5,
                       "per_image": rows}, f, indent=1)
        print(f"written {args.json}")


if __name__ == "__main__":
    main()
