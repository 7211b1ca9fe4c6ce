"""Test-time training (ZSSR-style internal learning) probe.

The last quality gap vs the reference is per-image RMSE on scenes held
out of training (x4 Art 3.53 vs the archived 2.64) — a data gap, since
the reference trained on external corpora. This probe measures the one
lever that needs NO extra data: at eval time, fine-tune the model on the
test image's own internal statistics (Shocher et al., "Zero-Shot
Super-Resolution", CVPR 2018). For a test pair (degraded depth D, color
guide C) we re-degrade D with the task's own operator (bicubic down-up,
codon_tpu/train/data.py synthesize_lr) to get D2, fine-tune a few
hundred steps on patches of (D2, C) -> D — no ground truth touched —
then run the adapted weights on (D, C).

Legitimate at deployment: uses only the inputs the model is handed.

MEASURED NEGATIVE (round 3, x4 holdout ckpt x4_holdout2, Art/Cones/Teddy):
every image regresses at every setting tried — steps=300 lr=2e-5 mean
RMSE 2.48 -> 4.23; steps=100 lr=3e-6 mean 2.48 -> 3.35 (archived in
checkpoints/ttt_probe_x4_*.json). The internal pair re-degrades the
already-degraded input with the synthesized bicubic down-up operator, and
that proxy task mismatches the real restoration task the same way every
other degradation-mismatch lever did here (round-2 pyramid augmentation,
round-3 --mix-scales): fine-tuning a strong prior on it actively destroys
the prior. Kept as the documented dead end for "can test-time internal
learning close the held-out per-image gap" — it cannot, on this task.

Usage:
  python scripts/ttt_probe.py --scale 4 --ckpt checkpoints/x4_holdout2.npz \
      --images Art,Cones,Teddy --steps 300 --lr 2e-5 --tta
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pad_to(img: np.ndarray, H: int, W: int) -> np.ndarray:
    h, w = img.shape
    out = np.zeros((H, W), img.dtype)
    out[:h, :w] = img
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, choices=(4, 8, 16), default=4)
    ap.add_argument("--data-root", default="/root/reference")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--images", default="Art,Cones,Teddy")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=2e-5)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--augment", choices=("full", "flips", "none"),
                    default="flips")
    ap.add_argument("--tta", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (plumbing test)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from codon_tpu.checkpoint import load_npz
    from codon_tpu.core.params import BF16
    from codon_tpu.data.io import load_sample
    from codon_tpu.metrics import masked_rmse, ssim_exact
    from codon_tpu.models.variants import get_variant
    from codon_tpu.train.data import PatchSampler, synthesize_lr
    from codon_tpu.train.trainer import TrainConfig, make_train_step

    scale_dir = os.path.join(args.data_root, f"CODON_X{args.scale}")
    variant = get_variant("codon", dtypes=BF16)
    base_params = load_npz(args.ckpt)
    if isinstance(base_params, dict):
        base_params.pop("act_scales", None)

    names = [n for n in args.images.split(",") if n]
    samples = [load_sample(scale_dir, n) for n in names]
    # one padded shape for every image so eval compiles once
    mult = 32
    H = max(s.depth.shape[0] for s in samples)
    W = max(s.depth.shape[1] for s in samples)
    H = (H + mult - 1) // mult * mult
    W = (W + mult - 1) // mult * mult

    def raw_fwd(p, d, c, m):
        return variant.forward(p, d, c, mask=m, ops=None)

    fwd = raw_fwd
    if args.tta:
        from codon_tpu.models.tta import make_tta_forward
        fwd = make_tta_forward(raw_fwd)

    @jax.jit
    def fwd_u8(p, d, c, m):
        out = fwd(p, d, c, m)
        return (jnp.clip(out[..., 0], 0.0, 1.0) * 255).astype(jnp.uint8)

    def score(params, s):
        h, w = s.depth.shape
        d = pad_to(s.depth, H, W)[None, ..., None].astype(np.float32) / 255
        c = pad_to(s.color, H, W)[None, ..., None].astype(np.float32) / 255
        m = np.zeros((1, H, W, 1), np.float32)
        m[0, :h, :w, 0] = 1.0
        out = np.asarray(fwd_u8(params, d, c, m))[0, :h, :w]
        return (masked_rmse(s.label, out),
                ssim_exact(s.label / 255, out / 255))

    cfg = TrainConfig(learning_rate=args.lr, warmup_steps=args.warmup,
                      total_steps=args.steps)
    step_fn, tx = make_train_step(variant, cfg, donate=False)

    results = []
    for s in samples:
        r0, s0 = score(base_params, s)
        # internal pair: re-degraded input -> input, guided by the color
        sampler = PatchSampler(
            labels=[s.depth], colors=[s.color], scale=args.scale,
            patch=args.patch, batch=args.batch, seed=0,
            augment=args.augment,
            degraded=[synthesize_lr(s.depth, args.scale)]).prefetch(2)
        params = jax.tree.map(jnp.asarray, base_params)
        opt_state = tx.init(params)
        t0 = time.time()
        for i in range(args.steps):
            params, opt_state, metrics = step_fn(params, opt_state,
                                                 sampler.sample())
        jax.block_until_ready(params)
        sampler.close()
        r1, s1 = score(params, s)
        dt = time.time() - t0
        results.append({"name": s.name, "rmse_before": r0, "ssim_before": s0,
                        "rmse_after": r1, "ssim_after": s1, "ttt_s": dt})
        print(f"{s.name}: rmse {r0:.4f} -> {r1:.4f}  "
              f"ssim {s0:.5f} -> {s1:.5f}  ({dt:.1f}s TTT)")

    mb = float(np.mean([r["rmse_before"] for r in results]))
    ma = float(np.mean([r["rmse_after"] for r in results]))
    print(f"mean rmse: {mb:.4f} -> {ma:.4f}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"scale": args.scale, "ckpt": args.ckpt,
                       "steps": args.steps, "lr": args.lr,
                       "tta": args.tta, "augment": args.augment,
                       "results": results,
                       "mean_before": mb, "mean_after": ma}, f, indent=2)
        print(f"written {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
