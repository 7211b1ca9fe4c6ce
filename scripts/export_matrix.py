"""Produce the serving deployment matrix (VERDICT r2 #6).

Exports the shipping config per scale — static-int8 QAT checkpoint with
its calibrated scales baked in — at the reference eval resolution, plus
the quality-flagship TTA-wrapped int8 artifact at x4. Prints one JSON
line per artifact with size and wall times; with --load-check also
deserializes each artifact and times load / first call (compile) /
steady call on the current backend.

Usage:
    python scripts/export_matrix.py [--load-check] [--out-dir artifacts]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 370, 463     # reference eval size (Art.png)


def best_ckpt(scale: int) -> str:
    base = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "checkpoints")
    for name in (f"x{scale}_qat_static2.npz", f"x{scale}_qat_static.npz"):
        p = os.path.join(base, name)
        if os.path.exists(p):
            return p
    raise SystemExit(f"no static QAT checkpoint for x{scale}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="artifacts")
    ap.add_argument("--load-check", action="store_true")
    args = ap.parse_args()

    import jax
    from codon_tpu.checkpoint import load_npz
    from codon_tpu.core.params import BF16
    from codon_tpu.models.variants import get_variant
    from codon_tpu.quant_ops import Int8StaticOps
    from codon_tpu.serve import export_forward, load_exported
    from codon_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    os.makedirs(args.out_dir, exist_ok=True)
    # tta: 0 = plain, 4 = flip quartet, 8 = full dihedral (the quality-
    # flagship eval config, exported at x4)
    jobs = [(4, 0), (8, 0), (16, 0), (4, 4), (4, 8)]
    for scale, tta in jobs:
        variant = get_variant("codon", dtypes=BF16)
        params = load_npz(best_ckpt(scale))
        scales = params.pop("act_scales")
        ops = Int8StaticOps(scales,
                            compute_dtype=variant.cfg.dtypes.compute_dtype)
        name = (f"codon_x{scale}_{W}x{H}_int8"
                f"{f'_tta{tta}' if tta else ''}.codonx")
        path = os.path.join(args.out_dir, name)
        t0 = time.perf_counter()
        nbytes = export_forward(variant, params, (H, W), path,
                                ops=ops, tta=tta)
        rec = {"artifact": name, "scale": scale, "tta": tta,
               "platform": jax.default_backend(),
               "size_mb": round(nbytes / 1e6, 2),
               "export_s": round(time.perf_counter() - t0, 1)}
        if args.load_check:
            t0 = time.perf_counter()
            fn = load_exported(path)
            rec["load_s"] = round(time.perf_counter() - t0, 2)
            rng = np.random.RandomState(0)
            d = rng.rand(1, H, W, 1).astype(np.float32)
            c = rng.rand(1, H, W, 1).astype(np.float32)
            t0 = time.perf_counter()
            out = np.asarray(fn(d, c))
            rec["first_call_s"] = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()
            out = np.asarray(fn(d, c))
            rec["steady_call_s"] = round(time.perf_counter() - t0, 3)
            assert out.shape == (1, H, W, 1) and np.isfinite(out).all()
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
