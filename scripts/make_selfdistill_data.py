"""Assemble a self-distillation training dir from model pseudo-labels.

VERDICT r4 item 1, arm (c): pseudo-label the held-out inputs with the
best TTA8 ensemble, fine-tune the solo on them, re-gate. This script
builds the training directory: the reference scale dir's
input_depth/input_color/input_label are copied, then the held-out
scenes' labels are REPLACED by the model outputs (PNGs written by
`cli eval --out`). Ground truth for the held-out scenes never enters
training — the replaced labels come from a model that itself never saw
them.

Usage:
    python scripts/make_selfdistill_data.py --scale 4 \
        --pseudo-dir /tmp/x4_pseudo --holdout Art,Cones,Teddy \
        --out /tmp/x4_sd_data
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys

REF = "/root/reference"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, required=True, choices=(4, 8, 16))
    ap.add_argument("--pseudo-dir", required=True,
                    help="dir of eval --out PNGs (the pseudo-labels)")
    ap.add_argument("--holdout", required=True,
                    help="comma list of scene names whose labels are "
                         "replaced by pseudo-labels")
    ap.add_argument("--out", required=True)
    ap.add_argument("--ref-root", default=REF)
    args = ap.parse_args()

    src = os.path.join(args.ref_root, f"CODON_X{args.scale}")
    holdout = [s.strip() for s in args.holdout.split(",") if s.strip()]
    os.makedirs(args.out, exist_ok=True)
    for sub in ("input_depth", "input_color", "input_label"):
        d = os.path.join(args.out, sub)
        os.makedirs(d, exist_ok=True)
        for f in sorted(os.listdir(os.path.join(src, sub))):
            if f.lower().endswith(".png"):
                shutil.copy2(os.path.join(src, sub, f), os.path.join(d, f))

    missing = []
    for name in holdout:
        p = os.path.join(args.pseudo_dir, name + ".png")
        if not os.path.exists(p):
            missing.append(name)
            continue
        shutil.copy2(p, os.path.join(args.out, "input_label",
                                     name + ".png"))
        print(f"label {name}: pseudo ({p})")
    if missing:
        print(f"missing pseudo-labels for {missing}", file=sys.stderr)
        return 1
    print(f"self-distill dir ready: {args.out} "
          f"({len(holdout)} pseudo, rest GT)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
