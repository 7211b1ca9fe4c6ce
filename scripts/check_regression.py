"""Per-image non-regression gate for shipping-checkpoint refreshes.

Round-3 lesson (VERDICT r3 "what's weak" #1): gating a shipping refresh on
the MEAN let a 49% Art regression through (x4_ship2 Art 3.354 vs its
predecessor's 2.255). Rule, recorded in PARITY.md: a shipping refresh may
not worsen ANY image's RMSE by more than 10% vs the checkpoint it
replaces, and the mean must not worsen at all.

Usage:
    python scripts/check_regression.py OLD_eval.json NEW_eval.json \
        [--tol 0.10]

Exit 0 = gate passed; exit 1 = regression, with a per-image report.
"""
from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    return {"mean": d["mean_rmse"],
            "per": {p["name"]: p["rmse"] for p in d["per_image"]}}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old", help="eval JSON of the checkpoint being replaced")
    ap.add_argument("new", help="eval JSON of the candidate refresh")
    ap.add_argument("--tol", type=float, default=0.10,
                    help="max allowed per-image RMSE worsening (fraction)")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    if set(old["per"]) != set(new["per"]):
        # A refresh evaluated on a subset could otherwise pass while
        # hiding a regression on the images it skipped.
        only_old = sorted(set(old["per"]) - set(new["per"]))
        only_new = sorted(set(new["per"]) - set(old["per"]))
        print(f"image sets differ (only in old: {only_old}, "
              f"only in new: {only_new}) — gate requires identical sets",
              file=sys.stderr)
        return 1
    common = sorted(old["per"])
    bad = []
    for name in common:
        o, n = old["per"][name], new["per"][name]
        worse = (n - o) / max(o, 1e-9)
        flag = "REGRESSION" if worse > args.tol else ""
        print(f"{name:12s} {o:8.3f} -> {n:8.3f}  ({worse:+7.1%}) {flag}")
        if worse > args.tol:
            bad.append(name)
    print(f"{'mean':12s} {old['mean']:8.3f} -> {new['mean']:8.3f}")
    if new["mean"] > old["mean"]:
        bad.append("mean")
    if bad:
        print(f"GATE FAILED: {bad} (per-image tol {args.tol:.0%}, "
              f"mean must not worsen)")
        return 1
    print("GATE PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
