"""Regenerate the README/PARITY evidence tables from committed eval JSONs.

Rounds 2-4 each shipped evidence tables that lagged the round's own
archived results (VERDICT r4 weak #2, third consecutive flag). This
script makes the export mechanical: it scans `checkpoints/*_eval.json`,
computes the best rows per category, and rewrites the marked blocks

    <!-- AUTO-EVIDENCE:<name> (scripts/refresh_evidence.py) -->
    ...
    <!-- /AUTO-EVIDENCE:<name> -->

in README.md and PARITY.md in place. Every number in those blocks is
therefore traceable to a named committed JSON by construction.

Usage:
    python scripts/refresh_evidence.py            # rewrite in place
    python scripts/refresh_evidence.py --check    # exit 1 on drift
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CK = os.path.join(REPO, "checkpoints")

# Reference archived-output means, BASELINE.md (metric defs from the
# reference's own test.py / ssim_2.py)
REF = {4: (1.7779, 0.9542), 8: (3.4789, 0.9370), 16: (5.8032, 0.9097)}

# Declared shipping incumbents (PARITY.md "final" section): the int8
# gate/stem handoff generation; refresh attempts at x8/x16 failed the
# per-image non-regression gate at every recipe tried (ship4 AND ship5
# arms archived) and the incumbents stand.
SHIPPING = {4: "x4_ship4_qat_static_int8_eval.json",
            8: "x8_qat_static2_int8_eval.json",
            16: "x16_qat_static2_int8_eval.json"}


def _load(path):
    with open(path) as f:
        return json.load(f)


def _scan():
    rows = []
    for p in sorted(glob.glob(os.path.join(CK, "*_eval.json"))):
        name = os.path.basename(p)
        m = re.match(r"x(4|8|16)_", name)
        if not m:
            continue
        try:
            d = _load(p)
        except Exception:
            continue
        if "mean_rmse" not in d:
            continue
        rows.append({
            "file": name,
            "scale": int(m.group(1)),
            "holdout": "holdout" in name,
            "int8": "int8" in name,
            "tta": "tta" in name,
            "rmse": float(d["mean_rmse"]),
            "ssim": float(d.get("mean_ssim", 0.0)),
        })
    return rows


def _best(rows, **pred):
    cand = [r for r in rows
            if all(r[k] == v for k, v in pred.items())]
    return min(cand, key=lambda r: r["rmse"]) if cand else None


def _short(fname):
    return fname.replace("_eval.json", "")


def holdout_table(rows):
    out = ["| Scale | holdout float best | holdout int8-static plain | "
           "int8-static + TTA | reference archived |",
           "|---|---|---|---|---|"]
    for s in (4, 8, 16):
        fb = _best(rows, scale=s, holdout=True, int8=False)
        ip = _best(rows, scale=s, holdout=True, int8=True, tta=False)
        it = _best(rows, scale=s, holdout=True, int8=True, tta=True)
        r, sm = REF[s]
        out.append(
            f"| x{s} | **{fb['rmse']:.3f}** / {fb['ssim']:.3f} "
            f"(`{_short(fb['file'])}`) "
            f"| **{ip['rmse']:.3f}** (`{_short(ip['file'])}`) "
            f"| **{it['rmse']:.3f}** (`{_short(it['file'])}`) "
            f"| {r:.3f} / {sm:.3f} |")
    return "\n".join(out)


def shipping_table(rows):
    out = ["| Scale | shipping int8-static (plain / TTA) | "
           "reference archived | eval file |",
           "|---|---|---|---|"]
    for s in (4, 8, 16):
        f = SHIPPING[s]
        d = _load(os.path.join(CK, f))
        tta_f = f.replace("_int8_eval", "_int8_tta8_eval")
        if not os.path.exists(os.path.join(CK, tta_f)):
            tta_f = f.replace("_int8_eval", "_int8_tta_eval")
        t = (_load(os.path.join(CK, tta_f))["mean_rmse"]
             if os.path.exists(os.path.join(CK, tta_f)) else None)
        r, _ = REF[s]
        tcell = f"{t:.3f}" if t is not None else "—"
        out.append(f"| x{s} | **{d['mean_rmse']:.3f}** / {tcell} "
                   f"| {r:.3f} | `{_short(f)}` |")
    return "\n".join(out)


def _splice(text, name, block):
    begin = f"<!-- AUTO-EVIDENCE:{name} (scripts/refresh_evidence.py) -->"
    end = f"<!-- /AUTO-EVIDENCE:{name} -->"
    if begin not in text or end not in text:
        raise SystemExit(f"marker block {name!r} not found")
    pre, rest = text.split(begin, 1)
    _, post = rest.split(end, 1)
    return f"{pre}{begin}\n{block}\n{end}{post}"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if any table would change")
    args = ap.parse_args()

    rows = _scan()
    blocks = {"holdout": holdout_table(rows),
              "shipping": shipping_table(rows)}
    drift = False
    for fname, names in (("README.md", ("holdout",)),
                         ("PARITY.md", ("holdout", "shipping"))):
        path = os.path.join(REPO, fname)
        with open(path) as f:
            text = f.read()
        new = text
        for n in names:
            new = _splice(new, n, blocks[n])
        if new != text:
            drift = True
            if args.check:
                print(f"{fname}: evidence tables out of date")
            else:
                with open(path, "w") as f:
                    f.write(new)
                print(f"{fname}: refreshed")
    if not drift:
        print("evidence tables up to date")
    return 1 if (drift and args.check) else 0


if __name__ == "__main__":
    sys.exit(main())
