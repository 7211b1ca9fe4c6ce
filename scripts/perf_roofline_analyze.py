"""Turn the per-site int8 roofline artifact into a floor attribution.

Reads checkpoints/perf_roofline_r5.json (scripts/perf_roofline_int8.py)
and, for every conv site, computes the two NAMED v5e platform floors:

  MXU floor : tflop / 394 TOPS          (v5e int8 systolic-array peak)
  HBM floor : bytes_moved / 819 GB/s    (v5e HBM bandwidth)
              int8-in regime: read cin x 1 B, write cout x 2 B (bf16
              epilogue output); weights are negligible (< 1 MB/site).

The binding roof is max(MXU, HBM); the report gives each site's achieved
ms vs that roof, classifies it compute- vs bandwidth-bound, and sums the
roofs x occurrence counts into a whole-program conv speed-of-light,
which is what the 53%-of-peak headline must be judged against: %-of-peak
counts bandwidth-bound sites (1x1 confuse, 3x3 stems) against the MXU
peak they CANNOT reach on any platform.

Two refinements on top of the physical floors:

  Lane occupancy : the MXU contracts over 128 input-feature lanes and
      produces 128 output-feature columns per pass; XLA's conv lowering
      places cin on the contraction lanes (it does NOT fold the 5x5
      spatial window into lanes — the measured 40%-vs-76% split between
      cin=64 and cin=128 sites at identical kernel size is direct
      evidence). A site with cin or cout < 128 therefore has an
      ACHIEVABLE peak of 394 x min(cin,128)/128 x min(cout,128)/128
      TOPS. The occupancy-priced roof is what "speed of light" means
      for this program's actual shapes on this MXU.

  Dispatch floor : sites measured in isolation each pay a fixed
      dispatch + HBM-latency overhead the fused full program does not;
      it is estimated as the median (ms - roof) over the HBM-bound
      sites (whose roofs are sub-2ms, so the residue IS the overhead)
      and reported as a diagnostic, not subtracted.

Usage: python scripts/perf_roofline_analyze.py \
           [--json checkpoints/perf_roofline_r5.json] [--md]
"""
from __future__ import annotations

import argparse
import json
import os

PEAK_TOPS = 394.0      # v5e int8 MXU peak
HBM_GBPS = 819.0       # v5e HBM bandwidth


def analyze(art: dict) -> dict:
    B = art["batch"]
    H, W = art["hw"]
    px = B * H * W
    rows = []
    sol_ms = 0.0        # speed-of-light: sum over counts of binding roofs
    occ_sol_ms = 0.0    # ...with MXU roofs priced at lane occupancy
    meas_ms = 0.0
    overheads = []      # isolated-dispatch overhead samples (HBM sites)
    for s in art["sites"]:
        mxu_ms = s["tflop"] / PEAK_TOPS * 1e3
        occupancy = (min(s["cin"], 128) / 128.0) * (min(s["cout"], 128)
                                                    / 128.0)
        occ_mxu_ms = mxu_ms / occupancy
        bytes_moved = px * (s["cin"] * 1 + s["cout"] * 2)
        hbm_ms = bytes_moved / (HBM_GBPS * 1e9) * 1e3
        roof_ms = max(mxu_ms, hbm_ms)
        occ_roof_ms = max(occ_mxu_ms, hbm_ms)
        bound = "MXU" if mxu_ms >= hbm_ms else "HBM"
        occ_bound = "MXU" if occ_mxu_ms >= hbm_ms else "HBM"
        ms = s["ms_int8_in"]
        if occ_bound == "HBM":
            overheads.append(ms - occ_roof_ms)
        rows.append({
            "site": s["site"],
            "shape": f"{s['k']}x{s['k']} {s['cin']}->{s['cout']}",
            "count": s["count"],
            "ms": ms,
            "mxu_floor_ms": mxu_ms,
            "hbm_floor_ms": hbm_ms,
            "bound": bound,
            "roof_ms": roof_ms,
            "pct_of_roof": roof_ms / ms * 100.0,
            "mxu_lane_occupancy": occupancy,
            "occ_roof_ms": occ_roof_ms,
            "occ_bound": occ_bound,
            "pct_of_occ_roof": occ_roof_ms / ms * 100.0,
            "pct_peak_mxu": s["pct_peak_int8_in"],
        })
        sol_ms += s["count"] * roof_ms
        occ_sol_ms += s["count"] * occ_roof_ms
        meas_ms += s["count"] * ms
    overheads.sort()
    dispatch_ms = overheads[len(overheads) // 2] if overheads else 0.0
    full = art["full_packed_ms"]
    return {
        "peak_tops": PEAK_TOPS, "hbm_gbps": HBM_GBPS,
        "batch": B, "hw": [H, W],
        "sites": rows,
        "conv_speed_of_light_ms": sol_ms,
        "conv_occupancy_sol_ms": occ_sol_ms,
        "conv_measured_sum_ms": meas_ms,
        "conv_pct_of_sol": sol_ms / meas_ms * 100.0,
        "conv_pct_of_occ_sol": occ_sol_ms / meas_ms * 100.0,
        "isolated_dispatch_overhead_ms": dispatch_ms,
        "full_program_ms": full,
        "full_program_img_per_sec": B / full * 1e3,
        # if every conv ran at its binding roof and nothing else cost a
        # cycle, the program ceiling would be:
        "program_sol_img_per_sec": B / sol_ms * 1e3,
        "program_occ_sol_img_per_sec": B / occ_sol_ms * 1e3,
        "full_program_pct_of_occ_sol": occ_sol_ms / full * 100.0,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json",
                    default=os.path.join(os.path.dirname(__file__), "..",
                                         "checkpoints",
                                         "perf_roofline_r5.json"))
    ap.add_argument("--out", default=None, help="write analysis JSON here")
    ap.add_argument("--md", action="store_true",
                    help="print a markdown table")
    args = ap.parse_args()

    art = json.load(open(args.json))
    a = analyze(art)

    if args.md:
        print("| site | shape | n | ms | MXU floor | HBM floor | bound |"
              " % of roof | occ | % of occ-roof |")
        print("|---|---|---|---|---|---|---|---|---|---|")
        for r in a["sites"]:
            print(f"| {r['site']} | {r['shape']} | {r['count']} |"
                  f" {r['ms']:.2f} | {r['mxu_floor_ms']:.2f} |"
                  f" {r['hbm_floor_ms']:.2f} | {r['bound']} |"
                  f" {r['pct_of_roof']:.0f}% |"
                  f" {r['mxu_lane_occupancy']:.2f} |"
                  f" {r['pct_of_occ_roof']:.0f}% |")
    else:
        for r in a["sites"]:
            print(f"{r['site']:13s} {r['shape']:15s} x{r['count']} "
                  f"{r['ms']:6.2f} ms  roof {r['roof_ms']:5.2f} ms "
                  f"({r['bound']})  {r['pct_of_roof']:3.0f}% of roof  "
                  f"occ {r['mxu_lane_occupancy']:.2f} -> "
                  f"{r['pct_of_occ_roof']:3.0f}% of occ-roof"
                  f" ({r['occ_bound']})")
    print(f"\nconv speed-of-light (sum of binding roofs x count): "
          f"{a['conv_speed_of_light_ms']:.1f} ms "
          f"(lane-occupancy-priced: {a['conv_occupancy_sol_ms']:.1f} ms)")
    print(f"conv measured sum: {a['conv_measured_sum_ms']:.1f} ms "
          f"({a['conv_pct_of_sol']:.0f}% of SoL, "
          f"{a['conv_pct_of_occ_sol']:.0f}% of occupancy SoL)")
    print(f"isolated-dispatch overhead estimate (median HBM-site "
          f"residue): {a['isolated_dispatch_overhead_ms']:.1f} ms/site")
    print(f"full program: {a['full_program_ms']:.1f} ms "
          f"({a['full_program_img_per_sec']:.1f} img/s); "
          f"conv-only SoL ceiling {a['program_sol_img_per_sec']:.1f} "
          f"img/s; occupancy-priced conv ceiling "
          f"{a['program_occ_sol_img_per_sec']:.1f} img/s -> the fused "
          f"program runs at {a['full_program_pct_of_occ_sol']:.0f}% of "
          f"the occupancy conv SoL")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(a, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
