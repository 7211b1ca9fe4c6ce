"""Ablation timing at the SHIPPING operating point: int8-static, b32.

Round-2 published the bf16 accounting (~96% of MXU peak for the conv
cells); this script is the int8 equivalent the round-2 verdict asked for:
where do the ~391 ms per 32-image batch go once the convs run int8, and
how close is each non-conv component to its HBM-bandwidth floor?

Method: time cfg-stripped forwards and difference (more robust than trace
parsing through the axon tunnel — scripts/perf_ablate.py note). Scales
come from the shipped x4_qat_static.npz checkpoint.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf_ablate_int8.py
"""
import dataclasses as dc
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
                    help="also write the accounting as a JSON artifact")
    args = ap.parse_args()

    import jax
    from codon_tpu.checkpoint import load_npz
    from codon_tpu.core.params import BF16
    from codon_tpu.models.codon_net import codon_forward
    from codon_tpu.models.variants import get_variant
    from codon_tpu.quant_ops import Int8StaticOps
    from codon_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.RandomState(0)
    v = get_variant("codon", dtypes=BF16)
    params = load_npz(os.path.join(REPO, "checkpoints",
                                   "x4_qat_static.npz"))
    act_scales = params.pop("act_scales")
    d = jax.device_put(rng.rand(B, H, W, 1).astype(np.float32))
    c = jax.device_put(rng.rand(B, H, W, 1).astype(np.float32))

    def sync(x):
        np.asarray(x.ravel()[0])

    def run(tag, cfg, iters=10, ops_builder=None):
        def f(p, a, b):
            ops = (ops_builder() if ops_builder else Int8StaticOps(
                act_scales, compute_dtype=cfg.dtypes.compute_dtype))
            return codon_forward(p, a, b, cfg=cfg, ops=ops)

        jf = jax.jit(f)
        sync(jf(params, d, c))
        sync(jf(params, d, c))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jf(params, d, c)
        sync(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"RESULT {tag:34s}: {ms:7.1f} ms "
              f"({B / ms * 1e3:6.1f} img/s)", flush=True)
        return ms

    # handoff A/B: the shipped ckpt predates the roundtrip sites, so
    # calibrate a full grid (incl. gate_d/gate_c/stem_d/stem_c/fuse_r)
    # from the same weights for the "with handoff" arm
    from codon_tpu.quant_ops import calibrate_act_scales
    full_scales = calibrate_act_scales(
        lambda p, a, b, ops, mask: codon_forward(p, a, b, cfg=v.cfg,
                                                 ops=ops, mask=mask),
        params, [(d[:2], c[:2], None)])

    base = v.cfg
    full = run("int8 full (5mc+3fuse+cac)", base)
    handoff = run("int8 full + roundtrip handoff", base,
                  ops_builder=lambda: Int8StaticOps(
                      full_scales, compute_dtype=base.dtypes.compute_dtype))
    no_cac = run("int8 no cac", dc.replace(base, use_cac=False))
    mc3 = run("int8 3 mc stages", dc.replace(base, num_mc=3))
    fuse0 = run("int8 0 fuse stages", dc.replace(base, num_fuse=0))
    conv_sp = run("int8 conv spatial gate", dc.replace(base,
                                                       cac_impl="xla"))

    def bf16_ops():
        from codon_tpu.core.ops import XlaOps
        return XlaOps(acc_dtype=BF16.acc_dtype, precision=BF16.precision)

    bf16_full = run("bf16 full (same ckpt)", base, ops_builder=bf16_ops)

    per_mc = (full - mc3) / 2
    per_fuse = (full - fuse0) / 3
    cac_total = full - no_cac
    stems_head = full - 5 * per_mc - 3 * per_fuse
    print()
    print(f"per-mc-stage       : {per_mc:6.1f} ms  (x5 = {5 * per_mc:6.1f})")
    print(f"per-fuse-stage     : {per_fuse:6.1f} ms  (x3 = {3 * per_fuse:6.1f})")
    print(f"cac total          : {cac_total:6.1f} ms")
    print(f"stems+head (resid) : {stems_head:6.1f} ms")
    print(f"stencil-vs-conv sp : {conv_sp - full:+6.1f} ms")
    print(f"roundtrip handoff  : {handoff - full:+6.1f} ms "
          f"({B / handoff * 1e3:6.1f} img/s)")
    print(f"int8 speedup vs bf16 (same program): {bf16_full / full:5.2f}x")
    # physics: 2.54 TFLOP/img, v5e int8 peak ~394 TOPS; HBM ~620 GB/s
    tops = 2.54 * B / (full / 1e3)
    print(f"achieved int8 throughput: {tops:5.0f} TOP/s "
          f"({tops / 394 * 100:4.1f}% of ~394 TOPS v5e peak)")
    if args.json:
        rec = {
            "batch": B, "hw": [H, W],
            "full_ms": full, "full_img_per_s": B / full * 1e3,
            "handoff_ms": handoff, "no_cac_ms": no_cac, "mc3_ms": mc3,
            "fuse0_ms": fuse0, "conv_spatial_gate_ms": conv_sp,
            "bf16_full_ms": bf16_full,
            "per_mc_stage_ms": per_mc, "per_fuse_stage_ms": per_fuse,
            "cac_total_ms": cac_total, "stems_head_ms": stems_head,
            "conv_cells_ms": 5 * per_mc + 3 * per_fuse,
            "int8_speedup_vs_bf16": bf16_full / full,
            "achieved_tops": tops, "v5e_int8_peak_tops": 394,
        }
        with open(args.json, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
