"""Conditioning-sensitivity probe for the scale-conditioned (codon_sc) arm.

Runs the SAME input with the conditioning plane set to each scale's
value (4/16, 8/16, 16/16) and reports (a) masked RMSE per cond value and
(b) mean |output delta| between cond values. Large deltas with the
correct cond winning = the model IS conditioned; deltas ~0 = the plane
never reaches the output.

On the r5 session-4 from-scratch joint model this probe returned deltas
of EXACTLY 0.0 on real scenes while the stem's conditioning-channel
weights were nonzero — the smoking gun that the net was a dead-ReLU
fixed point (output == residual passthrough; dead units still fire on
random noise, which is why a random-input check passed). That run is
archived as checkpoints/x4_holdout_sc_collapsed.npz /
sc_cond_probe_collapsed.json; train now guards against the failure mode
(trainer.CollapseDetector, --clip-norm, warm-start widening).

Usage: python scripts/sc_cond_probe.py [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--ckpt", default="checkpoints/x4_holdout_sc.npz")
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--scenes", default="Books,Tsukuba,Art")
    args = ap.parse_args()

    import jax.numpy as jnp
    import jax

    from codon_tpu.checkpoint import load_npz
    from codon_tpu.data.io import load_sample
    from codon_tpu.metrics import masked_rmse
    from codon_tpu.models.variants import get_variant
    from codon_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    variant = get_variant("codon_sc")
    params = load_npz(os.path.join(REPO, args.ckpt))
    params.pop("act_scales", None)

    @jax.jit
    def fwd(p, x, c):
        out = variant.forward(p, x, c)
        return jnp.clip(out[..., 0], 0.0, 1.0) * 255.0

    sdir = f"/root/reference/CODON_X{args.scale}"
    conds = [4 / 16.0, 8 / 16.0, 16 / 16.0]
    rows = []
    for name in args.scenes.split(","):
        s = load_sample(sdir, name)
        d = s.depth.astype(np.float32)[None, ..., None] / 255.0
        c = s.color.astype(np.float32)[None, ..., None] / 255.0
        outs = {}
        for cv in conds:
            plane = np.full_like(d, cv)
            x = np.concatenate([d, plane], -1)
            outs[cv] = np.asarray(fwd(params, jnp.asarray(x),
                                      jnp.asarray(c)))[0]
        row = {"scene": name,
               "rmse_by_cond": {f"{cv:.4f}": masked_rmse(
                   s.label, np.round(outs[cv]).astype(np.uint8))
                   for cv in conds},
               "mean_abs_delta": {
                   f"{a:.2f}-{b:.2f}": float(np.mean(np.abs(
                       outs[a] - outs[b])))
                   for a, b in [(conds[0], conds[1]),
                                (conds[0], conds[2])]}}
        rows.append(row)
        print(json.dumps(row))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"ckpt": args.ckpt, "scale": args.scale,
                       "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
