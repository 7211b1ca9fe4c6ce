"""Serving throughput of the best-quality config: TTA (+ensemble) int8.

The batched TTA lowering (codon_tpu/models/tta.py) folds the 4 flip
transforms into the batch axis of ONE forward, so TTA costs exactly 4x
the model FLOPs with no dispatch overhead. This measures img/s of:
  - int8-static + batched TTA (single model)
  - int8-static + batched TTA + 2-model ensemble (8x FLOPs)
at the reference eval size, steady-state, one chip — the README
"quality flagship" serving numbers.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 370, 463
BATCH = 8          # TTA quadruples the effective conv batch -> 32
WARMUP, ITERS = 3, 10
_CKPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "checkpoints")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from codon_tpu.checkpoint import load_npz
    from codon_tpu.core.params import BF16
    from codon_tpu.models.tta import make_tta_forward
    from codon_tpu.models.variants import get_variant
    from codon_tpu.quant_ops import Int8StaticOps
    from codon_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    variant = get_variant("codon", dtypes=BF16)
    rng = np.random.RandomState(0)

    def load(path):
        p = load_npz(path)
        sc = p.pop("act_scales")
        return p, sc

    ckpt = next(p for p in (
        os.path.join(_CKPT, "x4_ship_qat_static.npz"),
        os.path.join(_CKPT, "x4_qat_static2.npz"),
        os.path.join(_CKPT, "x4_qat_static.npz")) if os.path.exists(p))
    params, act_scales = load(ckpt)
    cdt = variant.cfg.dtypes.compute_dtype

    depth = jax.device_put(rng.rand(BATCH, H, W, 1).astype(np.float32))
    color = jax.device_put(rng.rand(BATCH, H, W, 1).astype(np.float32))
    mask = jnp.ones((BATCH, H, W, 1), jnp.float32)

    def sync(x):
        return np.asarray(x.ravel()[0])

    def bench(fwd, args):
        f = jax.jit(fwd)
        for _ in range(WARMUP):
            sync(f(*args))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = f(*args)
        sync(out)
        return BATCH * ITERS / (time.perf_counter() - t0)

    def raw(p, d, c, m):
        p = dict(p)
        sc = p.pop("act_scales")
        return variant.forward(p, d, c, mask=m,
                               ops=Int8StaticOps(sc, compute_dtype=cdt))

    tta = make_tta_forward(raw)
    p1 = dict(params, act_scales=act_scales)
    r_tta = bench(tta, (p1, depth, color, mask))
    print(json.dumps({"metric": "tta_int8static_img_per_sec_b%d" % BATCH,
                      "value": round(r_tta, 3), "unit": "img/s",
                      "ckpt": os.path.basename(ckpt)}))

    def ens(plist, d, c, m):
        outs = [tta(p, d, c, m) for p in plist]
        return sum(outs) / len(outs)

    r_ens = bench(ens, ([p1, p1], depth, color, mask))
    print(json.dumps({"metric": "ens2_tta_int8static_img_per_sec_b%d"
                      % BATCH,
                      "value": round(r_ens, 3), "unit": "img/s"}))


if __name__ == "__main__":
    main()
