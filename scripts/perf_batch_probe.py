"""Batch-size probe at the shipping operating point (int8-static).

bench.py runs b32 ("int8-static sweet spot (b16: 69.5, b32: 81.7)") —
that comparison predates the gate/stem int8 handoff, which cut the
per-image HBM traffic of the non-conv passes. Larger batches amortize
the fixed per-dispatch overheads further; this probe re-sweeps
b32/b48/b64 in one session so bench.py's BATCH can follow the data.

Usage: python scripts/perf_batch_probe.py
"""
import os
import sys
import time

import numpy as np

H, W = 370, 463
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp
    from codon_tpu.checkpoint import load_npz
    from codon_tpu.core.params import BF16
    from codon_tpu.models.variants import get_variant
    from codon_tpu.quant_ops import Int8StaticOps
    from codon_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    variant = get_variant("codon", dtypes=BF16)
    candidates = (
        os.path.join(REPO, "checkpoints", "x4_ship2_qat_static.npz"),
        os.path.join(REPO, "checkpoints", "x4_qat_static2.npz"),
        os.path.join(REPO, "checkpoints", "x4_qat_static.npz"))
    ckpt = next((p for p in candidates if os.path.exists(p)), None)
    if ckpt is None:
        raise SystemExit("no int8-static checkpoint found; tried:\n  "
                         + "\n  ".join(candidates))
    params = load_npz(ckpt)
    act_scales = params.pop("act_scales")
    ops = Int8StaticOps(act_scales, compute_dtype=jnp.bfloat16)
    fwd = jax.jit(lambda p, d, c: variant.forward(p, d, c, ops=ops))
    rng = np.random.RandomState(0)

    def sync(x):
        return np.asarray(x[0, 0, 0, 0])

    print(f"ckpt: {os.path.basename(ckpt)}", flush=True)
    for batch in (32, 48, 64):
        d = jax.device_put(rng.rand(batch, H, W, 1).astype(np.float32))
        c = jax.device_put(rng.rand(batch, H, W, 1).astype(np.float32))
        try:
            for _ in range(3):
                sync(fwd(params, d, c))
            t0 = time.perf_counter()
            iters = 10
            for _ in range(iters):
                out = fwd(params, d, c)
            sync(out)
            dt = time.perf_counter() - t0
            print(f"RESULT b{batch:2d}: {dt / iters * 1e3:7.1f} ms  "
                  f"{batch * iters / dt:6.2f} img/s", flush=True)
        except Exception as e:  # OOM at large batch is a data point
            print(f"RESULT b{batch:2d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
