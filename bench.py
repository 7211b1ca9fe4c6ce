"""codon_tpu headline benchmark.

Measures flagship CODONNet inference throughput (the BASELINE.json metric:
depth maps/sec/chip) at the reference eval size 463x370, bf16, batched,
steady-state, on whatever single chip is available.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N/0.030}
vs_baseline anchors to the measured PyTorch-CPU reference throughput
(0.030 img/s, BASELINE.md).
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_IMG_PER_SEC = 0.030  # torch-CPU reference, BASELINE.md
H, W = 370, 463               # Art.png eval size
BATCH = 16                    # b16 + stencil spatial gate: best measured
WARMUP, ITERS = 3, 10
VARIANT = "codon"             # X4/X8 flagship flavor (incl. dead heads)


def main() -> None:
    import jax
    from codon_tpu.core.params import BF16
    from codon_tpu.models.variants import get_variant
    from codon_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    variant = get_variant(VARIANT, dtypes=BF16)
    params = variant.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    depth = jax.device_put(rng.rand(BATCH, H, W, 1).astype(np.float32))
    color = jax.device_put(rng.rand(BATCH, H, W, 1).astype(np.float32))

    fwd = jax.jit(lambda p, d, c: variant.forward(p, d, c))

    def sync(x):
        # On the tunneled axon platform block_until_ready returns before
        # execution completes; a tiny D2H fetch is the reliable fence.
        return np.asarray(x[0, 0, 0, 0])

    for _ in range(WARMUP):
        sync(fwd(params, depth, color))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fwd(params, depth, color)
    sync(out)
    dt = time.perf_counter() - t0

    img_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": (f"{VARIANT}_inference_img_per_sec_"
                   f"{W}x{H}_bf16_b{BATCH}"),
        "value": round(img_per_sec, 3),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
