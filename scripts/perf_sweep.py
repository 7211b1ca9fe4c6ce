"""One-process perf sweep on the real chip (executable loads are expensive
through the tunnel — batch all variants into a single session).

Usage: python scripts/perf_sweep.py
"""
import time

import numpy as np


def main():
    import dataclasses as dc

    import jax
    from codon_tpu.core.params import BF16
    from codon_tpu.models.codon_net import codon_forward
    from codon_tpu.models.variants import get_variant
    from codon_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.RandomState(0)
    v = get_variant("codon", dtypes=BF16)
    params = v.init(jax.random.PRNGKey(0))

    def sync(x):
        np.asarray(x.ravel()[0])

    results = []
    for impl in ("xla", "xla_stencil"):
        for batch in (8, 16):
            d = jax.device_put(
                rng.rand(batch, 370, 463, 1).astype(np.float32))
            c = jax.device_put(
                rng.rand(batch, 370, 463, 1).astype(np.float32))
            cfg = dc.replace(v.cfg, cac_impl=impl)
            f = jax.jit(lambda p, a, b: codon_forward(p, a, b, cfg=cfg))
            sync(f(params, d, c))
            sync(f(params, d, c))
            t0 = time.perf_counter()
            n = 10
            for _ in range(n):
                out = f(params, d, c)
            sync(out)
            dt = time.perf_counter() - t0
            ips = batch * n / dt
            results.append((impl, batch, dt / n * 1e3, ips))
            print(f"RESULT {impl:12s} b{batch:2d}: {dt/n*1e3:7.1f}ms "
                  f"{ips:6.2f} img/s", flush=True)
    best = max(results, key=lambda r: r[-1])
    print(f"BEST: {best}")


if __name__ == "__main__":
    main()
