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

    def run(tag, fwd, batch, h, w, iters=10):
        d = jax.device_put(rng.rand(batch, h, w, 1).astype(np.float32))
        c = jax.device_put(rng.rand(batch, h, w, 1).astype(np.float32))
        f = jax.jit(fwd)
        sync(f(params, d, c))
        sync(f(params, d, c))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(params, d, c)
        sync(out)
        dt = time.perf_counter() - t0
        ips = batch * iters / dt
        print(f"RESULT {tag:28s} b{batch:2d} {h}x{w}: {dt/iters*1e3:7.1f}ms "
              f"{ips:6.2f} img/s", flush=True)
        return ips

    H, W = 370, 463

    def fwd_cfg(**kw):
        cfg = dc.replace(v.cfg, **kw)
        return lambda p, a, b: codon_forward(p, a, b, cfg=cfg)

    from codon_tpu.models.codon_net import codon_forward_fused

    def fwd_fused(**kw):
        cfg = dc.replace(v.cfg, **kw)
        return lambda p, a, b: codon_forward_fused(p, a, b, cfg=cfg)

    results = {}
    results["packed_b16"] = run("packed", fwd_cfg(), 16, H, W)
    results["packed_b16_pad"] = run("packed pad8", fwd_cfg(), 16, 376, 464)

    from codon_tpu.quant_ops import Int8Ops

    def fwd_int8(p, a, b):
        return codon_forward(p, a, b, cfg=v.cfg, ops=Int8Ops())

    results["int8_packed_b16"] = run("int8 packed", fwd_int8, 16, H, W)
    results["int8_packed_b32"] = run("int8 packed", fwd_int8, 32, H, W)

    best = max(results.items(), key=lambda r: r[1])
    print(f"BEST: {best}")


if __name__ == "__main__":
    main()
