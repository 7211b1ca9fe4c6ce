"""Ablation timing: where does the forward's time go?

Times the full forward and stripped-down versions (no CAC, fewer stages)
on the real chip; differences attribute time to each component. More
robust than trace parsing through the tunnel.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf_ablate.py
"""
import dataclasses as dc
import time

import numpy as np


def main():
    import jax
    from codon_tpu.core.params import BF16
    from codon_tpu.models.codon_net import codon_forward
    from codon_tpu.models.variants import get_variant
    from codon_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.RandomState(0)
    v = get_variant("codon", dtypes=BF16)
    params = v.init(jax.random.PRNGKey(0))
    B, H, W = 16, 370, 463
    d = jax.device_put(rng.rand(B, H, W, 1).astype(np.float32))
    c = jax.device_put(rng.rand(B, H, W, 1).astype(np.float32))

    def sync(x):
        np.asarray(x.ravel()[0])

    def run(tag, cfg, iters=10):
        f = jax.jit(lambda p, a, b: codon_forward(p, a, b, cfg=cfg))
        sync(f(params, d, c))
        sync(f(params, d, c))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(params, d, c)
        sync(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"RESULT {tag:32s}: {ms:7.1f} ms", flush=True)
        return ms

    base = v.cfg
    full = run("full (5 mc + 3 fuse + cac)", base)
    no_cac = run("no cac (gates skipped)", dc.replace(base, use_cac=False))
    mc3 = run("3 mc stages", dc.replace(base, num_mc=3))
    fuse0 = run("0 fuse stages", dc.replace(base, num_fuse=0))
    conv_gate = run("cac conv spatial gate", dc.replace(base, cac_impl="xla"))

    per_mc = (full - mc3) / 2
    per_fuse = (full - fuse0) / 3
    print(f"\nper-mc-stage      : {per_mc:6.1f} ms  (x5 = {5*per_mc:6.1f})")
    print(f"per-fuse-stage    : {per_fuse:6.1f} ms  (x3 = {3*per_fuse:6.1f})")
    print(f"cac total         : {full-no_cac:6.1f} ms")
    print(f"stems+head (resid): {full - 5*per_mc - 3*per_fuse:6.1f} ms")
    print(f"stencil-vs-conv sp: {conv_gate-full:+6.1f} ms")


if __name__ == "__main__":
    main()
