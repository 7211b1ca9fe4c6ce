"""Isolated CAC-stage shootout: XLA lowering vs Pallas kernels.

Times ONE CAC stage (stats -> gates -> apply+residual) on realistic
tensors (b32 x 370x463 x C64 bf16), isolated from the conv stack, many
iters per dispatch to amortize the ~1.7ms tunnel overhead.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf_cac.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from codon_tpu.core.ops import XlaOps
    from codon_tpu.models.codon_net import (CodonConfig, cac_channel_gate,
                                            cac_spatial_gate)
    from codon_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    B, H, W, C = 32, 370, 463, 64
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    # generate ON DEVICE (host is 1 core; 4x 2.8GB f64 host tensors hang)
    mk = jax.jit(lambda k: jax.random.uniform(k, (B, H, W, C), dt),
                 static_argnums=())
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    out, out_c, inputs, inputs_c = (mk(k) for k in ks)
    w1 = jnp.asarray(rng.randn(2 * C, 8) * 0.1, jnp.float32)
    b1 = jnp.zeros((8,), jnp.float32)
    w2 = jnp.asarray(rng.randn(8, C) * 0.1, jnp.float32)
    b2 = jnp.zeros((C,), jnp.float32)
    sp_w = jnp.asarray(rng.randn(5, 5, 2, 1) * 0.1, jnp.float32)
    ops = XlaOps()
    cfg = CodonConfig()

    def sync(x):
        np.asarray(jax.tree.leaves(x)[0].ravel()[0])

    def run(tag, fn, iters=30):
        f = jax.jit(fn)
        sync(f(out, out_c, inputs, inputs_c))
        sync(f(out, out_c, inputs, inputs_c))
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(out, out_c, inputs, inputs_c)
        sync(o)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"RESULT {tag:28s}: {ms:7.2f} ms/stage", flush=True)
        return ms

    def xla_stage(o, oc, i, ic, spatial_impl):
        fcat = (oc, o)
        ch = cac_channel_gate(fcat, w1, b1, w2, b2, ops)
        sp = cac_spatial_gate(fcat, sp_w, ops, impl=spatial_impl)
        ad = ch * sp
        return o * ad + i, oc * ad + ic

    run("xla stencil (prod default)",
        lambda o, oc, i, ic: xla_stage(o, oc, i, ic, "stencil"))
    run("xla 2ch-conv",
        lambda o, oc, i, ic: xla_stage(o, oc, i, ic, "conv"))

    from codon_tpu.kernels.cac import cac_stage_pallas
    run("pallas v1",
        lambda o, oc, i, ic: cac_stage_pallas(o, oc, i, ic,
                                              w1, b1, w2, b2, sp_w))

    try:
        from codon_tpu.kernels.cac_v2 import cac_stage_pallas_v2
        run("pallas v2",
            lambda o, oc, i, ic: cac_stage_pallas_v2(o, oc, i, ic,
                                                     w1, b1, w2, b2, sp_w))
    except ImportError:
        print("(no v2 yet)")


if __name__ == "__main__":
    main()
