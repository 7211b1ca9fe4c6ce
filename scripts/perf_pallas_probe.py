"""Pallas DMA/layout probe on the axon TPU.

A plain Pallas COPY with (1,64,463,64) blocks measured 112 GB/s vs XLA's
360 GB/s on the same logical tensor — 5.5x off. This probe sweeps block
layouts to find where the platform's Pallas DMA path is efficient. The
4D th=64 copy is repeated as the internal contention baseline (training
may share the chip).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf_pallas_probe.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from codon_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    B, H, W, C = 32, 370, 463, 64
    dt = jnp.bfloat16
    GB = B * H * W * C * 2 * 2 / 1e9  # read + write

    def sync(o):
        np.asarray(jax.tree.leaves(o)[0].ravel()[0])

    def run(tag, f, *a, iters=30):
        try:
            jf = jax.jit(f)
            sync(jf(*a))
            sync(jf(*a))
            t0 = time.perf_counter()
            for _ in range(iters):
                o = jf(*a)
            sync(o)
            ms = (time.perf_counter() - t0) / iters * 1e3
            print(f"RESULT {tag:36s}: {ms:7.2f} ms  {GB/ms*1e3:5.0f} GB/s",
                  flush=True)
        except Exception as e:
            print(f"RESULT {tag:36s}: FAILED {type(e).__name__}: {e}",
                  flush=True)

    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def mk(shape, block, grid_of, vmem=110):
        spec = pl.BlockSpec(block, grid_of, memory_space=pltpu.VMEM)
        nsteps = tuple(-(-s // b) for s, b in zip(shape, block))
        grid = tuple(n for n in nsteps if n > 1) or (1,)
        # grid dims: infer from block: we pass explicit grids below instead
        return spec

    key = jax.random.PRNGKey(0)
    x4 = jax.jit(lambda k: jax.random.uniform(k, (B, H, W, C), dt))(key)
    xf = jax.jit(lambda k: jax.random.uniform(k, (B, H, W * C), dt))(key)
    x3 = jax.jit(lambda k: jax.random.uniform(k, (B * H, W, C), dt))(key)

    def copy4d(th):
        img = pl.BlockSpec((1, th, W, C), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            copy_kernel, grid=(B, -(-H // th)), in_specs=[img],
            out_specs=img,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), dt))

    def copyflat(th):
        img = pl.BlockSpec((1, th, W * C), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            copy_kernel, grid=(B, -(-H // th)), in_specs=[img],
            out_specs=img,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            out_shape=jax.ShapeDtypeStruct((B, H, W * C), dt))

    def copy3d(tr):
        img = pl.BlockSpec((tr, W, C), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            copy_kernel, grid=(-(-B * H // tr),), in_specs=[img],
            out_specs=img,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            out_shape=jax.ShapeDtypeStruct((B * H, W, C), dt))

    run("copy 4D (1,64,W,C)  [baseline]", lambda t: copy4d(64)(t), x4)
    run("copy 4D (1,128,W,C)", lambda t: copy4d(128)(t), x4)
    run("copy flat (1,64,W*C)", lambda t: copyflat(64)(t), xf)
    run("copy flat (1,8,W*C)", lambda t: copyflat(8)(t), xf)
    run("copy 3D (512,W,C) rows", lambda t: copy3d(512)(t), x3)
    run("copy 3D (64,W,C) rows", lambda t: copy3d(64)(t), x3)
    run("copy 4D (1,64,W,C)  [baseline2]", lambda t: copy4d(64)(t), x4)
    run("xla copy", lambda t: t * 1.0001, x4)


if __name__ == "__main__":
    main()
