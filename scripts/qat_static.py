"""Frozen-scale QAT: fine-tune against the exact static-int8 grid, then
validate the fast static path. One TPU process (calibrate -> train ->
eval quality -> eval speed)."""
import time

import numpy as np


def main(steps=6000, lr=8e-5):
    import jax
    import jax.numpy as jnp
    import optax

    from codon_tpu.checkpoint import load_npz, save_npz
    from codon_tpu.data.io import discover_pairs, imread_gray
    from codon_tpu.data.pipeline import batched_loader
    from codon_tpu.metrics import masked_rmse, ssim_exact
    from codon_tpu.models.codon_net import CodonConfig
    from codon_tpu.quant import (calibrate, forward_w8a8,
                                 forward_w8a8_fake, quantize_params,
                                 save_scales)
    from codon_tpu.train.data import PatchSampler
    from codon_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = CodonConfig(dead_heads=True)
    params = load_npz("/root/repo/checkpoints/x4_qat.npz")
    sd = "/root/reference/CODON_X4"
    names = discover_pairs(sd)
    batches = list(batched_loader(sd, names, 4, 32))
    cal = [(np.asarray(b.depth), np.asarray(b.color)) for b in batches]
    scales = calibrate(params, cal, cfg)
    print("calibrated", len(scales), "scale points", flush=True)

    labels = [imread_gray(f"{sd}/input_label/{n}.png") for n in names]
    colors = [imread_gray(f"{sd}/input_color/{n}.png") for n in names]
    degraded = [imread_gray(f"{sd}/input_depth/{n}.png") for n in names]
    sampler = PatchSampler(labels, colors, scale=4, patch=96, batch=16,
                           seed=3, degraded=degraded)

    sched = optax.warmup_cosine_decay_schedule(lr * 0.01, lr, 200, steps,
                                               lr * 0.01)
    tx = optax.adam(sched)
    opt = tx.init(params)

    def loss_fn(p, batch):
        out = forward_w8a8_fake(p, scales, batch["depth"], batch["color"],
                                cfg)
        return jnp.mean(jnp.abs((out - batch["label"]) * batch["mask"]))

    @jax.jit
    def step(p, o, batch):
        loss, g = jax.value_and_grad(loss_fn)(p, batch)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    t0 = time.time()
    for i in range(1, steps + 1):
        params, opt, loss = step(params, opt, sampler.sample())
        if i % 1000 == 0 or i == 1:
            print(f"step {i} loss {float(loss):.5f} "
                  f"({i*16/(time.time()-t0):.0f} p/s)", flush=True)

    save_npz("/root/repo/checkpoints/x4_int8.npz", params)
    save_scales("/root/repo/checkpoints/x4_int8_scales.npz", scales)

    # quality through the REAL static path
    qp, ws = quantize_params(params)
    fq = jax.jit(lambda d, c: forward_w8a8(qp, ws, scales, d, c, cfg))
    rmse_sum = ssim_sum = 0.0
    n = 0
    for b in batches:
        out = np.asarray(fq(b.depth, b.color))
        for i in range(len(b.names)):
            h, w = b.sizes[i]
            img = (np.clip(out[i, :h, :w, 0], 0, 1) * 255).astype(np.uint8)
            rmse_sum += masked_rmse(b.labels[i], img)
            ssim_sum += ssim_exact(b.labels[i] / 255, img / 255)
            n += 1
    print(f"QUALITY static-int8 after frozen-scale QAT: "
          f"RMSE {rmse_sum/n:.4f} SSIM {ssim_sum/n:.4f}", flush=True)

    rng = np.random.RandomState(0)
    d = jax.device_put(rng.rand(16, 370, 463, 1).astype(np.float32))
    c = jax.device_put(rng.rand(16, 370, 463, 1).astype(np.float32))
    def sync(x):
        np.asarray(x.ravel()[0])
    sync(fq(d, c))
    sync(fq(d, c))
    t0 = time.perf_counter()
    for _ in range(10):
        out = fq(d, c)
    sync(out)
    dt = time.perf_counter() - t0
    print(f"SPEED static-int8 b16: {dt/10*1e3:.1f}ms "
          f"{160/dt:.2f} img/s", flush=True)


if __name__ == "__main__":
    main()
