"""codon_tpu headline benchmark.

Measures flagship CODONNet inference throughput at the reference eval size
463x370, batched, steady-state, on whatever single chip is available — in
the SHIPPING deployment config: static per-channel int8 (QAT'd checkpoints
at every scale beat the reference's archived RMSE/SSIM on this exact path;
see checkpoints/x*_qat_static_int8_eval.json).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N/0.030}
vs_baseline anchors to the measured PyTorch-CPU reference throughput
(0.030 img/s, BASELINE.md). bf16 reference point: 52.7 img/s at b16
(cells measured at ~96% MXU — bf16 is at its physics ceiling; int8's
2x MXU rate is the only door past it, see README perf notes).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_IMG_PER_SEC = 0.030  # torch-CPU reference, BASELINE.md
H, W = 370, 463               # Art.png eval size
BATCH = 32                    # int8-static sweet spot (b16: 69.5, b32: 81.7)
BF16_BATCH = 16               # bf16 sweet spot (52.7 img/s, ~96% MXU)
WARMUP, ITERS = 3, 10
VARIANT = "codon"             # X4/X8 flagship flavor (incl. dead heads)
_CKPT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "checkpoints")
# prefer the newest shipping generation (18-site grid incl. the int8
# gate/stem handoffs -> less HBM traffic in the non-conv passes);
# x4_ship4 is the quality-best shipping static checkpoint (1.344 plain
# int8 vs the reference archived mean 1.778, per-image gate passed)
QAT_CKPT = next((p for p in (
    os.path.join(_CKPT_DIR, "x4_ship4_qat_static.npz"),
    os.path.join(_CKPT_DIR, "x4_ship2_qat_static.npz"),
    os.path.join(_CKPT_DIR, "x4_qat_static2.npz"),
    os.path.join(_CKPT_DIR, "x4_qat_static.npz")) if os.path.exists(p)),
    os.path.join(_CKPT_DIR, "x4_qat_static.npz"))


def main() -> None:
    import jax
    from codon_tpu.core.params import BF16
    from codon_tpu.models.variants import get_variant
    from codon_tpu.quant_ops import Int8StaticOps, calibrate_act_scales
    from codon_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    variant = get_variant(VARIANT, dtypes=BF16)
    rng = np.random.RandomState(0)

    act_scales = None
    if os.path.exists(QAT_CKPT):
        # the shipping config: QAT'd weights + their calibrated scales
        from codon_tpu.checkpoint import load_npz
        params = load_npz(QAT_CKPT)
        act_scales = params.pop("act_scales", None)
    if act_scales is None:
        params = variant.init(jax.random.PRNGKey(0))
        d2 = rng.rand(2, H, W, 1).astype(np.float32)
        c2 = rng.rand(2, H, W, 1).astype(np.float32)
        act_scales = calibrate_act_scales(
            lambda p, d, c, ops, mask: variant.forward(p, d, c, ops=ops,
                                                       mask=mask),
            params, [(d2, c2, None)])
    import jax.numpy as jnp
    ops = Int8StaticOps(act_scales, compute_dtype=jnp.bfloat16)

    def sync(x):
        # On the tunneled axon platform block_until_ready returns before
        # execution completes; a tiny D2H fetch is the reliable fence.
        return np.asarray(x[0, 0, 0, 0])

    def time_fwd(fwd, p, batch, fence_every_iter=False):
        """img/s over ITERS dispatches of a `batch`-image forward.

        fence_every_iter=True syncs after every dispatch (no pipelining
        credit — the honest latency shape); False fences once at the end
        (the steady-state throughput shape the CLI pipeline achieves).
        """
        depth = jax.device_put(rng.rand(batch, H, W, 1).astype(np.float32))
        color = jax.device_put(rng.rand(batch, H, W, 1).astype(np.float32))
        for _ in range(WARMUP):
            sync(fwd(p, depth, color))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fwd(p, depth, color)
            if fence_every_iter:
                sync(out)
        if not fence_every_iter:
            sync(out)
        return batch * ITERS / (time.perf_counter() - t0)

    fwd8 = jax.jit(lambda p, d, c: variant.forward(p, d, c, ops=ops))
    img_per_sec = time_fwd(fwd8, params, BATCH)
    # cross-check: per-iteration fences remove any dispatch-pipelining
    # flattery from the 10-iter loop (VERDICT r4 weak #7)
    img_per_sec_fenced = time_fwd(fwd8, params, BATCH,
                                  fence_every_iter=True)
    # batch-1 latency: the reference's actual usage pattern is per-image
    # (/root/reference/CODON_X4/test.py:109-137); fenced per dispatch
    b1_img_per_sec = time_fwd(fwd8, params, 1, fence_every_iter=True)

    # bf16 reference point (pre-quantization deployment config)
    fwd_bf16 = jax.jit(lambda p, d, c: variant.forward(p, d, c))
    bf16_img_per_sec = time_fwd(fwd_bf16, params, BF16_BATCH)

    print(json.dumps({
        "metric": (f"{VARIANT}_inference_img_per_sec_"
                   f"{W}x{H}_int8static_b{BATCH}"),
        "value": round(img_per_sec, 3),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 1),
        "b32_fenced_img_per_sec": round(img_per_sec_fenced, 3),
        "b1_ms_per_img": round(1000.0 / b1_img_per_sec, 3),
        "bf16_img_per_sec_b16": round(bf16_img_per_sec, 3),
    }))


if __name__ == "__main__":
    main()
