"""W8A8 quantized inference: mechanics + closeness to the float path.

Quality on real checkpoints is validated on TPU (eval --dtype int8);
here: calibration produces full scale coverage, the int8 forward runs,
and on a TRAINED-LIKE weight distribution stays close to float.
Random-init nets amplify quantization error unrealistically, so the test
scales weights down to a realistic regime.
"""
import numpy as np
import jax
import jax.numpy as jnp

from codon_tpu.models.codon_net import CodonConfig, codon_forward, \
    init_codon_params
from codon_tpu.quant import calibrate, forward_w8a8, quantize_params


def test_w8a8_runs_and_tracks_float():
    cfg = CodonConfig(dead_heads=False)
    params = init_codon_params(jax.random.PRNGKey(0), cfg)
    # temper the random init toward a trained-scale regime
    params = jax.tree.map(lambda w: w * 0.5, params)
    rng = np.random.RandomState(0)
    d = rng.rand(1, 24, 20, 1).astype(np.float32)
    c = rng.rand(1, 24, 20, 1).astype(np.float32)

    scales = calibrate(params, [(d, c)], cfg)
    assert all(v > 0 for v in scales.values())
    # every scale point used by the quant forward is present
    for i in range(cfg.num_mc):
        for k in (f"out{i}", f"outc{i}", f"dcat{i}", f"ccat{i}",
                  f"d3_{i}", f"c6_{i}"):
            assert k in scales
    qp, ws = quantize_params(params)
    out_q = np.asarray(forward_w8a8(qp, ws, scales, d, c, cfg))
    out_f = np.asarray(codon_forward(params, d, c, cfg=cfg))
    assert out_q.shape == out_f.shape
    assert np.isfinite(out_q).all()
    # quantization noise, not divergence: correlated and bounded
    denom = np.abs(out_f).mean() + 1e-6
    rel = np.abs(out_q - out_f).mean() / denom
    assert rel < 0.2, rel
