"""Metric parity: golden numbers from BASELINE.md + scipy/jnp agreement.

The golden values were computed from the reference's own artifacts with the
reference's own metric code (BASELINE.md) — reproducing them through
codon_tpu.metrics proves metric-semantics parity end to end.
"""
import os

import numpy as np
import pytest

from conftest import reference_available
from codon_tpu.metrics import (masked_rmse, masked_rmse_jnp, ssim_exact,
                               ssim_exact_jnp)

REF = "/root/reference"

GOLDEN = {  # scale -> (mean RMSE, mean SSIM) from BASELINE.md
    4: (1.7779, 0.9542),
    8: (3.4789, 0.9370),
    16: (5.8032, 0.9097),
}

PER_IMAGE_X4 = {  # BASELINE.md per-image spot checks
    "Art": (2.6415, 0.9770),
    "Tsukuba": (3.2363, 0.9858),
}


def _load(scale, name, kind):
    import cv2
    p = os.path.join(REF, f"CODON_X{scale}", kind, f"{name}.png")
    img = cv2.imread(p, 0)
    assert img is not None, p
    return img


def _images(scale):
    import cv2  # noqa
    d = os.path.join(REF, f"CODON_X{scale}", "output")
    return sorted(os.path.splitext(f)[0] for f in os.listdir(d))


@pytest.mark.skipif(not reference_available(), reason="no reference data")
@pytest.mark.parametrize("scale", [4, 8, 16])
def test_golden_means(scale):
    rmses, ssims = [], []
    for name in _images(scale):
        out = _load(scale, name, "output")
        label = _load(scale, name, "input_label")
        rmses.append(masked_rmse(label, out))
        ssims.append(ssim_exact(label / 255, out / 255))
    want_rmse, want_ssim = GOLDEN[scale]
    assert abs(np.mean(rmses) - want_rmse) < 5e-4, np.mean(rmses)
    assert abs(np.mean(ssims) - want_ssim) < 5e-4, np.mean(ssims)


@pytest.mark.skipif(not reference_available(), reason="no reference data")
def test_golden_per_image_x4():
    for name, (want_rmse, want_ssim) in PER_IMAGE_X4.items():
        out = _load(4, name, "output")
        label = _load(4, name, "input_label")
        assert abs(masked_rmse(label, out) - want_rmse) < 5e-4
        assert abs(ssim_exact(label / 255, out / 255) - want_ssim) < 5e-4


def test_rmse_jnp_matches_host():
    rng = np.random.RandomState(0)
    label = (rng.rand(37, 41) * 255).astype(np.uint8)
    label[label < 30] = 0  # some invalid pixels
    out = (rng.rand(37, 41) * 255).astype(np.uint8)
    host = masked_rmse(label, out)
    dev = float(masked_rmse_jnp(label[None].astype(np.float64),
                                out[None].astype(np.float64))[0])
    assert abs(host - dev) < 1e-3  # jax x64 off: f32 on device


def test_ssim_jnp_matches_scipy():
    rng = np.random.RandomState(1)
    a = rng.rand(37, 41)
    b = np.clip(a + 0.05 * rng.randn(37, 41), 0, 1)
    host = ssim_exact(a, b)
    dev = float(ssim_exact_jnp(a[None], b[None])[0])
    assert abs(host - dev) < 1e-6


def test_ssim_jnp_batched_f32_close():
    rng = np.random.RandomState(2)
    a = rng.rand(3, 32, 48).astype(np.float32)
    b = np.clip(a + 0.03 * rng.randn(3, 32, 48).astype(np.float32), 0, 1)
    dev = np.asarray(ssim_exact_jnp(a, b))
    for i in range(3):
        assert abs(dev[i] - ssim_exact(a[i], b[i])) < 1e-4


def test_ondevice_evaluator_tta_and_ops():
    """make_batch_evaluator(tta=True, ops=...) scores the SAME estimator
    eval --tta writes (round-2 advisor: the combo silently scored the
    plain bf16 forward)."""
    import jax
    import jax.numpy as jnp
    from codon_tpu.metrics.ondevice import make_batch_evaluator
    from codon_tpu.models.tta import make_tta_forward
    from codon_tpu.models.variants import get_variant
    from codon_tpu.quant_ops import Int8Ops

    rng = np.random.RandomState(3)
    v = get_variant("codon")
    params = jax.tree.map(lambda w: w * 0.5, v.init(jax.random.PRNGKey(3)))
    d = rng.rand(2, 24, 19, 1).astype(np.float32)
    c = rng.rand(2, 24, 19, 1).astype(np.float32)
    lab = (rng.rand(2, 24, 19, 1) * 255).astype(np.float32)
    m = np.ones_like(d)
    ops = Int8Ops()
    ev = make_batch_evaluator(v, tta=True, ops=ops)
    stats = ev(params, d, c, m, lab)
    ref_fwd = make_tta_forward(
        lambda p, a, b, mk: v.forward(p, a, b, mask=mk, ops=ops))
    ref_u8 = (np.clip(np.asarray(ref_fwd(params, d, c, m))[..., 0], 0, 1)
              * 255).astype(np.uint8)
    for i in range(2):
        r = masked_rmse(lab[i, ..., 0], ref_u8[i])
        assert abs(float(stats["rmse"][i]) - r) < 1e-3
    np.testing.assert_array_equal(np.asarray(stats["out_u8"]), ref_u8)


def test_ondevice_evaluator_vs_host():
    """Fused on-device eval: RMSE exact vs host; SSIM close (zero-stat
    boundary ring on padded images)."""
    import jax
    from codon_tpu.data.pipeline import make_batch
    from codon_tpu.data.io import Sample
    from codon_tpu.metrics.ondevice import make_batch_evaluator
    from codon_tpu.models.variants import get_variant
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    v = get_variant("codon")
    params = v.init(jax.random.PRNGKey(0))

    def run(sizes, pad_multiple=8):
        samples = []
        for i, (h, w) in enumerate(sizes):
            depth = (rng.rand(h, w) * 255).astype(np.uint8)
            color = (rng.rand(h, w) * 255).astype(np.uint8)
            label = (rng.rand(h, w) * 255).astype(np.uint8)
            label[label < 10] = 0
            samples.append(Sample(f"s{i}", depth, color, label))
        batch = make_batch(samples, pad_multiple=pad_multiple)
        evaluator = make_batch_evaluator(v)
        mask = (batch.mask if batch.mask is not None
                else jnp.ones_like(batch.depth))
        stats = evaluator(params, batch.depth, batch.color, mask,
                          batch.label_dev)
        out_u8 = np.asarray(stats["out_u8"])
        return samples, stats, out_u8

    # exact case: images fill the padded shape (h, w multiples of 8) —
    # device SSIM's symmetric pad == scipy reflect at the true boundary
    samples, stats, out_u8 = run([(40, 32), (40, 32)])
    for i, s in enumerate(samples):
        h, w = s.depth.shape
        img = out_u8[i, :h, :w]
        assert abs(float(stats["rmse"][i]) - masked_rmse(s.label, img)) \
            < 1e-3
        assert abs(float(stats["ssim"][i]) -
                   ssim_exact(s.label / 255, img / 255)) < 1e-4

    # padded case: RMSE still exact; SSIM approximate in the 6-px boundary
    # ring (zero- vs reflect-statistics) — realistic sizes keep the ring a
    # small fraction; bound documented in metrics/ondevice.py
    samples, stats, out_u8 = run([(96, 85), (80, 70)], pad_multiple=16)
    for i, s in enumerate(samples):
        h, w = s.depth.shape
        img = out_u8[i, :h, :w]
        assert abs(float(stats["rmse"][i]) - masked_rmse(s.label, img)) \
            < 1e-3
        assert abs(float(stats["ssim"][i]) -
                   ssim_exact(s.label / 255, img / 255)) < 0.03
