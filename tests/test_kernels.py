"""Pallas CAC kernel parity vs the XLA reference path (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from codon_tpu.core.ops import XlaOps
from codon_tpu.kernels.cac import cac_stage_pallas, cac_stats, spatial_logits
from codon_tpu.models.codon_net import cac_channel_gate, cac_spatial_gate
from codon_tpu.core.params import linear_init, conv_kernel_init

N, H, W, C = 2, 37, 29, 64


def _data(seed=0, negative=True):
    rng = np.random.RandomState(seed)
    def t(shape):
        x = rng.randn(*shape) if negative else rng.rand(*shape)
        return jnp.asarray(x.astype(np.float32))
    return t((N, H, W, C)), t((N, H, W, C)), t((N, H, W, C)), t((N, H, W, C))


def _weights(seed=1):
    k = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(k, 3)
    w1, b1 = linear_init(k1, 2 * C, 8)
    w2, b2 = linear_init(k2, 8, C)
    sp_w = conv_kernel_init(k3, 5, 5, 2, 1)
    return w1, b1, w2, b2, sp_w


def _xla_stage(out, out_c, inputs, inputs_c, w1, b1, w2, b2, sp_w, mask=None):
    ops = XlaOps()
    ch = cac_channel_gate((out_c, out), w1, b1, w2, b2, ops, mask)
    sp = cac_spatial_gate((out_c, out), sp_w, ops, mask)
    ad = ch * sp
    return out * ad + inputs, out_c * ad + inputs_c


def test_stats_kernel():
    out, out_c, _, _ = _data()
    s, m, cmax, cmean = cac_stats(out, out_c, interpret=True)
    fcat = jnp.concatenate([out_c, out], -1)
    np.testing.assert_allclose(np.asarray(s)[:, 0] / (H * W),
                               np.asarray(jnp.mean(fcat, (1, 2))),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(m)[:, 0],
                               np.asarray(jnp.max(fcat, (1, 2))),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(cmax),
                               np.asarray(jnp.max(fcat, -1)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cmean),
                               np.asarray(jnp.mean(fcat, -1)),
                               atol=1e-5, rtol=1e-5)


def test_spatial_logits_kernel():
    out, out_c, _, _ = _data(2)
    *_, sp_w = _weights()
    fcat = jnp.concatenate([out_c, out], -1)
    cmax = jnp.max(fcat, -1)
    cmean = jnp.mean(fcat, -1)
    got = spatial_logits(cmax, cmean, sp_w, interpret=True)
    want = XlaOps().conv2d(
        jnp.stack([cmax, cmean], -1), sp_w)[..., 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)


def test_full_stage_parity():
    out, out_c, inputs, inputs_c = _data(3)
    w1, b1, w2, b2, sp_w = _weights()
    a = cac_stage_pallas(out, out_c, inputs, inputs_c,
                         w1, b1, w2, b2, sp_w, interpret=True)
    b = _xla_stage(out, out_c, inputs, inputs_c, w1, b1, w2, b2, sp_w)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-5, rtol=1e-4)


def test_full_stage_parity_masked():
    out, out_c, inputs, inputs_c = _data(4)
    mask = np.zeros((N, H, W, 1), np.float32)
    mask[0, :H, :W] = 1.0
    mask[1, :20, :15] = 1.0
    mask = jnp.asarray(mask)
    # masked convs upstream zero the padding — emulate that state
    out, out_c = out * mask, out_c * mask
    inputs, inputs_c = inputs * mask, inputs_c * mask
    w1, b1, w2, b2, sp_w = _weights()
    a = cac_stage_pallas(out, out_c, inputs, inputs_c,
                         w1, b1, w2, b2, sp_w, mask, interpret=True)
    b = _xla_stage(out, out_c, inputs, inputs_c, w1, b1, w2, b2, sp_w, mask)
    # compare EVERYWHERE, padding region included: the next conv's stencil
    # reads the padded rows, so the kernels must agree there too (not just
    # on valid pixels)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-5, rtol=1e-4)
