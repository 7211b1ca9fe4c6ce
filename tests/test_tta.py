"""Geometric self-ensemble: equivariance and averaging semantics."""
import numpy as np
import jax
import jax.numpy as jnp

from codon_tpu.models.tta import make_tta_forward
from codon_tpu.models.variants import get_variant


def _setup():
    v = get_variant("codon")
    params = jax.tree.map(lambda w: w * 0.5, v.init(jax.random.PRNGKey(0)))
    rng = np.random.RandomState(0)
    d = rng.rand(1, 20, 17, 1).astype(np.float32)
    c = rng.rand(1, 20, 17, 1).astype(np.float32)
    fwd = lambda p, a, b, m: v.forward(p, a, b, mask=m)
    return params, d, c, fwd


def test_tta_flip_equivariant():
    """tta(flip(x)) == flip(tta(x)) exactly up to float-order noise —
    the ensemble averages over the full flip group, so flipping the input
    permutes the ensemble members."""
    params, d, c, fwd = _setup()
    tta = jax.jit(make_tta_forward(fwd))
    out = np.asarray(tta(params, d, c, None))
    out_f = np.asarray(tta(params, d[:, ::-1], c[:, ::-1], None))
    np.testing.assert_allclose(out_f[:, ::-1], out, atol=1e-5, rtol=1e-5)


def test_tta_is_mean_of_members():
    params, d, c, fwd = _setup()
    tta = make_tta_forward(fwd)
    got = np.asarray(tta(params, d, c, None))
    acc = np.zeros_like(got)
    for fh in (False, True):
        for fv in (False, True):
            ax = ([1] if fv else []) + ([2] if fh else [])
            fl = (lambda t: np.flip(t, tuple(ax))) if ax else (lambda t: t)
            acc += fl(np.asarray(fwd(params, jnp.asarray(fl(d)),
                                     jnp.asarray(fl(c)), None)))
    np.testing.assert_allclose(got, acc / 4.0, atol=1e-5, rtol=1e-5)


def test_tta_batched_matches_sequential():
    """The serving lowering (flips stacked on the batch axis, ONE forward)
    computes the same ensemble as four sequential forwards. B=2 guards the
    slice/unflip bookkeeping."""
    params, d, c, fwd = _setup()
    d2 = np.concatenate([d, d[:, ::-1]], 0)
    c2 = np.concatenate([c, c[:, ::-1]], 0)
    m2 = np.ones_like(d2)
    batched = jax.jit(make_tta_forward(fwd, mode="batched"))
    seq = jax.jit(make_tta_forward(fwd, mode="sequential"))
    np.testing.assert_allclose(np.asarray(batched(params, d2, c2, m2)),
                               np.asarray(seq(params, d2, c2, m2)),
                               atol=1e-5, rtol=1e-5)


def test_tta8_is_mean_of_dihedral_members():
    """transforms=8 averages over the full dihedral group D4: the four
    flips plus transpose composed with each flip (non-square input guards
    the H/W bookkeeping of the transposed quartet)."""
    params, d, c, fwd = _setup()
    tta8 = make_tta_forward(fwd, transforms=8)
    got = np.asarray(tta8(params, d, c, None))
    acc = np.zeros_like(got)
    for tr in (False, True):
        for fh in (False, True):
            for fv in (False, True):
                ax = ([1] if fv else []) + ([2] if fh else [])
                fl = (lambda t: np.flip(t, tuple(ax))) if ax else (
                    lambda t: t)
                tp = (lambda t: np.swapaxes(t, 1, 2)) if tr else (
                    lambda t: t)
                o = np.asarray(fwd(params, jnp.asarray(fl(tp(d))),
                                   jnp.asarray(fl(tp(c))), None))
                acc += tp(fl(o))
    np.testing.assert_allclose(got, acc / 8.0, atol=1e-5, rtol=1e-5)


def test_tta8_batched_matches_sequential():
    params, d, c, fwd = _setup()
    m = np.ones_like(d)
    batched = jax.jit(make_tta_forward(fwd, mode="batched", transforms=8))
    seq = jax.jit(make_tta_forward(fwd, mode="sequential", transforms=8))
    np.testing.assert_allclose(np.asarray(batched(params, d, c, m)),
                               np.asarray(seq(params, d, c, m)),
                               atol=1e-5, rtol=1e-5)


def test_tta_mask_flips_with_content():
    """Padded batches: TTA of a padded image == TTA of the unpadded image
    on the valid region (mask travels with the flips)."""
    params, d, c, fwd = _setup()
    tta = jax.jit(make_tta_forward(fwd))
    ref = np.asarray(tta(params, d, c, np.ones_like(d)))
    pad = [(0, 0), (0, 6), (0, 5), (0, 0)]
    dp, cp = np.pad(d, pad), np.pad(c, pad)
    m = np.pad(np.ones_like(d), pad)
    out = np.asarray(tta(params, dp, cp, m))[:, :20, :17]
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)
