"""SSIM metrics with exact parity to the reference's ssim_2.py.

`ssim_exact` — Gaussian-window SSIM (/root/reference/CODON_X4/ssim_2.py:36-52):
scipy.ndimage.gaussian_filter, sigma=1.5, default truncate=4.0 (radius 6),
boundary mode 'reflect' (== numpy/jnp pad mode 'symmetric' — scipy's 'reflect'
duplicates the edge sample; easy to get silently wrong), C1=0.01^2, C2=0.03^2,
mean over the full SSIM map.

`ssim_block` — the reference's 4x4 block-view variant (ssim_2.py:9-33).
As shipped it is Python-3-broken (float shapes from `/` in block_view); the
rebuild reproduces its math with integer block reshapes.

Host versions use scipy (bit-exact with the reference); `ssim_exact_jnp` is
an on-device separable-conv implementation validated against scipy.
"""
from __future__ import annotations

import numpy as np
from scipy.ndimage import gaussian_filter

import jax.numpy as jnp

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def ssim_exact(img1, img2, sd: float = 1.5, C1: float = _C1,
               C2: float = _C2) -> float:
    """Host (scipy) Gaussian SSIM; img1/img2 2D float arrays in [0, 1]."""
    img1 = np.asarray(img1, np.float64)
    img2 = np.asarray(img2, np.float64)
    mu1 = gaussian_filter(img1, sd)
    mu2 = gaussian_filter(img2, sd)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = gaussian_filter(img1 * img1, sd) - mu1_sq
    sigma2_sq = gaussian_filter(img2 * img2, sd) - mu2_sq
    sigma12 = gaussian_filter(img1 * img2, sd) - mu1_mu2
    num = (2 * mu1_mu2 + C1) * (2 * sigma12 + C2)
    den = (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    return float(np.mean(num / den))


def gaussian_kernel_1d(sd: float = 1.5, truncate: float = 4.0,
                       dtype=np.float64) -> np.ndarray:
    """scipy.ndimage._gaussian_kernel1d semantics: radius = int(t*sd + 0.5)."""
    radius = int(truncate * sd + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sd) ** 2)
    return (k / k.sum()).astype(dtype)


def _gauss_blur_jnp(img, kernel):
    """Separable blur over the last two axes, scipy-'reflect' boundary."""
    r = (kernel.shape[0] - 1) // 2
    k = jnp.asarray(kernel, img.dtype)
    # scipy 'reflect' == jnp.pad 'symmetric' (edge sample duplicated)
    pad_h = [(0, 0)] * (img.ndim - 2) + [(r, r), (0, 0)]
    x = jnp.pad(img, pad_h, mode="symmetric")
    idx = jnp.arange(img.shape[-2])[:, None] + jnp.arange(2 * r + 1)[None, :]
    # take inserts the window axis at -2: (..., H, 2r+1, W) — contract -2
    x = jnp.tensordot(jnp.take(x, idx, axis=-2), k, axes=([-2], [0]))
    pad_w = [(0, 0)] * (img.ndim - 1) + [(r, r)]
    x = jnp.pad(x, pad_w, mode="symmetric")
    idx = jnp.arange(img.shape[-1])[:, None] + jnp.arange(2 * r + 1)[None, :]
    x = jnp.tensordot(jnp.take(x, idx, axis=-1), k, axes=([-1], [0]))
    return x


def ssim_exact_jnp(img1, img2, sd: float = 1.5, C1: float = _C1,
                   C2: float = _C2, mask=None):
    """On-device Gaussian SSIM. img1/img2: (..., H, W); returns (...) means.

    Without `mask` this is exact vs scipy (symmetric pad == 'reflect').
    With `mask` (same shape, 1 = valid, for padded batches) boundary
    statistics use normalized convolution — blur(x*m)/blur(m) — instead of
    the reflect padding a per-image run would see; the mean is over valid
    pixels. Close but not bit-equal near the valid boundary; run
    uniform-size batches (or host metrics) for reference-exact numbers.
    """
    img1 = jnp.asarray(img1)
    img2 = jnp.asarray(img2, img1.dtype)
    kernel = gaussian_kernel_1d(sd, dtype=np.float64 if img1.dtype ==
                                jnp.float64 else np.float32)
    if mask is None:
        blur = lambda t: _gauss_blur_jnp(t, kernel)
    else:
        m = jnp.asarray(mask, img1.dtype)
        bm = _gauss_blur_jnp(m, kernel)
        inv_bm = jnp.where(bm > 1e-6, 1.0 / bm, 0.0)

        def blur(t):
            return _gauss_blur_jnp(t * m, kernel) * inv_bm

    mu1 = blur(img1)
    mu2 = blur(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = blur(img1 * img1) - mu1_sq
    s2 = blur(img2 * img2) - mu2_sq
    s12 = blur(img1 * img2) - mu1_mu2
    num = (2 * mu1_mu2 + C1) * (2 * s12 + C2)
    den = (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    smap = num / den
    if mask is None:
        return jnp.mean(smap, axis=(-2, -1))
    m = jnp.asarray(mask, smap.dtype)
    return jnp.sum(smap * m, axis=(-2, -1)) / jnp.sum(m, axis=(-2, -1))


def ssim_block(img1, img2, C1: float = _C1, C2: float = _C2,
               block: int = 4) -> float:
    """The reference's 4x4 block SSIM (ssim_2.py:20-33), py3-fixed.

    Note: reproduces the reference's own quirk of using block SUMS (not
    means) for the statistics — it is the shipped behavior, kept verbatim.
    """
    img1 = np.asarray(img1, np.float64)
    img2 = np.asarray(img2, np.float64)
    hb, wb = img1.shape[0] // block, img1.shape[1] // block
    b1 = img1[: hb * block, : wb * block].reshape(hb, block, wb, block)
    b1 = b1.transpose(0, 2, 1, 3)
    b2 = img2[: hb * block, : wb * block].reshape(hb, block, wb, block)
    b2 = b2.transpose(0, 2, 1, 3)
    s1 = b1.sum(axis=(-1, -2))
    s2 = b2.sum(axis=(-1, -2))
    ss = (b1 * b1).sum(axis=(-1, -2)) + (b2 * b2).sum(axis=(-1, -2))
    s12 = (b1 * b2).sum(axis=(-1, -2))
    vari = ss - s1 * s1 - s2 * s2
    covar = s12 - s1 * s2
    smap = (2 * s1 * s2 + C1) * (2 * covar + C2) / (
        (s1 * s1 + s2 * s2 + C1) * (vari + C2))
    return float(np.mean(smap))
