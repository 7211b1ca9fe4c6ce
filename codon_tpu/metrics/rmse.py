"""Masked RMSE — semantics of the reference's EvaluationResults.

Reference (/root/reference/CODON_X4/test.py:148-164): float64; ground truth
cropped to the output's shape; pixels where GT == 0 (invalid depth) are
excluded from BOTH the error sum and the pixel count; RMSE over the rest.
The reference runs an O(H*W) pure-Python double loop — the rebuild is
vectorized (host numpy) and available on-device (jnp) for batched eval.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def masked_rmse(label: np.ndarray, output: np.ndarray) -> float:
    """Host version. label/output: 2D arrays, [0,255] domain (uint8 ok)."""
    label = np.asarray(label, np.float64)
    output = np.asarray(output, np.float64)
    label = label[: output.shape[0], : output.shape[1]]
    valid = label != 0
    err = np.where(valid, label - output, 0.0)
    count = int(valid.sum())
    if count == 0:
        raise ValueError("masked_rmse: label has no valid (nonzero) "
                         "pixels — a silent nan would corrupt the mean")
    return float(np.sqrt((err ** 2).sum() / count))


def masked_rmse_jnp(label, output, mask=None):
    """On-device, batched: label/output (N, H, W) or (N, H, W, 1), float.

    `mask` (optional, same shape): validity of the padded region — combined
    with the label!=0 rule so padded batches produce per-image-exact metrics.
    Returns (N,) RMSE values (float32 on TPU; use float64 on CPU for exact
    reference parity).
    """
    label = jnp.asarray(label)
    output = jnp.asarray(output, label.dtype)
    if label.ndim == 4:
        label, output = label[..., 0], output[..., 0]
        if mask is not None and mask.ndim == 4:
            mask = mask[..., 0]
    valid = label != 0
    if mask is not None:
        valid = jnp.logical_and(valid, mask.astype(bool))
    err = jnp.where(valid, label - output, 0.0)
    count = jnp.sum(valid, axis=(1, 2))
    mse = jnp.sum(err ** 2, axis=(1, 2)) / count
    return jnp.sqrt(mse)
