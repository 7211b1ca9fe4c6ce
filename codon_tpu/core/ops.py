"""Ops backend abstraction.

Models in codon_tpu are written against a tiny `Ops` interface instead of raw
lax calls. This is what makes one model definition run in three execution
regimes without edits:

  * `XlaOps`      — single device (or batch-DP under pjit): plain XLA convs.
  * `ShardedOps`  — spatially-tiled execution inside `shard_map`: convs do
                    ppermute halo exchange along the sharded H axis, and the
                    global pools that feed the CAC channel gates do
                    psum/pmax collectives so tiled inference is bit-exact
                    with untiled (see codon_tpu/parallel/ops.py).
  * masked        — both backends take an optional validity mask so a batch
                    of differently-sized images padded to one shape computes
                    EXACTLY what per-image execution would (the reference
                    runs strictly per-image, batch=1: CODON_X4/test.py:109).

Layouts are TPU-native: NHWC activations, HWIO kernels — C rides the 128-wide
lane dimension (C=64/128 throughout CODONNet), spatial dims are free.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def conv2d_nhwc(x: jax.Array, w: jax.Array, *, padding="SAME",
                acc_dtype=jnp.float32, precision=None,
                groups: int = 1) -> jax.Array:
    """Stride-1 NHWC/HWIO conv in x.dtype.

    No preferred_element_type: the MXU accumulates bf16 convs in f32
    internally regardless, the output was cast back to x.dtype anyway,
    and a mismatched accumulator dtype breaks the conv transpose rule
    under jax.grad (f32 cotangent vs bf16 operands). `acc_dtype` is kept
    in the signature for API stability.
    `precision`: lax.Precision for fp32 inputs on the MXU — on TPU, fp32
    convs default to a fast bf16-ish path; parity-grade fp32 needs HIGHEST.
    `groups`: feature_group_count (the merged-tower forward runs both
    towers as one grouped conv).
    """
    del acc_dtype
    return lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
        feature_group_count=groups,
    )


class Ops:
    """Interface. `mask` is (N, H, W, 1) with 1.0 on valid pixels, or None.

    `name` identifies the conv SITE (the parameter name, or a synthetic
    name like "packed_d" for trace-time-merged kernels). Float backends
    ignore it; quantized backends key per-site static activation scales
    on it (codon_tpu/quant_ops.py).
    """

    def conv2d(self, x, w, *, padding="SAME", mask=None, groups=1,
               name=None):  # pragma: no cover - interface
        raise NotImplementedError

    def global_avg(self, x, mask=None):
        raise NotImplementedError

    def global_max(self, x, mask=None):
        raise NotImplementedError

    def global_sum(self, x, mask=None):
        raise NotImplementedError

    def apply_mask(self, x, mask=None):
        return x if mask is None else x * mask.astype(x.dtype)

    def precommit(self, x, name=None):
        """Commit a stage-boundary tensor whose ONLY consumer is the conv
        site `name`. Float backends: identity. Quantized backends may
        return the tensor ALREADY in its storage format (int8 on the
        consuming conv's grid) so the float intermediate is never
        materialized to HBM — the model calls this on loop-carried
        activations (quantize-at-produce == quantize-at-use bitwise:
        identical scale, identical float input)."""
        del name
        return x

    def roundtrip(self, x, name=None):
        """Pass a float tensor through the storage grid of site `name`
        (float in, float out). Float backends: identity. Static-int8
        backends: quantize + inline dequant — the MATERIALIZED tensor is
        int8 (1 byte across HBM) and the per-channel dequant fuses into
        every consumer pass. The model calls this on tensors with many
        elementwise consumers (CAC gate inputs, stem outputs feeding the
        per-stage residual adds) where the conv-input precommit contract
        does not apply. Unlike precommit the call is visible to QAT and
        calibration (FakeQuantStaticOps fake-quants on the same grid;
        CalibrationOps records the site), so deployment numerics are
        trained-for, not approximated."""
        del name
        return x


class XlaOps(Ops):
    """Single-device / data-parallel backend: let XLA do everything.

    With a mask, every conv output is re-masked so zero padding outside each
    image's valid region behaves identically to SAME zero-padding of an
    unpadded image — making batched mixed-size inference exact.
    """

    def __init__(self, acc_dtype=jnp.float32, precision=None):
        self.acc_dtype = acc_dtype
        self.precision = precision

    def conv2d(self, x, w, *, padding="SAME", mask=None, groups=1,
               name=None):
        del name  # float path: site identity is irrelevant
        out = conv2d_nhwc(x, w, padding=padding, acc_dtype=self.acc_dtype,
                          precision=self.precision, groups=groups)
        return self.apply_mask(out, mask)

    def global_avg(self, x, mask=None):
        """Mean over H, W -> (N, 1, 1, C)."""
        if mask is None:
            return jnp.mean(x, axis=(1, 2), keepdims=True)
        m = mask.astype(x.dtype)
        s = jnp.sum(x * m, axis=(1, 2), keepdims=True)
        n = jnp.sum(m, axis=(1, 2), keepdims=True)
        return s / n

    def global_max(self, x, mask=None):
        """Max over H, W -> (N, 1, 1, C)."""
        if mask is None:
            return jnp.max(x, axis=(1, 2), keepdims=True)
        neg = jnp.asarray(-jnp.inf, x.dtype)
        xm = jnp.where(mask.astype(bool), x, neg)
        return jnp.max(xm, axis=(1, 2), keepdims=True)

    def global_sum(self, x, mask=None):
        """Sum over H, W -> (N, 1, 1, C)."""
        if mask is not None:
            x = x * mask.astype(x.dtype)
        return jnp.sum(x, axis=(1, 2), keepdims=True)
