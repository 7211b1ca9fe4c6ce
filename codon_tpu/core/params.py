"""Parameter initialization and dtype policy.

Initializers mirror the reference's conv init N(0, sqrt(2/(k^2 * C_out)))
(reference: CODON_X4/CODON_x4.py:50-53) so freshly-initialized networks are
distributionally comparable with the PyTorch release. Weight layouts are
TPU-native: conv kernels HWIO (NHWC convs), linear weights (in, out).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Params stored in `param_dtype`; compute in `compute_dtype`.

    The reference runs fp16 end-to-end on GPU (CODON_X4/test.py:52); the
    TPU-native analog is bf16 compute with fp32 params and fp32 conv
    accumulation on the MXU.
    """

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32
    # dtype used for conv/matmul accumulation (preferred_element_type)
    acc_dtype: Any = jnp.float32
    # lax.Precision for fp32 MXU ops ("highest" = true fp32; None = fast path)
    precision: Any = None

    def cast(self, tree):
        return jax.tree.map(lambda x: x.astype(self.compute_dtype), tree)


BF16 = DTypePolicy(compute_dtype=jnp.bfloat16)
FP32 = DTypePolicy(precision="highest")
# The reference ran fp16 end-to-end on GPU (CODON_X4/test.py:52); bf16 is
# the MXU-native choice, but fp16 compute is supported for apples-to-apples
# numerics comparisons.
FP16 = DTypePolicy(compute_dtype=jnp.float16)

# CLI dtype-name -> policy, ONE copy (int8 execution computes its float
# residue — gates, stems, dequant epilogues — in bf16)
DTYPE_POLICIES = {"fp32": FP32, "bf16": BF16, "fp16": FP16, "int8": BF16}


def conv_kernel_init(key, kh: int, kw: int, c_in: int, c_out: int,
                     dtype=jnp.float32) -> jax.Array:
    """He-style init matching the reference: std = sqrt(2 / (kh*kw*c_out)).

    Returns an HWIO kernel (kh, kw, c_in, c_out).
    """
    std = math.sqrt(2.0 / (kh * kw * c_out))
    return std * jax.random.normal(key, (kh, kw, c_in, c_out), dtype=dtype)


def linear_init(key, c_in: int, c_out: int, dtype=jnp.float32):
    """Torch-default-like Linear init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    Returns (w, b) with w shaped (c_in, c_out) so that y = x @ w + b.
    """
    bound = 1.0 / math.sqrt(c_in)
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, (c_in, c_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (c_out,), dtype, -bound, bound)
    return w, b


def param_count(tree) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))
