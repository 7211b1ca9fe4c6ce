"""AOT model export for serving: jax.export StableHLO artifacts.

A deployment artifact the reference never had: the jitted forward
(weights baked in, any Ops backend — bf16 or static-int8) serialized as
platform-checked StableHLO with a POLYMORPHIC batch dimension, loadable
in a serving process with no model code, no checkpoint loading, and no
Python-side retracing:

    # build side
    export_forward(variant, params, (370, 463), "model.codonx")
    # serving side
    fn = load_exported("model.codonx")
    out = fn(depth_b, color_b)         # any batch size

H and W are fixed per artifact (conv lowering stays fully static —
export one artifact per supported resolution; the eval pipeline pads to
a small set of bucket shapes already). The artifact records the lowering
platform (cpu/tpu) and jax.export refuses cross-platform execution.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def export_forward(variant, params, hw: Tuple[int, int], path: str,
                   ops=None, mask: bool = False, tta=False,
                   scale_cond: float = None) -> int:
    """Serialize the forward to `path`. Returns the artifact size in bytes.

    hw: (H, W) of the (padded) input resolution.
    ops: optional Ops backend baked into the artifact (e.g. Int8StaticOps
         with its scales — the full static-int8 path exports cleanly, it
         is pure XLA ops).
    mask: also take a validity-mask input (padded-batch serving).
    tta: bake a geometric self-ensemble into the artifact (batched
         lowering — flips ride the batch axis of one forward;
         models/tta.py). True or 4 = the 4-flip subgroup; 8 = the full
         dihedral group (adds the transposed quartet as a second batched
         forward at (W, H) — the quality-flagship eval config). The
         flagship serving config is tta=8 over a static-int8 ops backend.
    scale_cond: bake the constant scale/16 conditioning plane into the
         artifact (codon_sc variants) — the caller still feeds 1-channel
         depth; the plane is appended inside the exported program,
         beneath the TTA wrapper like the eval path.
    """
    import jax
    import jax.export
    import jax.numpy as jnp

    h, w = hw
    b = jax.export.symbolic_shape("b")[0]
    img = jax.ShapeDtypeStruct((b, h, w, 1), jnp.float32)

    base = lambda p, d, c, m: variant.forward(p, d, c, mask=m, ops=ops)
    if scale_cond is not None:
        _inner = base

        def base(p, d, c, m):
            plane = jnp.full_like(d[..., :1], scale_cond)
            return _inner(p, jnp.concatenate([d, plane], -1), c, m)
    if tta:
        n = 4 if tta is True else int(tta)
        from codon_tpu.models.tta import make_tta_forward
        base = make_tta_forward(base, transforms=n)

    if mask:
        def fwd(depth, color, m):
            return base(params, depth, color, m)
        args = (img, img, img)
    else:
        def fwd(depth, color):
            return base(params, depth, color, None)
        args = (img, img)

    exp = jax.export.export(jax.jit(fwd))(*args)
    data = exp.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load_exported(path: str):
    """Load an artifact; returns fn(depth, color[, mask]) -> (B,H,W,1)."""
    import jax.export

    with open(path, "rb") as f:
        exp = jax.export.deserialize(f.read())

    def fn(*args):
        return exp.call(*[np.asarray(a, np.float32) for a in args])

    return fn
