"""Fused on-device evaluation: forward + quantize + masked RMSE + SSIM in
one jitted program per batch — scalars are the only D2H traffic.

This is the 'batched full-folder sweep with on-device eval' configuration
(BASELINE.json configs[3]). Quantization to uint8 and back mirrors the
reference's save-then-score flow (CODON_X4/test.py:130-138) so on-device
RMSE is EXACT vs host metrics on the written PNGs. On-device SSIM is exact
for images that fill the padded shape; for padded images the 6-pixel
boundary ring uses normalized-convolution statistics instead of per-image
reflect padding (close, tests quantify the gap); host SSIM remains the
reference-exact path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from codon_tpu.metrics.rmse import masked_rmse_jnp
from codon_tpu.metrics.ssim import ssim_exact_jnp


def make_batch_evaluator(variant, tta=False, ops=None, scales_to_ops=None):
    """-> jitted fn(params, depth, color, mask, label) -> dict of (N,) stats
    plus the uint8 output batch (for optional saving).

    tta: score the geometric self-ensemble (batched lowering) instead of
    the plain forward — the on-device metrics then measure exactly what
    `eval --tta` writes. Accepts False/0, True/4 (flips) or 8 (full D4).
    ops: optional Ops backend (e.g. dynamic int8).
    scales_to_ops: optional callable (act_scales) -> Ops. When given and
    params carry "act_scales", the static-int8 backend is built from them
    AT CALL TIME so weights and scales both ride the jit as arguments —
    the compiled program is then shared by every checkpoint of the same
    shape family instead of baking each checkpoint's scales in as
    constants (the compile-cache discipline of the main eval path)."""

    def fwd(p, d, c, m):
        o = ops
        if (scales_to_ops is not None and isinstance(p, dict)
                and "act_scales" in p):
            p = dict(p)
            o = scales_to_ops(p.pop("act_scales"))
        return variant.forward(p, d, c, mask=m, ops=o)
    if tta:
        from codon_tpu.models.tta import make_tta_forward
        fwd = make_tta_forward(fwd, transforms=8 if tta == 8 else 4)

    @jax.jit
    def evaluate(params, depth, color, mask, label):
        out = fwd(params, depth, color, mask)
        u8 = (jnp.clip(out[..., 0], 0.0, 1.0) * 255).astype(jnp.uint8)
        dq = u8.astype(jnp.float32)               # what the PNG will hold
        lab = label[..., 0].astype(jnp.float32)
        # mask=None passes None through: both metrics then take their
        # exact unmasked paths (a fabricated all-ones mask would force
        # SSIM's normalized-convolution branch, ~1e-7 off exact)
        m = mask[..., 0] if mask is not None else None
        rmse = masked_rmse_jnp(lab, dq, m)
        ssim = ssim_exact_jnp(lab / 255.0, dq / 255.0, mask=m)
        return {"rmse": rmse, "ssim": ssim, "out_u8": u8}

    return evaluate
