"""Geometric self-ensemble (test-time augmentation) for depth SR.

Standard SR practice (EDSR-style): average the model over a group of
geometric transforms, inverse-mapping each prediction. The default is the
4-flip subgroup (id/V/H/HV): flips keep the (H, W) shape, so all four
copies ride ONE batched forward and masks stay exact (they flip WITH the
content, so padded-batch semantics are untouched).

transforms=8 extends to the full dihedral group D4 by adding the
transposed quartet (transpose ∘ each flip = the four rotations/
reflections that swap H and W). The net is fully convolutional, so a
transposed input is just another valid image; the transposed copies run
as a SECOND batched forward at (W, H) inside the same jit (they cannot
share a batch with the (H, W) quartet), i.e. 8x compute, two conv
shapes per program.

The reference has no equivalent; this is an eval-time quality lever
(~10-15% RMSE reduction measured on the holdout checkpoints) at 4x
compute, exposed as `cli eval --tta`.

Serving-grade lowering: the four flipped copies ride the BATCH axis of
ONE forward (mode="batched", the default) instead of four sequential
forwards. The MXU sees a 4x larger batch — on v5e the net runs fastest
at batch ~32, so TTA at input batch 8 runs the convs at their best
operating point rather than 4x a smaller one; it also composes with the
dp mesh (the wrapper quadruples B before the mesh pad/shard) and with
model ensembles (flip batching inside each member's forward).
"""
from __future__ import annotations

import jax.numpy as jnp

_FLIP_AXES = ((), (1,), (2,), (1, 2))   # id / V / H / HV


def _tr(t):
    """Transpose the spatial axes of an NHW[C] tensor."""
    return jnp.swapaxes(t, 1, 2)


def make_tta_forward(fwd, mode: str = "batched", transforms: int = 4):
    """Wrap fwd(params, depth, color, mask) -> out with a geometric ensemble.

    fwd must be shape-equivariant under the transforms (any fully-
    convolutional net); the wrapper is then flip-EQUIVARIANT by
    construction: tta(flip(x)) == flip(tta(x)) up to float-order noise
    (tested).

    transforms: 4 (flips) or 8 (flips + their transposes = full D4).

    mode="batched": the 4 flips ride one forward at 4x batch (and, for
    transforms=8, the 4 transposed flips ride a second forward at the
    swapped spatial shape) — the serving path. mode="sequential": one
    forward per transform (the round-2 lowering; kept for A/B timing and
    memory-constrained cases).
    """
    if transforms not in (4, 8):
        raise ValueError(f"transforms must be 4 or 8, got {transforms}")
    if mode == "batched":
        def tta(params, depth, color, mask):
            def quartet(d, c, m):
                def stack(t):
                    return jnp.concatenate(
                        [jnp.flip(t, ax) if ax else t
                         for ax in _FLIP_AXES], 0)

                out = fwd(params, stack(d), stack(c),
                          None if m is None else stack(m))
                # (4b, ...) -> (4, b, ...): a reshape rather than
                # symbolic-bound slices, so the wrapper exports under a
                # polymorphic batch dim (jax.export factors 4b as 4*b)
                out4 = out.reshape((4, d.shape[0]) + out.shape[1:])
                return sum(jnp.flip(out4[i], ax) if ax else out4[i]
                           for i, ax in enumerate(_FLIP_AXES))

            acc = quartet(depth, color, mask)
            if transforms == 8:
                acc = acc + _tr(quartet(
                    _tr(depth), _tr(color),
                    None if mask is None else _tr(mask)))
            return acc / float(transforms)

        return tta

    def tta(params, depth, color, mask):
        acc = None
        for k in range(transforms // 4):
            tr = _tr if k else (lambda t: t)
            for ax in _FLIP_AXES:
                fl = (lambda t, a=ax: jnp.flip(t, a)) if ax else (lambda t: t)
                tf = (lambda t, f=fl, g=tr: f(g(t)))
                inv = (lambda t, f=fl, g=tr: g(f(t)))
                o = inv(fwd(params, tf(depth), tf(color),
                            None if mask is None else tf(mask)))
                acc = o if acc is None else acc + o
        return acc / float(transforms)

    return tta
