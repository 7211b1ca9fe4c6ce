"""Geometric self-ensemble (test-time augmentation) for depth SR.

Standard SR practice (EDSR-style): average the model over a group of
geometric transforms, inverse-mapping each prediction. Flips only — rot90
would swap H/W and break shape-specialized jits and padded mixed-size
batches; the 4-flip subgroup keeps masks exact (they flip WITH the
content, so padded-batch semantics are untouched).

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


def make_tta_forward(fwd, mode: str = "batched"):
    """Wrap fwd(params, depth, color, mask) -> out with a 4-flip ensemble.

    fwd must be flip-equivariant in shape (any fully-convolutional net);
    the wrapper is then flip-EQUIVARIANT by construction: tta(flip(x)) ==
    flip(tta(x)) up to float-order noise (tested).

    mode="batched": one forward at 4x batch (flips stacked on axis 0) —
    the serving path. mode="sequential": four forwards (the round-2
    lowering; kept for A/B timing and memory-constrained cases).
    """
    if mode == "batched":
        def tta(params, depth, color, mask):
            def stack(t):
                return jnp.concatenate(
                    [jnp.flip(t, ax) if ax else t for ax in _FLIP_AXES], 0)

            out = fwd(params, stack(depth), stack(color),
                      None if mask is None else stack(mask))
            # (4b, ...) -> (4, b, ...): a reshape rather than symbolic-
            # bound slices, so the wrapper exports under a polymorphic
            # batch dim (jax.export factors 4b as 4*b)
            out4 = out.reshape((4, depth.shape[0]) + out.shape[1:])
            acc = sum(jnp.flip(out4[i], ax) if ax else out4[i]
                      for i, ax in enumerate(_FLIP_AXES))
            return acc / 4.0

        return tta

    def tta(params, depth, color, mask):
        acc = None
        for ax in _FLIP_AXES:
            fl = (lambda t, a=ax: jnp.flip(t, a)) if ax else (lambda t: t)
            o = fl(fwd(params, fl(depth), fl(color),
                       None if mask is None else fl(mask)))
            acc = o if acc is None else acc + o
        return acc / 4.0

    return tta
