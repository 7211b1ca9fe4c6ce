"""Host-side tile+stitch inference for very large frames.

Two large-frame strategies exist in codon_tpu:

  * EXACT: shard the frame's H axis over a device mesh
    (parallel/tiling.py) — halo-exchange convs + psum'd CAC statistics
    keep results bit-identical to untiled execution. Use when the frame
    fits across the mesh's combined HBM.
  * THIS MODULE (approximate): overlapping host-side tiles processed
    sequentially on one device, center-cropped and stitched. The CAC
    channel gates see per-tile (not global) pooled statistics — the only
    source of divergence, bounded in tests; conv stencils are exact given
    `halo` >= the receptive-field radius (47 px for CODONNet: stems 1+1,
    per MC stage 2 (cell 5x5) + 2 (conv3/6 5x5) + 2 (CAC spatial 5x5) = 6
    over 5 stages, fusion 1 (conv7) + 3 x 4 (conv8||9 + conv10) + 1
    (conv11) + 1 (output) = 15 — see SURVEY.md §5 'long-context' row).

This replaces nothing in the reference (it ran whole frames, batch=1,
CODON_X4/test.py:122-125) — it is the capability that lets one chip
process frames whose activations exceed HBM.
"""
from __future__ import annotations


import numpy as np
import jax


DEFAULT_HALO = 48  # >= CODONNet stencil receptive-field radius (47 px)


def tile_stitch_infer(variant, params, depth, color, *, tile_h: int = 512,
                      halo: int = DEFAULT_HALO, fwd=None):
    """depth/color: (1, H, W, 1) host arrays -> (1, H, W, 1) output.

    Tiles along H with `halo` overlap; each tile runs the normal forward;
    centers are stitched. Pass `fwd` (jitted) to reuse a compiled tile
    function across calls.
    """
    _, H, W, _ = depth.shape
    want = tile_h + 2 * halo
    if H <= want:
        # a frame no taller than one padded tile runs whole (exact): the
        # tiled path would append unmasked zero rows to reach `want`,
        # contaminating the CAC global pooled statistics, and every tile
        # would span the frame anyway
        f = fwd or jax.jit(lambda p, d, c: variant.forward(p, d, c))
        return np.asarray(f(params, depth, color))

    if fwd is None:
        fwd = jax.jit(lambda p, d, c: variant.forward(p, d, c))

    out = np.zeros((1, H, W, 1), np.float32)
    y = 0
    while y < H:
        y1 = min(y + tile_h, H)
        top = max(0, y - halo)
        bot = min(H, y1 + halo)
        # keep the tile shape constant -> one XLA compile; H > want
        # guarantees a full-height window of real rows always fits
        if bot - top < want:
            if top == 0:
                bot = top + want
            else:
                top = bot - want
        d_t = depth[:, top:bot]
        c_t = color[:, top:bot]
        o_t = np.asarray(fwd(params, d_t, c_t))
        out[:, y:y1] = o_t[:, y - top:y1 - top]
        y = y1
    return out
