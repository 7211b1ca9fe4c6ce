"""Attention primitives for the ablation zoo — functional JAX, NHWC.

Clean-room implementations of the reference's attention modules
(/root/reference/CODON_X4/base_net_withoutBN.py:22-173,954-1007 and
attention/ResCBAM.py, CAC_module.py). Parameters live in a FLAT dict keyed
by the reference's own torch parameter names (e.g. "non1.ChannelGate.mlp.1.weight")
with TPU layouts (conv HWIO, linear (in, out)) — which makes torch
state-dict interop a mechanical rank-based transpose
(checkpoint.torch_convert.generic_state_dict_to_flat).

Missing-module interpretations (these reference imports don't exist in the
release — base_net_withoutBN.py:13-18; semantics chosen per SURVEY.md §2
and mirrored exactly in the tests' torch shim so parity is still validated
against independent torch numerics):
  * attention.CBAM.CBAM(C)    -> ChannelGate(C, r=16) then SpatialGate(k=5),
                                 gated output, NO residual
  * wechat_2.CA(C)            -> full-width channel gate returning the SCALE
  * wechat_2.SA()             -> spatial gate returning the SCALE (k=5)

All global reductions route through the Ops backend (psum'd under spatial
sharding); PAM/CAM whole-image attention is single-shard only (documented).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from codon_tpu.core.ops import Ops


# ---------------------------------------------------------------------------
# flat-param helpers
# ---------------------------------------------------------------------------

def conv_p(p, name, t, ops: Ops, mask=None, groups=1):
    """Conv by flat torch name; adds `{name}.bias` when present."""
    out = ops.conv2d(t, p[f"{name}.weight"], mask=mask, groups=groups)
    b = p.get(f"{name}.bias")
    if b is not None:
        out = out + b.astype(out.dtype)
        if mask is not None:
            out = out * mask.astype(out.dtype)
    return out


def linear_p(p, name, v):
    w = p[f"{name}.weight"].astype(v.dtype)
    out = v @ w
    b = p.get(f"{name}.bias")
    return out if b is None else out + b.astype(v.dtype)


# ---------------------------------------------------------------------------
# gate primitives (CBAM / CAC family)
# ---------------------------------------------------------------------------

def channel_gate_scale(p, prefix, x, ops: Ops, mask=None,
                       pool_types: Sequence[str] = ("avg", "max")):
    """attention/ResCBAM.py ChannelGate pooled-MLP SCALE (full width).

    x: (N,H,W,C) or a tuple of tensors pooled per part and concatenated
    (used by CAC-style gates to avoid materializing channel concats).
    """
    def pools(kind):
        parts = x if isinstance(x, tuple) else (x,)
        if kind == "avg":
            vs = [ops.global_avg(t, mask)[:, 0, 0, :] for t in parts]
        else:
            vs = [ops.global_max(t, mask)[:, 0, 0, :] for t in parts]
        return jnp.concatenate(vs, -1) if len(vs) > 1 else vs[0]

    att = None
    for kind in pool_types:
        v = jax.nn.relu(linear_p(p, f"{prefix}.mlp.1", pools(kind)))
        v = linear_p(p, f"{prefix}.mlp.3", v)
        att = v if att is None else att + v
    return jax.nn.sigmoid(att)[:, None, None, :]


def spatial_gate_scale(p, prefix, x, ops: Ops, mask=None):
    """ChannelPool(max,mean) -> kxk conv(2->1) -> sigmoid SCALE."""
    parts = x if isinstance(x, tuple) else (x,)
    cmax = parts[0].max(-1, keepdims=True)
    cmean_sum = parts[0].sum(-1, keepdims=True)
    n = parts[0].shape[-1]
    for t in parts[1:]:
        cmax = jnp.maximum(cmax, t.max(-1, keepdims=True))
        cmean_sum = cmean_sum + t.sum(-1, keepdims=True)
        n += t.shape[-1]
    pooled = jnp.concatenate([cmax, cmean_sum / n], -1)
    return jax.nn.sigmoid(conv_p(p, f"{prefix}.spatial.conv", pooled, ops,
                                 mask))


def channel_gate(p, prefix, x, ops, mask=None, pool_types=("avg", "max")):
    """ResCBAM ChannelGate: returns x * scale."""
    return x * channel_gate_scale(p, prefix, x, ops, mask, pool_types)


def spatial_gate(p, prefix, x, ops, mask=None):
    """ResCBAM SpatialGate: returns x * scale."""
    return x * spatial_gate_scale(p, prefix, x, ops, mask)


def res_cbam(p, prefix, x, ops, mask=None, pool_types=("avg", "max")):
    """ResCBAM{,_c,_d}: ChannelGate -> SpatialGate -> + x."""
    out = channel_gate(p, f"{prefix}.ChannelGate", x, ops, mask, pool_types)
    out = spatial_gate(p, f"{prefix}.SpatialGate", out, ops, mask)
    return out + x


def cbam(p, prefix, x, ops, mask=None):
    """Interpreted attention.CBAM.CBAM: gated output, no residual."""
    out = channel_gate(p, f"{prefix}.ChannelGate", x, ops, mask)
    return spatial_gate(p, f"{prefix}.SpatialGate", out, ops, mask)


def ca_layer(p, prefix, x, ops, mask=None):
    """RCAN CALayer: avgpool -> 1x1 conv C/16 -> relu -> 1x1 -> sigmoid -> x*y."""
    y = ops.global_avg(x, mask)                     # (N,1,1,C)
    y = jax.nn.relu(conv_p(p, f"{prefix}.conv_du.0", y, ops))
    y = jax.nn.sigmoid(conv_p(p, f"{prefix}.conv_du.2", y, ops))
    return x * y


# ---------------------------------------------------------------------------
# non-local primitives
# ---------------------------------------------------------------------------

def pam(p, prefix, x, ops: Ops, mask=None):
    """Position attention (DANet): softmax(Q K^T) over pixels. NHWC.

    Whole-image attention — single-shard execution only.
    """
    n, h, w, c = x.shape
    q = conv_p(p, f"{prefix}.query_conv", x, ops, mask).reshape(n, h * w, -1)
    k = conv_p(p, f"{prefix}.key_conv", x, ops, mask).reshape(n, h * w, -1)
    v = conv_p(p, f"{prefix}.value_conv", x, ops, mask).reshape(n, h * w, c)
    energy = jnp.einsum("bic,bjc->bij", q, k)
    if mask is not None:
        # padded-batch exactness: invalid KEY pixels would contribute
        # logit 0 (exp = 1) to every softmax denominator, diluting the
        # valid attention weights relative to per-image execution
        kmask = mask.reshape(n, 1, h * w) > 0
        energy = jnp.where(kmask, energy,
                           jnp.asarray(-jnp.inf, energy.dtype))
    att = jax.nn.softmax(energy, axis=-1)
    out = jnp.einsum("bij,bjc->bic", att, v).reshape(n, h, w, c)
    gamma = p[f"{prefix}.gamma"].astype(x.dtype)
    # invalid QUERY pixels attend to valid v (nonzero out) — re-mask so
    # downstream conv stencils read zeros there, as per-image SAME
    # padding would provide
    return gamma * ops.apply_mask(out, mask) + x


def cam(p, prefix, x, ops: Ops = None, mask=None):
    """Channel attention via C x C gram with max-subtracted softmax. NHWC."""
    n, h, w, c = x.shape
    xf = x.reshape(n, h * w, c)
    energy = jnp.einsum("bpi,bpj->bij", xf, xf)          # (N, C, C)
    energy_new = jnp.max(energy, -1, keepdims=True) - energy
    att = jax.nn.softmax(energy_new, axis=-1)
    out = jnp.einsum("bij,bpj->bpi", att, xf).reshape(n, h, w, c)
    gamma = p[f"{prefix}.gamma"].astype(x.dtype)
    return gamma * out + x


def sepnon(p, prefix, x, ops: Ops, mask=None):
    """SEPNON (base_net_withoutBN.py:65-96): PAM+CAM heads summed.

    conv6/conv7 are dead params in the reference forward — kept for
    checkpoint compat. Dropout2d(0.1) is inference-off (eval mode).
    """
    feat1 = jax.nn.relu(conv_p(p, f"{prefix}.conv5a.0", x, ops, mask))
    sa = pam(p, f"{prefix}.sa", feat1, ops, mask)
    sa = jax.nn.relu(conv_p(p, f"{prefix}.conv51.0", sa, ops, mask))
    feat2 = jax.nn.relu(conv_p(p, f"{prefix}.conv5c.0", x, ops, mask))
    sc = cam(p, f"{prefix}.sc", feat2, ops, mask)
    sc = jax.nn.relu(conv_p(p, f"{prefix}.conv52.0", sc, ops, mask))
    return conv_p(p, f"{prefix}.conv8.1", sa + sc, ops, mask)


def spatial_cgnl(p, prefix, x, ops: Ops, mask=None, groups: int = 8,
                 use_scale: bool = False):
    """Compact generalized non-local (base_net_withoutBN.py:97-156). NHWC.

    Per group: out = (sum over pixels&channels of p*g) * t — a scalar per
    (batch, group). The global dot, the use_scale pixel count, and the
    GroupNorm statistics all ride ops.global_sum/global_avg — psum'd
    under spatial sharding, per-image-exact on masked padded batches.
    """
    n, h, w, c = x.shape
    t = conv_p(p, f"{prefix}.t", x, ops, mask)
    pp = conv_p(p, f"{prefix}.p", x, ops, mask)
    g = conv_p(p, f"{prefix}.g", x, ops, mask)
    cg = t.shape[-1] // groups

    # group dot: GLOBAL masked sum over (H, W) per channel (psum'd under
    # spatial sharding), then summed over the group's channels
    s = ops.global_sum(pp * g, mask)[:, 0, 0, :]     # (N, planes)
    s = s.reshape(n, groups, cg).sum(-1)             # (N, groups)
    if use_scale:
        # per-image pixel count: the masked count equals the unpadded
        # image's h*w; under sharding the sum rides psum like the dot
        ones = mask if mask is not None else jnp.ones((n, h, w, 1),
                                                      s.dtype)
        cnt = ops.global_sum(ones.astype(s.dtype))[:, 0, 0, :]  # (N, 1)
        s = s / jnp.sqrt(jnp.asarray(float(cg), s.dtype) * cnt)
    scale = jnp.repeat(s, cg, axis=1)[:, None, None, :]  # (N,1,1,planes)
    xk = t * scale.astype(t.dtype)

    xk = conv_p(p, f"{prefix}.z", xk, ops, mask, groups=groups)
    # GroupNorm over (H, W, Cg) per group: global masked stats via the
    # Ops pools (psum'd under sharding) — per-channel first, then
    # averaged over each group's channels (every channel of a group
    # shares the same valid-pixel count, so the two-level mean is exact)
    cgz = c // groups
    mean_c = ops.global_avg(xk, mask)                       # (N,1,1,C)
    gmean = mean_c.reshape(n, 1, 1, groups, cgz).mean(-1, keepdims=True)
    mean_b = jnp.broadcast_to(gmean, (n, 1, 1, groups, cgz)
                              ).reshape(n, 1, 1, c)
    var_c = ops.global_avg((xk - mean_b) ** 2, mask)        # (N,1,1,C)
    gvar = var_c.reshape(n, 1, 1, groups, cgz).mean(-1, keepdims=True)
    xg = xk.reshape(n, h, w, groups, cgz)
    xg = (xg - gmean) / jnp.sqrt(gvar + 1e-5)
    xk = xg.reshape(n, h, w, c)
    gam = p[f"{prefix}.gn.weight"].astype(xk.dtype)
    bet = p[f"{prefix}.gn.bias"].astype(xk.dtype)
    # re-mask the normalized+affine tensor: invalid pixels would otherwise
    # carry (0-mean)/std*gam+bet != 0 into downstream conv stencils
    return ops.apply_mask(xk * gam + bet, mask) + x


def nonlocal_bn(p, prefix, x, ops: Ops, mask=None, use_scale: bool = True):
    """NonLocalBlock2D_BN: whole-tensor scalar attention + eval-mode BN.

    The scalar dot and the pixel count ride ops.global_sum, so the block
    is exact under spatial sharding (psum) and on masked padded batches
    (per-image count; the eval-mode BN affine is re-masked because it
    maps the padding's zeros to (0-rm)/std*wt+bs != 0)."""
    n, h, w, c = x.shape
    t = conv_p(p, f"{prefix}.t", x, ops, mask)
    pp = conv_p(p, f"{prefix}.p", x, ops, mask)
    g = conv_p(p, f"{prefix}.g", x, ops, mask)
    cp = t.shape[-1]
    att = jnp.sum(ops.global_sum(pp * g, mask), axis=-1, keepdims=True)
    if use_scale:
        ones = mask if mask is not None else jnp.ones((n, h, w, 1),
                                                      att.dtype)
        cnt = ops.global_sum(ones.astype(att.dtype))     # (N,1,1,1)
        att = att / jnp.sqrt(jnp.asarray(float(cp), att.dtype) * cnt)
    xk = conv_p(p, f"{prefix}.z", att.astype(t.dtype) * t, ops, mask)
    # BatchNorm2d, eval mode (running stats)
    rm = p[f"{prefix}.bn4.running_mean"].astype(xk.dtype)
    rv = p[f"{prefix}.bn4.running_var"].astype(xk.dtype)
    wt = p[f"{prefix}.bn4.weight"].astype(xk.dtype)
    bs = p[f"{prefix}.bn4.bias"].astype(xk.dtype)
    xk = ops.apply_mask((xk - rm) / jnp.sqrt(rv + 1e-5) * wt + bs, mask)
    return xk + x
