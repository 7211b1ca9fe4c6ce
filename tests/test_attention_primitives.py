"""Primitive-level parity for attention modules not reachable via any zoo
variant forward (PAM/CAM are dead modules in non2/non3; SEPNON and
NonLocalBlock2D_BN are defined but never instantiated by a net)."""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

SHIM = os.path.join(os.path.dirname(os.path.abspath(__file__)), "torch_shim")
REF_X4 = "/root/reference/CODON_X4"
for path in (SHIM, REF_X4):
    if path not in sys.path:
        sys.path.insert(0, path)

base_net = pytest.importorskip("base_net_withoutBN")

# torch 2.x compat (same .view-on-non-contiguous as SpatialCGNL)
_orig_nl_kernel = base_net.NonLocalBlock2D_BN.kernel


def _nl_kernel_compat(self, t, p, g, b, c, h, w):
    return _orig_nl_kernel(self, t.contiguous(), p.contiguous(),
                           g.contiguous(), b, c, h, w)


base_net.NonLocalBlock2D_BN.kernel = _nl_kernel_compat

from codon_tpu.checkpoint.torch_convert import (  # noqa: E402
    generic_state_dict_to_flat)
from codon_tpu.core.ops import XlaOps  # noqa: E402
from codon_tpu.models import attention as A  # noqa: E402

OPS = XlaOps()
N, H, W, C = 2, 9, 7, 64


def _run(module, x_nhwc):
    module = module.eval()
    with torch.no_grad():
        ref = module(torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2)))
    return ({f"m.{k}": v.detach().numpy() for k, v in
             module.state_dict().items()},
            ref.numpy().transpose(0, 2, 3, 1))


def _x(c=C, seed=0):
    return np.random.RandomState(seed).randn(N, H, W, c).astype(np.float32)


def test_pam():
    torch.manual_seed(0)
    x = _x(16)
    sd, ref = _run(base_net.PAM_Module(16), x)
    p = generic_state_dict_to_flat(sd)
    out = np.asarray(A.pam(p, "m", x, OPS))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_cam():
    torch.manual_seed(1)
    x = _x(16, 1)
    m = base_net.CAM_Module(16)
    with torch.no_grad():
        m.gamma.fill_(0.5)  # gamma=0 would hide the attention term
    sd, ref = _run(m, x)
    p = generic_state_dict_to_flat(sd)
    out = np.asarray(A.cam(p, "m", x))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_sepnon():
    torch.manual_seed(2)
    x = _x(C, 2)
    m = base_net.SEPNON(C, C)
    with torch.no_grad():
        m.sa.gamma.fill_(0.3)
        m.sc.gamma.fill_(0.7)
    sd, ref = _run(m, x)
    p = generic_state_dict_to_flat(sd)
    out = np.asarray(A.sepnon(p, "m", x, OPS))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_nonlocal_bn():
    torch.manual_seed(3)
    x = _x(C, 3)
    m = base_net.NonLocalBlock2D_BN(C, 32)
    with torch.no_grad():  # non-trivial z + BN stats
        torch.nn.init.normal_(m.z.weight, 0, 0.1)
        m.bn4.running_mean.normal_(0, 0.1)
        m.bn4.running_var.uniform_(0.5, 1.5)
    sd, ref = _run(m, x)
    p = generic_state_dict_to_flat(sd)
    out = np.asarray(A.nonlocal_bn(p, "m", x, OPS))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# masked padded-batch exactness + sharded exactness (all convs here are 1x1,
# so zero padding + mask must reproduce per-image execution EXACTLY, and the
# global reductions must psum under spatial sharding — core/ops.py contract)
# ---------------------------------------------------------------------------

def _rand_flat(module, seed, scale=0.2):
    """Random full-magnitude params for a torch module, as flat HWIO dict."""
    rng = np.random.RandomState(seed)
    sd = {}
    for k, v in module.state_dict().items():
        if not v.dtype.is_floating_point:       # e.g. num_batches_tracked
            sd[f"m.{k}"] = v
            continue
        a = (rng.standard_normal(tuple(v.shape)) * scale).astype(np.float32)
        if k.endswith("running_var"):
            a = np.abs(a) + 0.5
        sd[f"m.{k}"] = torch.from_numpy(a)
    return generic_state_dict_to_flat(sd)


def _cgnl_params(seed=11):
    return _rand_flat(base_net.SpatialCGNL(16, 8, use_scale=False, groups=4),
                      seed)


def _nl_params(seed=12):
    return _rand_flat(base_net.NonLocalBlock2D_BN(16, 8), seed)


_PRIMS = {
    "pam": lambda p, x, ops, m: A.pam(p, "m", x, ops, m),
    "cgnl": lambda p, x, ops, m: A.spatial_cgnl(p, "m", x, ops, m,
                                                groups=4, use_scale=True),
    "nonlocal": lambda p, x, ops, m: A.nonlocal_bn(p, "m", x, ops, m),
}


def _prim_params(name):
    if name == "pam":
        return _rand_flat(base_net.PAM_Module(16), 10)
    return _cgnl_params() if name == "cgnl" else _nl_params()


@pytest.mark.parametrize("name", sorted(_PRIMS))
def test_primitive_masked_padding_exact(name):
    """Padded batch + mask == per-image execution on the valid region, and
    exact zeros on the padding (so downstream conv stencils see what SAME
    padding of the unpadded image would provide)."""
    p = _prim_params(name)
    x1 = _x(16, 7)[0:1]                                  # (1, H, W, 16)
    ref = np.asarray(_PRIMS[name](p, x1, OPS, None))
    xp = np.zeros((1, H + 3, W + 2, 16), np.float32)
    xp[:, :H, :W] = x1
    m = np.zeros((1, H + 3, W + 2, 1), np.float32)
    m[:, :H, :W] = 1.0
    out = np.asarray(_PRIMS[name](p, xp, OPS, m))
    np.testing.assert_allclose(out[:, :H, :W], ref, atol=2e-5, rtol=1e-4)
    assert np.all(out[:, H:] == 0.0) and np.all(out[:, :, W:] == 0.0)


@pytest.mark.parametrize("name", ["cgnl", "nonlocal"])
def test_primitive_sharded_matches_single(name):
    """spatial_cgnl / nonlocal_bn inside shard_map (H sharded over 4
    devices) match single-device execution: the scalar dots, pixel counts,
    and GroupNorm statistics all ride psum'd Ops reductions."""
    import jax
    from jax.sharding import PartitionSpec as P

    from codon_tpu.parallel.mesh import make_mesh
    from codon_tpu.parallel.ops import ShardedOps
    from codon_tpu.parallel.tiling import shard_map

    p = _prim_params(name)
    x = _x(16, 8)[:, :8]                                  # (N, 8, W, 16)
    m = np.ones((x.shape[0], 8, W, 1), np.float32)
    m[1:, -3:] = 0.0                                      # ragged batch
    ref = np.asarray(_PRIMS[name](p, x, OPS, m))

    mesh = make_mesh([1, 4])
    sops = ShardedOps("sp")
    spec = P(None, "sp", None, None)
    fn = shard_map(lambda pp, xx, mm: _PRIMS[name](pp, xx, sops, mm),
                   mesh=mesh, in_specs=(P(), spec, spec), out_specs=spec,
                   check_vma=False)
    out = np.asarray(jax.jit(fn)(p, x, m))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
