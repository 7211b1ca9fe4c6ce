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
