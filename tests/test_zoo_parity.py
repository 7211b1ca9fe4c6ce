"""Ablation-zoo parity vs the reference oracle.

base_net_withoutBN.py cannot import as shipped (it imports attention.CBAM,
wechat_guide, attention.wechat_2 which are missing from the release —
base_net_withoutBN.py:13-18). tests/torch_shim provides those three modules
per the SURVEY.md interpretation — built ON the reference's own gate code
where it exists — and Python namespace-package merging supplies the real
attention.ResCBAM from the reference tree. Every zoo variant then runs
against the genuine reference class, weights copied via the generic
rank-based converter.
"""
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

# torch 2.x compat for the oracle: SpatialCGNL.kernel calls .view on
# non-contiguous torch.split views (base_net_withoutBN.py:110-124);
# .contiguous() is numerics-identical.
_orig_cgnl_kernel = base_net.SpatialCGNL.kernel


def _cgnl_kernel_compat(self, t, p, g, b, c, h, w):
    return _orig_cgnl_kernel(self, t.contiguous(), p.contiguous(),
                             g.contiguous(), b, c, h, w)


base_net.SpatialCGNL.kernel = _cgnl_kernel_compat

from codon_tpu.models.zoo import zoo_forward, zoo_init, list_zoo  # noqa: E402
from codon_tpu.checkpoint.torch_convert import (  # noqa: E402
    generic_state_dict_to_flat)

H, W = 16, 13

NAME_MAP = {
    "basenet": "BaseNet",
    "basenet_non_corr": "BaseNet_non_corr",
    "basenet_non": "BaseNet_non",
    "basenet_non2": "BaseNet_non2",
    "basenet_non3": "BaseNet_non3",
    "basenet_non_cat": "BaseNet_non_cat",
    "basenet_nlar": "BaseNet_NLAR",
    "basenet_only_fuse_attention": "BaseNet_only_fuse_attention",
    "basenet_cross": "BaseNet_Cross",
    "basenet_only_cross_attention": "BaseNet_only_cross_attention",
    "basenet_only_cross_attention_advise1_nores":
        "BaseNet_only_cross_attention_advise1_nores",
    "basenet_only_cross_attention_advise1":
        "BaseNet_only_cross_attention_advise1",
    "rmcr": "BaseNet_RMCR",
    "rmcr_nlar": "BaseNet_RMCR_NLAR",
    "rmcr_fuse_rmcr": "BaseNet_RMCR_fuseRMCR",
    "rmcr_fuse_rmcr_2": "BaseNet_RMCR_fuseRMCR_2",
    "rmcr_fuse_rmcr_cross_advise2": "BaseNet_RMCR_fuseRMCR_cross_advise2",
    "rmcr_fuse_rmcr_cross": "BaseNet_RMCR_fuseRMCR_cross",
    "rmcr_fuse_rmcr_cross_only_corss_advise1":
        "BaseNet_RMCR_fuseRMCR_cross_only_corss_advise1",
    "rmcr_fuse_rmcr_cross_only_corss_advise1_parall":
        "BaseNet_RMCR_fuseRMCR_cross_only_corss_advise1_parall",
    "rmcr_fuse_rmcr_cross_only_corss_advise1_onlys":
        "BaseNet_RMCR_fuseRMCR_cross_only_corss_advise1_onlys",
    "rmcr_fuse_rmcr_cross_only_corss_advise1_onlyc":
        "BaseNet_RMCR_fuseRMCR_cross_only_corss_advise1_onlyc",
    "rmcr_fuse_rmcr_eccv": "BaseNet_RMCR_fuseRMCR_ECCV",
    "rmcr_fuse_rmcr_rcan": "BaseNet_RMCR_fuseRMCR_RCAN",
    "rmcr_fuse_rmcr_cross_only_corss":
        "BaseNet_RMCR_fuseRMCR_cross_only_corss",
    "rmcr_fuse_rmcr_cross2": "BaseNet_RMCR_fuseRMCR_cross2",
    "rmcr_fuse_rmcr_cross3": "BaseNet_RMCR_fuseRMCR_cross3",
}


def test_name_map_covers_zoo():
    assert set(NAME_MAP) == set(list_zoo())


@pytest.mark.parametrize("name", sorted(NAME_MAP))
def test_zoo_variant_parity(name):
    torch.manual_seed(0)
    net = getattr(base_net, NAME_MAP[name])().eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = generic_state_dict_to_flat(sd)

    # key-set match against our own init (shape compat incl. dead params)
    import jax
    ours = zoo_init(name, jax.random.PRNGKey(0))
    assert set(ours) == set(params), (
        set(ours) ^ set(params))
    for k in ours:
        assert ours[k].shape == params[k].shape, (k, ours[k].shape,
                                                  params[k].shape)

    rng = np.random.RandomState(42)
    d = rng.rand(1, H, W, 1).astype(np.float32)
    c = rng.rand(1, H, W, 1).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(d.transpose(0, 3, 1, 2)),
                  torch.from_numpy(c.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    out = np.asarray(zoo_forward(name, params, d, c))
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)
