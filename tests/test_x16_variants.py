"""Parity for the CODON_X16 model-dir flavors against their own oracles:
CODONet (swapped color concat) and the X16 CODONNet without dead heads."""
import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from codon_tpu.checkpoint.torch_convert import (  # noqa: E402
    torch_state_dict_to_params)
from codon_tpu.models.variants import get_variant  # noqa: E402

H, W = 21, 18


def _load_x16_module(fname, modname):
    """Load a CODON_X16 model file with its CAC_module dependency."""
    spec = importlib.util.spec_from_file_location(
        "_x16_cac", "/root/reference/CODON_X16/CAC_module.py")
    cac = importlib.util.module_from_spec(spec)
    sys.modules["CAC_module"] = cac          # satisfies `from CAC_module ...`
    spec.loader.exec_module(cac)
    spec2 = importlib.util.spec_from_file_location(
        modname, f"/root/reference/CODON_X16/{fname}")
    mod = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(mod)
    return mod


def _parity(net, variant_name):
    v = get_variant(variant_name)
    sd = {k: t.detach().numpy() for k, t in net.state_dict().items()}
    params = torch_state_dict_to_params(sd, v.cfg)
    rng = np.random.RandomState(5)
    d = rng.rand(1, H, W, 1).astype(np.float32)
    c = rng.rand(1, H, W, 1).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(d.transpose(0, 3, 1, 2)),
                  torch.from_numpy(c.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    out = np.asarray(v.forward(params, d, c))
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-3)


def test_x16_codonnet_no_dead_heads():
    mod = _load_x16_module("CODON_x16.py", "_x16_main")
    torch.manual_seed(0)
    net = mod.CODONNet().eval()
    assert sum(p.numel() for p in net.parameters()) == 1_865_506
    _parity(net, "codon_x16")


def test_x16_model_dir_swapped_concat():
    mod = _load_x16_module("model/CODONet.py", "_x16_model")
    torch.manual_seed(1)
    net = mod.CODONet().eval()
    _parity(net, "codonet_x16_model")


def test_x16_model_rmcr_fuse_rmcr():
    mod = _load_x16_module("model/model_rmcr_fuse_rmcr.py", "_x16_rmcr")
    torch.manual_seed(2)
    net = mod.BaseNet_RMCR_fuseRMCR().eval()
    v = get_variant("rmcr_fuse_rmcr")
    sd = {k: t.detach().numpy() for k, t in net.state_dict().items()}
    params = torch_state_dict_to_params(sd, v.cfg)
    rng = np.random.RandomState(6)
    d = rng.rand(1, H, W, 1).astype(np.float32)
    c = rng.rand(1, H, W, 1).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(d.transpose(0, 3, 1, 2)),
                  torch.from_numpy(c.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    out = np.asarray(v.forward(params, d, c))
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-3)


def test_codon_f5_checkpoint_compatible():
    """codon_f5 (5 fusion MC iterations) shares the exact param pytree
    with 'codon' — the fusion loop reuses one weight set
    (CODON_x4.py:122-128) — so checkpoints interchange, while the
    forward genuinely differs (more refinement steps)."""
    import jax
    a, b = get_variant("codon"), get_variant("codon_f5")
    pa = a.init(jax.random.PRNGKey(0))
    pb = b.init(jax.random.PRNGKey(0))
    assert jax.tree.structure(pa) == jax.tree.structure(pb)
    assert all(x.shape == y.shape for x, y in
               zip(jax.tree.leaves(pa), jax.tree.leaves(pb)))
    rng = np.random.RandomState(3)
    d = rng.rand(1, 16, 13, 1).astype(np.float32)
    c = rng.rand(1, 16, 13, 1).astype(np.float32)
    oa = np.asarray(a.forward(pa, d, c))
    ob = np.asarray(b.forward(pa, d, c))
    assert np.abs(oa - ob).max() > 1e-6


def test_codon_fn_family_checkpoint_compatible():
    """The whole codon_f{4,6,7} family shares codon's param pytree and
    each fusion count produces a genuinely different forward — the
    eval-time compute knob behind the fusion-count sweep."""
    import jax
    base = get_variant("codon")
    params = base.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    d = rng.rand(1, 16, 13, 1).astype(np.float32)
    c = rng.rand(1, 16, 13, 1).astype(np.float32)
    outs = [np.asarray(base.forward(params, d, c))]
    for n in (4, 6, 7):
        v = get_variant(f"codon_f{n}")
        pv = v.init(jax.random.PRNGKey(0))
        assert jax.tree.structure(params) == jax.tree.structure(pv)
        outs.append(np.asarray(v.forward(params, d, c)))
    for i in range(len(outs)):
        for j in range(i + 1, len(outs)):
            assert np.abs(outs[i] - outs[j]).max() > 1e-6, (i, j)
