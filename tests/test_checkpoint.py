"""Checkpoint subsystem: synthetic .pth round-trips + native npz.

The release's real .pth blobs are absent from the mount
(.MISSING_LARGE_BLOBS); the converter is validated against synthetic
checkpoints shaped exactly like the reference's — a dict
{"epoch": int, "model": <pickled full nn.Module>} (CODON_X4/test.py:56-59),
including the DataParallel `module.` prefix flavor (CODON_X16/test.py:52).
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from oracle import load_reference_codonnet  # noqa: E402

from codon_tpu.checkpoint import (load_npz, load_pth, save_npz,  # noqa: E402
                                  torch_state_dict_to_params)
from codon_tpu.models.codon_net import CodonConfig, codon_forward  # noqa


@pytest.fixture(scope="module")
def ref_net():
    torch.manual_seed(7)
    return load_reference_codonnet()().eval()


def _forward_both(params, cfg):
    rng = np.random.RandomState(0)
    d = rng.rand(1, 17, 19, 1).astype(np.float32)
    c = rng.rand(1, 17, 19, 1).astype(np.float32)
    return np.asarray(codon_forward(params, d, c, cfg=cfg))


def test_pth_full_module_pickle(tmp_path, ref_net):
    path = str(tmp_path / "X4.pth")
    torch.save({"epoch": 94, "model": ref_net}, path)
    cfg = CodonConfig(dead_heads=True)
    params, epoch = load_pth(path, cfg)
    assert epoch == 94
    direct = torch_state_dict_to_params(
        {k: v.detach().numpy() for k, v in ref_net.state_dict().items()},
        cfg)
    import jax
    fa, fb = jax.tree.leaves(params), jax.tree.leaves(direct)
    assert len(fa) == len(fb)  # zip would pass vacuously on dropped leaves
    for a, b in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pth_dataparallel_prefix(tmp_path, ref_net):
    # emulate the module. prefix via the state dict (CODON_X16/test.py:52)
    sd = {f"module.{k}": v for k, v in ref_net.state_dict().items()}
    path = str(tmp_path / "X16.pth")
    torch.save(sd, path)
    cfg = CodonConfig(dead_heads=True)
    params, epoch = load_pth(path, cfg)
    assert epoch == -1
    # prefix stripping must map every tensor to the same parameter the
    # unprefixed converter produces (values, not just key presence)
    direct = torch_state_dict_to_params(
        {k: v.detach().numpy() for k, v in ref_net.state_dict().items()},
        cfg)
    import jax
    fa, fb = jax.tree.leaves(params), jax.tree.leaves(direct)
    assert len(fa) == len(fb)
    for a, b in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_npz_round_trip(tmp_path, ref_net):
    cfg = CodonConfig(dead_heads=True)
    params = torch_state_dict_to_params(
        {k: v.detach().numpy() for k, v in ref_net.state_dict().items()},
        cfg)
    path = str(tmp_path / "x4.npz")
    save_npz(path, params)
    loaded = load_npz(path)
    import jax
    flat_a = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_b = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]))
    # and it actually runs
    out = _forward_both(loaded, cfg)
    assert out.shape == (1, 17, 19, 1)
