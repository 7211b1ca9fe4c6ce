"""Numerical parity of the JAX CODONNet vs the reference PyTorch oracle.

The oracle is imported directly from /root/reference (never copied). Weights
are copied torch -> pytree via the checkpoint converter, so this test also
exercises the name map in the torch->jax direction.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from conftest import reference_available  # noqa: E402
from oracle import load_reference_codonnet  # noqa: E402

from codon_tpu.models.codon_net import (  # noqa: E402
    CodonConfig, codon_forward, init_codon_params)
from codon_tpu.checkpoint.torch_convert import (  # noqa: E402
    torch_state_dict_to_params, params_to_torch_state_dict)
from codon_tpu.core.params import param_count  # noqa: E402

H, W = 33, 29  # small odd sizes: exercises SAME padding off the happy path


@pytest.fixture(scope="module")
def oracle_and_params():
    cls = load_reference_codonnet()
    torch.manual_seed(0)
    net = cls().eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    cfg = CodonConfig(dead_heads=True)
    params = torch_state_dict_to_params(sd, cfg)
    return net, params, cfg


def test_param_count_matches_reference(oracle_and_params):
    net, params, _ = oracle_and_params
    ref_n = sum(p.numel() for p in net.parameters())
    assert ref_n == 1_866_136  # SURVEY.md §2.3
    assert param_count(params) == ref_n


def test_forward_parity_fp32(oracle_and_params):
    net, params, cfg = oracle_and_params
    rng = np.random.RandomState(42)
    depth = rng.rand(1, H, W, 1).astype(np.float32)
    color = rng.rand(1, H, W, 1).astype(np.float32)

    with torch.no_grad():
        ref = net(torch.from_numpy(depth.transpose(0, 3, 1, 2)),
                  torch.from_numpy(color.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    out = np.asarray(codon_forward(params, depth, color, cfg=cfg))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


def test_packed_cells_match_split(oracle_and_params):
    """cell_impl='packed' (merged 3x3||5x5 full-lane convs) is numerically
    the same function as the reference-shaped 'split' lowering."""
    import dataclasses
    _, params, cfg = oracle_and_params
    rng = np.random.RandomState(11)
    depth = rng.rand(2, H, W, 1).astype(np.float32)
    color = rng.rand(2, H, W, 1).astype(np.float32)
    packed = np.asarray(codon_forward(
        params, depth, color, cfg=dataclasses.replace(cfg,
                                                      cell_impl="packed")))
    split = np.asarray(codon_forward(
        params, depth, color, cfg=dataclasses.replace(cfg,
                                                      cell_impl="split")))
    # fp32 accumulation-order noise only (one K=1600 contraction vs two
    # smaller ones); the zero-embedded taps contribute exact zeros
    np.testing.assert_allclose(packed, split, atol=2e-4, rtol=1e-3)


def test_forward_parity_batched(oracle_and_params):
    net, params, cfg = oracle_and_params
    rng = np.random.RandomState(7)
    depth = rng.rand(2, H, W, 1).astype(np.float32)
    color = rng.rand(2, H, W, 1).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(depth.transpose(0, 3, 1, 2)),
                  torch.from_numpy(color.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    out = np.asarray(codon_forward(params, depth, color, cfg=cfg))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


def test_masked_padded_batch_equals_per_image(oracle_and_params):
    """Two different-size images padded into one batch + mask must equal
    per-image unpadded execution exactly (the reference runs batch=1)."""
    _, params, cfg = oracle_and_params
    rng = np.random.RandomState(3)
    sizes = [(H, W), (21, 17)]
    HP, WP = H, W
    depth = np.zeros((2, HP, WP, 1), np.float32)
    color = np.zeros((2, HP, WP, 1), np.float32)
    mask = np.zeros((2, HP, WP, 1), np.float32)
    singles = []
    for i, (h, w) in enumerate(sizes):
        d = rng.rand(1, h, w, 1).astype(np.float32)
        c = rng.rand(1, h, w, 1).astype(np.float32)
        depth[i, :h, :w] = d[0]
        color[i, :h, :w] = c[0]
        mask[i, :h, :w] = 1.0
        singles.append(np.asarray(codon_forward(params, d, c, cfg=cfg)))

    out = np.asarray(codon_forward(params, depth, color, cfg=cfg, mask=mask))
    for i, (h, w) in enumerate(sizes):
        np.testing.assert_allclose(out[i, :h, :w], singles[i][0],
                                   atol=2e-4, rtol=1e-3)


def test_state_dict_round_trip(oracle_and_params):
    net, params, cfg = oracle_and_params
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    back = params_to_torch_state_dict(params, cfg)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k])


def test_init_shapes_match_reference(oracle_and_params):
    import jax
    net, ref_params, cfg = oracle_and_params
    ours = init_codon_params(jax.random.PRNGKey(0), cfg)
    ref_flat = {"/".join(map(str, p)): v.shape
                for p, v in jax.tree_util.tree_flatten_with_path(ref_params)[0]}
    our_flat = {"/".join(map(str, p)): v.shape
                for p, v in jax.tree_util.tree_flatten_with_path(ours)[0]}
    assert ref_flat == our_flat


def test_fused_forward_matches_regular(oracle_and_params):
    """Merged-tower grouped-conv forward == reference-layout forward."""
    from codon_tpu.models.codon_net import codon_forward_fused
    _, params, cfg = oracle_and_params
    rng = np.random.RandomState(11)
    depth = rng.rand(2, H, W, 1).astype(np.float32)
    color = rng.rand(2, H, W, 1).astype(np.float32)
    a = np.asarray(codon_forward(params, depth, color, cfg=cfg))
    b = np.asarray(codon_forward_fused(params, depth, color, cfg=cfg))
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-3)


def test_fused_forward_masked(oracle_and_params):
    from codon_tpu.models.codon_net import codon_forward_fused
    _, params, cfg = oracle_and_params
    rng = np.random.RandomState(12)
    depth = rng.rand(1, H, W, 1).astype(np.float32)
    color = rng.rand(1, H, W, 1).astype(np.float32)
    mask = np.zeros((1, H, W, 1), np.float32)
    mask[:, :21, :17] = 1.0
    a = np.asarray(codon_forward(params, depth * mask, color * mask,
                                 cfg=cfg, mask=mask))
    b = np.asarray(codon_forward_fused(params, depth * mask, color * mask,
                                       cfg=cfg, mask=mask))
    np.testing.assert_allclose(a[:, :21, :17], b[:, :21, :17],
                               atol=2e-4, rtol=1e-3)


def test_scan_loop_matches_unroll(oracle_and_params):
    """lax.scan loop lowering (fast compiles) == unrolled lowering."""
    import dataclasses as dc
    _, params, cfg = oracle_and_params
    rng = np.random.RandomState(21)
    depth = rng.rand(1, H, W, 1).astype(np.float32)
    color = rng.rand(1, H, W, 1).astype(np.float32)
    a = np.asarray(codon_forward(params, depth, color, cfg=cfg))
    cfg_s = dc.replace(cfg, loop_impl="scan")
    b = np.asarray(codon_forward(params, depth, color, cfg=cfg_s))
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_stencil_spatial_gate_matches_conv(oracle_and_params):
    import dataclasses as dc
    _, params, cfg = oracle_and_params
    rng = np.random.RandomState(23)
    depth = rng.rand(1, H, W, 1).astype(np.float32)
    color = rng.rand(1, H, W, 1).astype(np.float32)
    a = np.asarray(codon_forward(params, depth, color, cfg=cfg))
    cfg_s = dc.replace(cfg, cac_impl="xla_stencil")
    b = np.asarray(codon_forward(params, depth, color, cfg=cfg_s))
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)
