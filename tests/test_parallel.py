"""Multi-device semantics on the 8-device virtual CPU mesh.

The key invariant (SURVEY.md §7 'hard parts'): spatially-tiled execution —
halo-exchange convs + psum/pmax'd CAC pooling — must match single-device
execution to float tolerance, including when the padded region is masked.
"""
import numpy as np
import pytest
import jax

from codon_tpu.models.variants import get_variant
from codon_tpu.parallel.mesh import make_mesh
from codon_tpu.parallel.tiling import tiled_infer, make_sharded_forward


@pytest.fixture(scope="module")
def setup():
    v = get_variant("codon")
    params = v.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    depth = rng.rand(2, 48, 37, 1).astype(np.float32)
    color = rng.rand(2, 48, 37, 1).astype(np.float32)
    ref = np.asarray(v.forward(params, depth, color))
    return v, params, depth, color, ref


def test_devices_available():
    assert len(jax.devices()) == 8, jax.devices()


@pytest.mark.parametrize("n_sp", [2, 4, 8])
def test_tiled_matches_untiled(setup, n_sp):
    v, params, depth, color, ref = setup
    out = tiled_infer(v, params, depth, color, n_devices=n_sp)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_tiled_with_ragged_height(setup):
    """H=45 NOT divisible by sp=8: tiled_infer must pad H to 48 (zero rows
    + zero mask), shard, and crop back — exercising the ragged path for
    real (H=48 would make _pad_to a no-op)."""
    v, params, depth, color, _ = setup
    depth, color = depth[:, :45], color[:, :45]
    ref = np.asarray(v.forward(params, depth, color))
    mesh = make_mesh([1, 8])
    out = tiled_infer(v, params, depth, color, mesh=mesh)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_dp_times_sp_mesh(setup):
    """2-way batch DP x 4-way spatial tiling on one mesh."""
    v, params, depth, color, ref = setup
    mesh = make_mesh([2, 4])
    fwd = make_sharded_forward(v, mesh)
    mask = np.ones_like(depth)
    out = np.asarray(fwd(params, depth, color, mask))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_dp_only_eval(setup):
    """Pure batch-DP inference (the user-facing DataParallel analog,
    /root/reference/CODON_X16/test.py:52) via the CLI hook."""
    from codon_tpu.parallel.tiling import make_tiled_forward
    v, params, depth, color, ref = setup
    fwd = make_tiled_forward(v, 1, 2)
    out = np.asarray(fwd(params, depth, color, None))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_dp_sp_composed_with_batch_padding(setup):
    """dp=4 with B=2 exercises the batch-padding path (pad images carry
    mask=1 so CAC pooling stays well-defined), composed with sp=2."""
    from codon_tpu.parallel.tiling import make_tiled_forward
    v, params, depth, color, ref = setup
    fwd = make_tiled_forward(v, 2, 4)
    out = np.asarray(fwd(params, depth, color, None))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_tiled_masked_mixed_sizes(setup):
    """Padded mixed-size batch + tiling: both exactness mechanisms at once."""
    v, params, depth, color, _ = setup
    mask = np.zeros_like(depth)
    mask[0, :48, :37] = 1.0
    mask[1, :31, :23] = 1.0
    d = depth * mask
    c = color * mask
    ref0 = np.asarray(v.forward(params, d[:1], c[:1]))
    ref1 = np.asarray(v.forward(params, d[1:, :31, :23], c[1:, :31, :23]))
    out = tiled_infer(v, params, d, c, mask=mask, n_devices=4)
    np.testing.assert_allclose(out[0], ref0[0], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(out[1, :31, :23], ref1[0], atol=2e-4,
                               rtol=1e-3)


def test_tile_stitch_close_to_whole_frame():
    """Host-side tile+stitch: conv stencils exact (halo > receptive field);
    divergence comes only from per-tile CAC channel stats — small."""
    from codon_tpu.parallel.stitch import tile_stitch_infer
    v = get_variant("codon")
    params = v.init(jax.random.PRNGKey(2))
    rng = np.random.RandomState(7)
    # smooth-ish content: global vs per-tile pooled stats stay close
    base = rng.rand(1, 1, 6, 1).astype(np.float32)
    depth = np.kron(base, np.ones((1, 160, 16, 1), np.float32))
    depth += 0.05 * rng.rand(1, 160, 96, 1).astype(np.float32)
    color = depth * 0.7 + 0.1
    whole = np.asarray(v.forward(params, depth, color))
    stitched = tile_stitch_infer(v, params, depth, color, tile_h=64,
                                 halo=48)
    assert stitched.shape == whole.shape
    diff = np.abs(stitched - whole)
    assert diff.mean() < 5e-3, diff.mean()


def test_tile_stitch_attention_free_exact():
    """Without CAC gates there are no global stats: tile+stitch must be
    exact to float noise."""
    from codon_tpu.parallel.stitch import tile_stitch_infer
    v = get_variant("rmcr_fuse_rmcr")
    params = v.init(jax.random.PRNGKey(3))
    rng = np.random.RandomState(8)
    depth = rng.rand(1, 160, 64, 1).astype(np.float32)
    color = rng.rand(1, 160, 64, 1).astype(np.float32)
    whole = np.asarray(v.forward(params, depth, color))
    stitched = tile_stitch_infer(v, params, depth, color, tile_h=64,
                                 halo=48)
    np.testing.assert_allclose(stitched, whole, atol=5e-4, rtol=1e-3)
