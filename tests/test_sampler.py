"""PatchSampler determinism, resume, edge-bias, and scene weights.

The reference has no training pipeline; these pin the rebuild's sampler
contract: batch i is a pure function of (seed, i), so an orbax-resumed run
reproduces the uninterrupted run's batches (and therefore its losses)
bitwise.
"""
import os

import numpy as np

from test_cli import _tiny_dataset
from codon_tpu import cli
from codon_tpu.train.data import PatchSampler


def _imgs(n=2, h=60, w=50, seed=0):
    rng = np.random.RandomState(seed)
    labs = [(rng.rand(h, w) * 255).astype(np.uint8) for _ in range(n)]
    cols = [(rng.rand(h, w) * 255).astype(np.uint8) for _ in range(n)]
    return labs, cols


def test_sample_at_pure_in_step():
    labs, cols = _imgs()
    s = PatchSampler(labs, cols, scale=4, patch=16, batch=4)
    a1, a2 = s.sample_at(7), s.sample_at(7)
    b = s.sample_at(8)
    for k in a1:
        np.testing.assert_array_equal(a1[k], a2[k])
    assert not np.array_equal(a1["label"], b["label"])
    # the convenience cursor walks the same stream
    s2 = PatchSampler(labs, cols, scale=4, patch=16, batch=4)
    np.testing.assert_array_equal(s2.sample()["label"],
                                  s.sample_at(0)["label"])


def test_prefetch_stream_position_explicit():
    """prefetch(depth, start) delivers sample_at(start), start+1, ...
    regardless of queue depth — the resume contract."""
    labs, cols = _imgs()
    base = PatchSampler(labs, cols, scale=4, patch=16, batch=2)
    want = [base.sample_at(i)["label"] for i in range(3, 7)]
    pf = base.prefetch(3, start_step=3)
    try:
        for w in want:
            np.testing.assert_array_equal(pf.sample()["label"], w)
    finally:
        pf.close()


def test_edge_bias_centers_patches_on_edges():
    """With edge_bias=1.0 and a single vertical depth edge, every patch
    corner lands within jitter range of the edge column."""
    h, w, P = 64, 64, 16
    lab = np.zeros((h, w), np.uint8)
    lab[:, 40:] = 200                       # step edge at column 40
    col = lab.copy()
    s = PatchSampler([lab], [col], scale=4, patch=P, batch=32,
                     augment="none", edge_bias=1.0)
    b = s.sample_at(0)
    # every patch must straddle the edge: both sides present in the label
    lo = b["label"].min(axis=(1, 2, 3))
    hi = b["label"].max(axis=(1, 2, 3))
    assert (hi - lo > 0.5).all(), (lo, hi)
    # uniform sampling would straddle it only ~P/w of the time
    u = PatchSampler([lab], [col], scale=4, patch=P, batch=32,
                     augment="none")
    bu = u.sample_at(0)
    frac = ((bu["label"].max(axis=(1, 2, 3))
             - bu["label"].min(axis=(1, 2, 3))) > 0.5).mean()
    assert frac < 0.9


def test_scene_weights_oversample():
    labs, cols = _imgs(n=2)
    labs[0][:] = 0
    labs[1][:] = 200
    s = PatchSampler(labs, cols, scale=4, patch=16, batch=16,
                     augment="none", scene_weights=[0.0, 1.0])
    b = s.sample_at(0)
    assert (b["label"] > 0.5).all()   # every patch from image 1


def test_orbax_resume_reproduces_uninterrupted(tmp_path):
    """Interrupt+resume == uninterrupted (round-3 verdict item 7): a run
    checkpointed at step 3 and resumed to 6 ends bitwise-equal to a
    straight 6-step run (params), because the sampler stream resumes at
    the restored step instead of restarting."""
    from codon_tpu.checkpoint import load_npz
    data = str(tmp_path / "data")
    _tiny_dataset(data)

    def run(steps, odir, ck):
        rc = cli.main(["train", "--scale", "4", "--data-dir", data,
                       "--steps", str(steps), "--patch", "16", "--batch",
                       "2", "--ckpt-out", ck, "--log-every", "1",
                       "--dtype", "fp32", "--orbax-dir", odir,
                       "--save-every", "3"])
        assert rc == 0

    ck_a = str(tmp_path / "a.npz")
    run(6, str(tmp_path / "orbax_a"), ck_a)          # uninterrupted

    ck_b = str(tmp_path / "b.npz")
    run(3, str(tmp_path / "orbax_b"), ck_b)          # "interrupted" at 3
    run(6, str(tmp_path / "orbax_b"), ck_b)          # resumed to 6

    import jax
    a, b = load_npz(ck_a), load_npz(ck_b)
    la, ta = jax.tree_util.tree_flatten_with_path(a)
    lb, tb = jax.tree_util.tree_flatten_with_path(b)
    assert ta == tb
    for (pa, va), (_, vb) in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=jax.tree_util.keystr(pa))


def test_collage_paste_deterministic_and_consistent():
    """collage: pure in (seed, step); pastes donor label+guidance content;
    keeps every channel in [0,1]; repairs the seam band of the degraded
    input from the composite label (the re-synthesized band must differ
    from the naive paste of shipped degradations)."""
    # distinct value ranges so pasted content is detectable
    labs = [np.full((60, 50), 230, np.uint8), np.full((60, 50), 20, np.uint8)]
    cols = [np.full((60, 50), 200, np.uint8), np.full((60, 50), 40, np.uint8)]
    s = PatchSampler(labs, cols, scale=4, patch=32, batch=8, collage=1.0,
                     augment="none")
    a1, a2 = s.sample_at(3), s.sample_at(3)
    for k in a1:
        np.testing.assert_array_equal(a1[k], a2[k])
    for k in ("depth", "color", "label"):
        assert a1[k].min() >= 0.0 and a1[k].max() <= 1.0

    # flat scenes at 230/20: any patch whose label contains BOTH ranges
    # got a cross-scene paste; its degraded input must carry bicubic blur
    # at the seam (values strictly between the two plateaus)
    crossed = 0
    for b in range(8):
        lab = a1["label"][b, ..., 0]
        lo, hi = lab.min(), lab.max()
        if hi - lo > 0.5:
            crossed += 1
            dp = a1["depth"][b, ..., 0]
            mid = ((dp > lo + 0.1) & (dp < hi - 0.1)).sum()
            assert mid > 0, "no bicubic seam blur in the degraded input"
    assert crossed > 0, "collage=1.0 never pasted across scenes"

    off = PatchSampler(labs, cols, scale=4, patch=32, batch=8,
                       augment="none").sample_at(3)
    assert not np.array_equal(off["label"], a1["label"])
