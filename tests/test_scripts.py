"""Tests for the load-bearing repo scripts.

`scripts/check_regression.py` is the shipping gate: it decides whether a
refreshed shipping checkpoint may replace its predecessor (PARITY.md
non-regression rule, from the round-3 x4_ship2 Art-regression lesson). A
bug here silently ships regressed checkpoints, so the gate semantics are
pinned: any per-image worsening > tol fails, a worsened mean fails, and
equal-or-better everywhere passes.

`scripts/soup.py` produces weight-space averages that feed QAT lineages;
its averaging and structure/int-leaf guards are pinned too.
"""
import json
import os
import subprocess
import sys

import numpy as np

from tests.conftest import REPO

SCRIPTS = os.path.join(REPO, "scripts")


def _eval_json(path, per, mean=None):
    per_image = [{"name": k, "rmse": float(v), "ssim": 0.9}
                 for k, v in per.items()]
    if mean is None:
        mean = float(np.mean(list(per.values())))
    with open(path, "w") as f:
        json.dump({"mean_rmse": mean, "per_image": per_image}, f)
    return str(path)


def _gate(old, new, *extra):
    return subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "check_regression.py"),
         old, new, *extra],
        capture_output=True, text=True, cwd=REPO)


def test_gate_passes_on_uniform_improvement(tmp_path):
    old = _eval_json(tmp_path / "old.json", {"Art": 3.0, "Cones": 2.0})
    new = _eval_json(tmp_path / "new.json", {"Art": 2.5, "Cones": 1.9})
    r = _gate(old, new)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "GATE PASSED" in r.stdout


def test_gate_fails_on_per_image_regression_despite_better_mean(tmp_path):
    # The exact round-3 failure mode: mean improves, one image blows up.
    old = _eval_json(tmp_path / "old.json",
                     {"Art": 2.255, "Cones": 2.0, "Books": 2.0})
    new = _eval_json(tmp_path / "new.json",
                     {"Art": 3.354, "Cones": 1.0, "Books": 1.0})
    r = _gate(old, new)
    assert r.returncode == 1
    assert "Art" in r.stdout and "GATE FAILED" in r.stdout


def test_gate_fails_on_worsened_mean_even_within_tol(tmp_path):
    old = _eval_json(tmp_path / "old.json", {"Art": 2.0, "Cones": 2.0})
    new = _eval_json(tmp_path / "new.json", {"Art": 2.1, "Cones": 2.1})
    r = _gate(old, new)  # +5% each: within per-image tol, mean worsens
    assert r.returncode == 1
    assert "mean" in r.stdout and "GATE FAILED" in r.stdout


def test_gate_tol_flag_widens_per_image_band(tmp_path):
    # +15% on one image, mean still better: fails at default tol 0.10,
    # passes at --tol 0.20.
    old = _eval_json(tmp_path / "old.json", {"Art": 2.0, "Cones": 4.0})
    new = _eval_json(tmp_path / "new.json", {"Art": 2.3, "Cones": 3.0})
    assert _gate(old, new).returncode == 1
    assert _gate(old, new, "--tol", "0.20").returncode == 0


def test_gate_rejects_disjoint_image_sets(tmp_path):
    old = _eval_json(tmp_path / "old.json", {"Art": 2.0})
    new = _eval_json(tmp_path / "new.json", {"Cones": 2.0})
    assert _gate(old, new).returncode == 1


def test_gate_rejects_partial_overlap(tmp_path):
    # A refresh evaluated on a SUBSET of the old images must not pass by
    # silently dropping the missing ones (round-4 advisor finding) —
    # and extra images in the new eval are rejected symmetrically.
    old = _eval_json(tmp_path / "old.json",
                     {"Art": 2.0, "Cones": 2.0, "Books": 2.0})
    new = _eval_json(tmp_path / "new.json", {"Art": 1.0, "Cones": 1.0})
    r = _gate(old, new)
    assert r.returncode == 1
    assert "identical sets" in r.stderr
    assert _gate(new, old).returncode == 1


def _soup(out, members, *extra):
    return subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "soup.py"),
         out, *members, *extra],
        capture_output=True, text=True, cwd=REPO)


def test_soup_uniform_and_weighted_average(tmp_path):
    from codon_tpu.checkpoint import load_npz, save_npz
    a = {"w": np.full((2, 3), 1.0, np.float32),
         "b": {"k": np.full((4,), 0.0, np.float32)}}
    b = {"w": np.full((2, 3), 3.0, np.float32),
         "b": {"k": np.full((4,), 2.0, np.float32)}}
    pa, pb = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    save_npz(pa, a)
    save_npz(pb, b)

    out = str(tmp_path / "soup.npz")
    r = _soup(out, [pa, pb])
    assert r.returncode == 0, r.stdout + r.stderr
    got = load_npz(out)
    np.testing.assert_allclose(np.asarray(got["w"]), 2.0)
    np.testing.assert_allclose(np.asarray(got["b"]["k"]), 1.0)

    out2 = str(tmp_path / "soup_w.npz")
    assert _soup(out2, [pa, pb], "--w", "3,1").returncode == 0
    got2 = load_npz(out2)
    np.testing.assert_allclose(np.asarray(got2["w"]), 1.5)  # .75*1 + .25*3


def test_soup_rejects_structure_mismatch_and_int_leaf_drift(tmp_path):
    from codon_tpu.checkpoint import save_npz
    base = {"w": np.ones((2,), np.float32), "n": np.array([3], np.int32)}
    pa = str(tmp_path / "a.npz")
    save_npz(pa, base)

    pb = str(tmp_path / "b.npz")
    save_npz(pb, {"w": np.ones((2,), np.float32)})  # missing leaf
    assert _soup(str(tmp_path / "o1.npz"), [pa, pb]).returncode != 0

    pc = str(tmp_path / "c.npz")
    save_npz(pc, {"w": np.ones((2,), np.float32),
                  "n": np.array([4], np.int32)})  # int leaf differs
    assert _soup(str(tmp_path / "o2.npz"), [pa, pc]).returncode != 0


def test_soup_rejects_bad_weights_and_leaf_shape_drift(tmp_path):
    """Round-4 advisor findings: a zero-sum --w spec divided by zero into
    an all-NaN soup; broadcastable-but-mismatched float leaves ((1,C) vs
    (C,)) averaged into a silently corrupt checkpoint."""
    from codon_tpu.checkpoint import save_npz
    pa, pb = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    save_npz(pa, {"w": np.ones((3,), np.float32)})
    save_npz(pb, {"w": np.full((3,), 2.0, np.float32)})
    for bad_w in ("0,0", "-1,2"):
        r = _soup(str(tmp_path / "o.npz"), [pa, pb], "--w", bad_w)
        assert r.returncode != 0, bad_w

    pc = str(tmp_path / "c.npz")
    save_npz(pc, {"w": np.ones((1, 3), np.float32)})  # broadcastable shape
    assert _soup(str(tmp_path / "o2.npz"), [pa, pc]).returncode != 0
    # (dtype drift is unreachable through this path: save_npz normalizes
    # float leaves to float32, so only the shape guard is testable)
