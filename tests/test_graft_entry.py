"""Driver-contract checks for __graft_entry__.py (what the round driver
runs: single-chip compile of entry(), multi-chip dryrun on virtual devs)."""
import importlib.util
import os

import numpy as np
import jax

_spec = importlib.util.spec_from_file_location(
    "graft_entry", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py"))
graft = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(graft)


def test_entry_jits_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.shape == (1, 370, 463, 1)
    assert np.isfinite(out).all()


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_4():
    graft.dryrun_multichip(4)
