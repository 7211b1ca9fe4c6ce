"""Driver-contract checks for __graft_entry__.py (what the round driver
runs: single-chip compile of entry(), multi-chip dryrun on virtual devs)."""
import importlib.util
import os
import subprocess
import sys

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


def test_dryrun_multichip_driver_env():
    """Round-1 regression: invoke the dryrun in a subprocess with the
    DRIVER's real environment (JAX_PLATFORMS=axon preset, no XLA_FLAGS) —
    conftest.py force-pins tests to CPUx8, which blinded the in-process
    tests to the driver-env failure (MULTICHIP_r01 ok=false). The dryrun
    must self-bootstrap its virtual mesh without touching the TPU."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"      # the session preset the driver uses
    env.pop("XLA_FLAGS", None)
    env.pop("CODON_DRYRUN_REEXEC", None)
    env.pop("CODON_DRYRUN_NATIVE", None)
    code = (f"import sys; sys.path.insert(0, {repo!r}); "
            "import __graft_entry__ as g; g.dryrun_multichip(8)")
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "dryrun_multichip(8)" in proc.stdout and "ok" in proc.stdout
