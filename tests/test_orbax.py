"""Orbax production checkpointing: async save, latest-step resume, GC."""
import numpy as np
import jax
import pytest

from codon_tpu.checkpoint import CheckpointManager, load_orbax, save_orbax
from codon_tpu.models.variants import get_variant


def _tree_eq(a, b):
    fa, _ = jax.tree.flatten(a)
    fb, _ = jax.tree.flatten(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_one_shot_roundtrip(tmp_path):
    v = get_variant("codon")
    params = v.init(jax.random.PRNGKey(0))
    save_orbax(str(tmp_path / "ck"), params)
    back = load_orbax(str(tmp_path / "ck"))
    _tree_eq(params, back)


def test_manager_async_save_resume_and_gc(tmp_path):
    v = get_variant("codon")
    params = v.init(jax.random.PRNGKey(1))
    with CheckpointManager(str(tmp_path / "run"), max_to_keep=2) as mgr:
        for step in (100, 200, 300):
            tree = {"params": params, "step": np.int64(step)}
            mgr.save(step, tree)
        mgr.wait()
        assert mgr.latest_step() == 300
        steps = list(mgr.all_steps())
    assert steps == [200, 300]  # keep-last-2 GC dropped step 100

    mgr2 = CheckpointManager(str(tmp_path / "run"))
    back = mgr2.restore()       # latest
    assert int(back["step"]) == 300
    _tree_eq(params, back["params"])
    older = mgr2.restore(200)
    assert int(older["step"]) == 200
    mgr2.close()


def test_restore_missing_raises(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        mgr.restore()
    mgr.close()
