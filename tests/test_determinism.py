"""Determinism: repeated jit executions are bitwise identical (the TPU
analog of the reference environments' race/sanitizer checks — SURVEY.md §5)."""
import numpy as np
import jax

from codon_tpu.models.variants import get_variant
from codon_tpu.train.trainer import TrainConfig, make_train_step


def test_forward_bitwise_deterministic():
    v = get_variant("codon")
    params = v.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    d = rng.rand(1, 24, 19, 1).astype(np.float32)
    c = rng.rand(1, 24, 19, 1).astype(np.float32)
    f = jax.jit(lambda p, a, b: v.forward(p, a, b))
    a = np.asarray(f(params, d, c))
    b = np.asarray(f(params, d, c))
    np.testing.assert_array_equal(a, b)


def test_train_step_bitwise_deterministic():
    v = get_variant("codon")
    params = v.init(jax.random.PRNGKey(1))
    step, tx = make_train_step(v, TrainConfig(), donate=False)
    opt = tx.init(params)
    rng = np.random.RandomState(1)
    batch = {k: rng.rand(2, 16, 16, 1).astype(np.float32)
             for k in ("depth", "color", "label")}
    batch["mask"] = np.ones((2, 16, 16, 1), np.float32)
    p1, _, m1 = step(params, opt, batch)
    p2, _, m2 = step(params, opt, batch)
    assert float(m1["loss"]) == float(m2["loss"])
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
