"""Quant Ops backends: int8 inference == fake-quant numerics; QAT grads flow."""
import numpy as np
import jax
import jax.numpy as jnp

from codon_tpu.models.variants import get_variant
from codon_tpu.quant_ops import FakeQuantOps, Int8Ops
from codon_tpu.train.trainer import TrainConfig, make_train_step


def _data(seed=0, B=1, H=20, W=17):
    rng = np.random.RandomState(seed)
    return (rng.rand(B, H, W, 1).astype(np.float32),
            rng.rand(B, H, W, 1).astype(np.float32))


def test_int8_matches_fake_quant_per_op():
    """A single real int8 conv computes the same function the QAT forward
    trained (integer conv == float conv over the rounded grid, up to float
    sums). Whole-model trajectories diverge chaotically with DYNAMIC
    scales (rounding-boundary flips compound over 40 convs on random
    nets), so equivalence is asserted at the op level and closeness at
    the model level (next test)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 13, 11, 64).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 64, 64) * 0.1).astype(np.float32))
    a = np.asarray(FakeQuantOps().conv2d(x, w))
    b = np.asarray(Int8Ops().conv2d(x, w))
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_int8_close_to_float():
    v = get_variant("codon")
    params = jax.tree.map(lambda w: w * 0.5,
                          v.init(jax.random.PRNGKey(1)))
    d, c = _data(1)
    f = np.asarray(v.forward(params, d, c))
    q = np.asarray(v.forward(params, d, c, ops=Int8Ops()))
    rel = np.abs(q - f).mean() / (np.abs(f).mean() + 1e-8)
    assert rel < 0.25, rel


def test_qat_step_trains():
    v = get_variant("codon")
    params = v.init(jax.random.PRNGKey(2))
    step, tx = make_train_step(v, TrainConfig(learning_rate=1e-3),
                               donate=False, ops=FakeQuantOps())
    opt = tx.init(params)
    rng = np.random.RandomState(2)
    batch = {k: rng.rand(2, 16, 16, 1).astype(np.float32)
             for k in ("depth", "color", "label")}
    batch["mask"] = np.ones((2, 16, 16, 1), np.float32)
    losses = []
    for _ in range(6):
        params, opt, m = step(params, opt, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
