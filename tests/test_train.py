"""Training step: loss decreases; sharded step == single-device step."""
import numpy as np
import jax
import jax.numpy as jnp

from codon_tpu.models.variants import get_variant
from codon_tpu.parallel.mesh import make_mesh
from codon_tpu.train.trainer import TrainConfig, make_train_step


def _tiny_batch(rng, B=2, H=16, W=16):
    label = rng.rand(B, H, W, 1).astype(np.float32)
    return {
        "depth": np.clip(label + 0.1 * rng.randn(B, H, W, 1), 0, 1
                         ).astype(np.float32),
        "color": rng.rand(B, H, W, 1).astype(np.float32),
        "label": label,
        "mask": np.ones((B, H, W, 1), np.float32),
    }


def test_loss_decreases():
    v = get_variant("codon")
    params = v.init(jax.random.PRNGKey(0))
    step, tx = make_train_step(v, TrainConfig(learning_rate=1e-3),
                               donate=False)
    opt_state = tx.init(params)
    rng = np.random.RandomState(0)
    batch = _tiny_batch(rng)
    losses = []
    for _ in range(8):
        params, opt_state, m = step(params, opt_state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses


def test_sharded_step_matches_single():
    v = get_variant("codon")
    params = v.init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(1)
    batch = _tiny_batch(rng, B=2, H=16)

    cfg = TrainConfig(learning_rate=1e-3)
    step1, tx1 = make_train_step(v, cfg, donate=False)
    opt1 = tx1.init(params)
    p1, o1, m1 = step1(params, opt1, batch)

    mesh = make_mesh([2, 4])
    stepN, txN = make_train_step(v, cfg, mesh=mesh, donate=False)
    optN = txN.init(params)
    pN, oN, mN = stepN(params, optN, batch)

    assert abs(float(m1["loss"]) - float(mN["loss"])) < 1e-5
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(pN)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


def test_sharded_qat_scale_collective_exact():
    """The core sharded-QAT invariant: the all-reduced per-sample scale
    equals the untiled scale BITWISE (max reductions are order-
    independent), so every shard fake-quantizes on the identical grid."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    from codon_tpu.quant_ops import _gathered_sample_scale, _x_scale
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(3, 16, 8, 32).astype(np.float32))
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    f = shard_map(lambda xs: _gathered_sample_scale(xs, "sp"), mesh=mesh,
                  in_specs=P(None, "sp", None, None),
                  out_specs=P(None, None, None, None), check_vma=False)
    np.testing.assert_array_equal(np.asarray(f(x)),
                                  np.asarray(_x_scale(x)))


def test_sharded_qat_step_matches_single():
    """QAT x mesh (round-3 verdict item 8): the dynamic and frozen-static
    fake-quant backends train equivalently under a dp x sp mesh and on a
    single device — per-sample scales are all-reduced over sp; static
    grids need no collective.

    Equivalence is BOUNDED, not bitwise (unlike int8 inference tiling,
    whose integer accumulation is order-independent): fake-quant holds
    values in float, and the halo-sharded conv's reduction order differs
    from the untiled conv's by ~1e-6 — a value lying within that noise of
    a rounding boundary flips to the adjacent int8 code (one grid step,
    ~1e-2 here), which later convs smear over their receptive field.
    Measured on this seed: loss delta 7.8e-4 relative. The grid itself is
    bitwise-identical across shards (test above), so the sharded run
    trains the same quantization model in the statistical sense that any
    conv-order change does."""
    from codon_tpu.quant_ops import (FakeQuantOps, FakeQuantStaticOps,
                                     calibrate_act_scales)
    v = get_variant("codon")
    params = v.init(jax.random.PRNGKey(2))
    rng = np.random.RandomState(2)
    batch = _tiny_batch(rng, B=2, H=16)
    cfg = TrainConfig(learning_rate=1e-3)
    mesh = make_mesh([2, 4])
    scales = calibrate_act_scales(
        lambda p, d, c, ops, mask: v.forward(p, d, c, ops=ops, mask=mask),
        params, [(batch["depth"], batch["color"], batch["mask"])])

    for ops in (FakeQuantOps(), FakeQuantStaticOps(scales)):
        step1, tx1 = make_train_step(v, cfg, donate=False, ops=ops)
        opt1 = tx1.init(params)
        p1, _, m1 = step1(params, opt1, batch)

        stepN, txN = make_train_step(v, cfg, mesh=mesh, donate=False,
                                     ops=ops)
        optN = txN.init(params)
        pN, _, mN = stepN(params, optN, batch)

        l1, lN = float(m1["loss"]), float(mN["loss"])
        assert abs(l1 - lN) / abs(l1) < 5e-3, (type(ops), l1, lN)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(pN)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3, rtol=1e-2)


def test_weight_decay_shrinks_params():
    """Regression (round-2 advisor, high): decay placed after adam's
    scale(-lr) ADDED +wd*params per step — weights grew. With zero grads
    the update must be ~ -lr*wd*params (AdamW semantics)."""
    import optax
    from codon_tpu.train.trainer import make_optimizer
    lr, wd = 1e-2, 0.1
    tx = make_optimizer(TrainConfig(learning_rate=lr, weight_decay=wd))
    params = {"w": jnp.ones((4,))}
    opt_state = tx.init(params)
    grads = {"w": jnp.zeros((4,))}
    updates, _ = tx.update(grads, opt_state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]),
                               -lr * wd * np.ones(4), rtol=1e-6)
    ref = optax.adamw(lr, weight_decay=wd)
    ref_updates, _ = ref.update(grads, ref.init(params), params)
    np.testing.assert_allclose(np.asarray(updates["w"]),
                               np.asarray(ref_updates["w"]), rtol=1e-5)


def test_prefetch_sampler_propagates_worker_errors():
    """Regression (round-2 advisor, medium): a sampler exception killed
    the daemon thread silently and sample() blocked forever."""
    import pytest
    from codon_tpu.train.data import PatchSampler

    class Boom(PatchSampler):
        def sample_at(self, step):
            raise ValueError("bad data")

    rng = np.random.RandomState(0)
    labs = [(rng.rand(40, 40) * 255).astype(np.uint8)]
    s = Boom(labs, labs, scale=4, patch=16, batch=2).prefetch(2)
    try:
        with pytest.raises(RuntimeError, match="worker thread failed"):
            s.sample()
    finally:
        s.close()


def test_prefetch_sampler_delivers_batches():
    import numpy as np
    from codon_tpu.train.data import PatchSampler
    rng = np.random.RandomState(0)
    labs = [(rng.rand(60, 50) * 255).astype(np.uint8) for _ in range(2)]
    cols = [(rng.rand(60, 50) * 255).astype(np.uint8) for _ in range(2)]
    s = PatchSampler(labs, cols, scale=4, patch=16, batch=4,
                     augment="full").prefetch(2)
    try:
        for _ in range(5):
            b = s.sample()
            assert b["depth"].shape == (4, 16, 16, 1)
            assert np.isfinite(b["label"]).all()
    finally:
        s.close()


def test_grad_loss_masked_and_additive():
    """grad_weight adds exactly the masked finite-difference L1 term.

    Checked against a NumPy hand-computation on a batch with an invalid
    (mask=0) pixel: differences touching that pixel must not contribute,
    and grad_weight=0 must reproduce the plain pixel loss bit-for-bit.
    """
    v = get_variant("codon")
    params = v.init(jax.random.PRNGKey(3))
    rng = np.random.RandomState(3)
    batch = _tiny_batch(rng, B=1, H=8, W=8)
    batch["mask"][0, 3, 4, 0] = 0.0  # knock out one pixel

    def run(gw):
        step, tx = make_train_step(
            v, TrainConfig(learning_rate=0.0, grad_weight=gw),
            donate=False)
        opt_state = tx.init(params)
        _, _, m = step(params, opt_state, batch)
        return float(m["loss"])

    base = run(0.0)
    with_grad = run(0.7)

    # NumPy oracle for the gradient term on the model's own output
    out = np.asarray(v.forward(params, batch["depth"], batch["color"],
                               mask=batch["mask"]))
    lbl, m = batch["label"], batch["mask"]
    my = m[:, 1:] * m[:, :-1]
    mx = m[:, :, 1:] * m[:, :, :-1]
    ey = ((out[:, 1:] - out[:, :-1]) - (lbl[:, 1:] - lbl[:, :-1])) * my
    ex = ((out[:, :, 1:] - out[:, :, :-1])
          - (lbl[:, :, 1:] - lbl[:, :, :-1])) * mx
    gloss = (np.abs(ey).sum() + np.abs(ex).sum()) / (my.sum() + mx.sum())
    assert np.isclose(with_grad - base, 0.7 * gloss, rtol=1e-4), (
        with_grad - base, 0.7 * gloss)

    # moving a masked-out label pixel must not change the loss
    batch2 = {k: np.array(a) for k, a in batch.items()}
    batch2["label"][0, 3, 4, 0] += 123.0
    assert np.isclose(run(0.7), with_grad, rtol=1e-5)


def test_collapse_detector_patience_and_reset():
    """Exactly-zero global grad norms for `patience` consecutive
    observations diagnose dead-ReLU collapse; ANY live norm (however
    small) resets the streak — the r5 scale-conditioned run burned 17k
    steps past its step-~7k death because nothing watched for this."""
    from codon_tpu.train.trainer import CollapseDetector
    cd = CollapseDetector(patience=3)
    assert not cd.update(0.0)
    assert not cd.update(0.0)
    assert cd.update(0.0)

    cd = CollapseDetector(patience=3)
    assert not cd.update(0.0)
    assert not cd.update(0.0)
    assert not cd.update(1e-30)  # live gradient resets the streak
    assert not cd.update(0.0)
    assert not cd.update(0.0)
    assert cd.update(0.0)
    assert cd.update(0.0)        # stays tripped while norms stay zero


def test_clip_norm_damps_spike_aftermath():
    """clip_norm guards Adam's second moment against one-step spikes.

    Adam is invariant to a global rescale of the whole gradient SEQUENCE,
    so the observable harm of a spike is temporal: v inherits spike^2 and
    decays at 0.999/step, muting hundreds of subsequent ordinary steps
    (the regime that preceded the sc run's dead-ReLU collapse: grad_norm
    751 at step 1 vs ~1 thereafter). With clip_norm the post-spike run
    must move the parameters at the ordinary Adam scale."""
    import optax
    from codon_tpu.train.trainer import make_optimizer

    params = {"w": jnp.zeros(4, jnp.float32)}
    spike = {"w": jnp.full(4, 1e6, jnp.float32)}
    normal = {"w": jnp.full(4, 1e-2, jnp.float32)}

    def moved_after_spike(cfg, steps=300):
        tx = make_optimizer(cfg)
        st = tx.init(params)
        u1, st = tx.update(spike, st, params)
        p = optax.apply_updates(params, u1)
        p0 = p
        for _ in range(steps):
            u, st = tx.update(normal, st, p)
            p = optax.apply_updates(p, u)
        return float(jnp.abs(p["w"] - p0["w"]).max())

    lr = 1e-4
    unclipped = moved_after_spike(TrainConfig(learning_rate=lr))
    clipped = moved_after_spike(TrainConfig(learning_rate=lr,
                                            clip_norm=1.0))
    # clipped: ~300 ordinary Adam steps of ~lr each; unclipped: v ~ 1e12
    # freezes the run (m decays in ~tens of steps, v in ~thousands)
    assert clipped > 5 * unclipped, (clipped, unclipped)
    assert clipped > 30 * lr, clipped


def test_widen_stem_params_function_preserving():
    """widen_stem_params pads the 1-channel stem with ZERO slices: the
    widened codon_sc model computes the ancestor's function for EVERY
    conditioning value, so joint training starts from a working basin
    instead of the from-scratch init that collapsed."""
    from codon_tpu.models.codon_net import widen_stem_params

    v1 = get_variant("codon_x16")        # 1-channel, dead_heads=False
    vsc = get_variant("codon_sc")        # 2-channel twin
    params1 = v1.init(jax.random.PRNGKey(7))
    rng = np.random.RandomState(7)
    d = rng.rand(1, 16, 16, 1).astype(np.float32)
    c = rng.rand(1, 16, 16, 1).astype(np.float32)
    ref = np.asarray(v1.forward(params1, d, c))

    wide = widen_stem_params(params1, 2)
    assert wide["input"].shape == (3, 3, 2, 64)
    assert np.all(np.asarray(wide["input"])[:, :, 1, :] == 0.0)
    for cv in (0.0, 0.25, 1.0):
        x2 = np.concatenate([d, np.full_like(d, cv)], axis=-1)
        out = np.asarray(vsc.forward(wide, x2, c))
        np.testing.assert_allclose(out, ref, atol=2e-6, rtol=0)

    # guards: only 1-channel stems widen; params are not mutated
    assert np.asarray(params1["input"]).shape == (3, 3, 1, 64)
    import pytest
    with pytest.raises(ValueError):
        widen_stem_params(wide, 3)
