"""AOT export: serialized forward == live forward, polymorphic batch."""
import numpy as np
import jax

from codon_tpu.models.variants import get_variant
from codon_tpu.serve import export_forward, load_exported


def test_export_roundtrip_polymorphic_batch(tmp_path):
    v = get_variant("codon")
    params = jax.tree.map(lambda w: w * 0.5, v.init(jax.random.PRNGKey(0)))
    path = str(tmp_path / "m.codonx")
    n = export_forward(v, params, (20, 17), path)
    assert n > 0
    fn = load_exported(path)
    rng = np.random.RandomState(0)
    for B in (1, 3):   # polymorphic batch: one artifact, any B
        d = rng.rand(B, 20, 17, 1).astype(np.float32)
        c = rng.rand(B, 20, 17, 1).astype(np.float32)
        live = np.asarray(v.forward(params, d, c))
        aot = np.asarray(fn(d, c))
        np.testing.assert_allclose(aot, live, atol=1e-5, rtol=1e-5)


def test_export_tta_int8(tmp_path):
    """The quality-flagship serving config — TTA baked over static-int8 —
    exports with a polymorphic batch and matches the live TTA forward."""
    from codon_tpu.models.tta import make_tta_forward
    from codon_tpu.quant_ops import Int8StaticOps, calibrate_act_scales
    v = get_variant("codon")
    params = jax.tree.map(lambda w: w * 0.5, v.init(jax.random.PRNGKey(2)))
    rng = np.random.RandomState(2)
    d = rng.rand(2, 20, 17, 1).astype(np.float32)
    c = rng.rand(2, 20, 17, 1).astype(np.float32)
    m = np.ones_like(d)
    scales = calibrate_act_scales(
        lambda p, a, b, ops, mask: v.forward(p, a, b, ops=ops, mask=mask),
        params, [(d, c, m)])
    ops = Int8StaticOps(scales)
    path = str(tmp_path / "mtta.codonx")
    export_forward(v, params, (20, 17), path, ops=ops, mask=True, tta=True)
    fn = load_exported(path)
    live_tta = make_tta_forward(
        lambda p, a, b, mk: v.forward(p, a, b, mask=mk, ops=ops))
    for B in (1, 2):   # polymorphic batch survives the 4x flip stacking
        db, cb, mb = d[:B], c[:B], m[:B]
        live = np.asarray(live_tta(params, db, cb, mb))
        aot = np.asarray(fn(db, cb, mb))
        np.testing.assert_allclose(aot, live, atol=2e-3, rtol=2e-3)


def test_export_tta8_polymorphic_batch(tmp_path):
    """TTA8 (full dihedral, the quality-flagship eval config) exports with
    a polymorphic batch and matches the live transforms=8 wrapper — incl.
    the transposed quartet's second (W, H) forward inside one artifact."""
    from codon_tpu.models.tta import make_tta_forward
    v = get_variant("codon")
    params = jax.tree.map(lambda w: w * 0.5, v.init(jax.random.PRNGKey(3)))
    path = str(tmp_path / "mtta8.codonx")
    export_forward(v, params, (20, 17), path, tta=8)
    fn = load_exported(path)
    live_tta = make_tta_forward(
        lambda p, a, b, mk: v.forward(p, a, b, mask=mk), transforms=8)
    rng = np.random.RandomState(3)
    for B in (1, 2):
        d = rng.rand(B, 20, 17, 1).astype(np.float32)
        c = rng.rand(B, 20, 17, 1).astype(np.float32)
        live = np.asarray(live_tta(params, d, c, None))
        aot = np.asarray(fn(d, c))
        np.testing.assert_allclose(aot, live, atol=1e-5, rtol=1e-5)


def test_export_int8_static_and_mask(tmp_path):
    """The full static-int8 deployment path exports (pure XLA ops), with
    the padded-batch mask input."""
    from codon_tpu.quant_ops import Int8StaticOps, calibrate_act_scales
    v = get_variant("codon")
    params = jax.tree.map(lambda w: w * 0.5, v.init(jax.random.PRNGKey(1)))
    rng = np.random.RandomState(1)
    d = rng.rand(2, 20, 17, 1).astype(np.float32)
    c = rng.rand(2, 20, 17, 1).astype(np.float32)
    m = np.ones_like(d)
    scales = calibrate_act_scales(
        lambda p, a, b, ops, mask: v.forward(p, a, b, ops=ops, mask=mask),
        params, [(d, c, m)])
    ops = Int8StaticOps(scales)
    path = str(tmp_path / "m8.codonx")
    export_forward(v, params, (20, 17), path, ops=ops, mask=True)
    fn = load_exported(path)
    live = np.asarray(v.forward(params, d, c, mask=m, ops=ops))
    aot = np.asarray(fn(d, c, m))
    # the artifact recompiles through a different pipeline; float
    # reduction-order noise at round() boundaries flips int8 LSBs (same
    # class as tiled-vs-untiled in test_quant_ops) — equality up to a few
    # activation LSBs
    np.testing.assert_allclose(aot, live, atol=2e-3, rtol=2e-3)
