"""CLI end-to-end on the CPU backend: eval (resume, json), train, golden,
convert, info — the full driver surface the reference exposed through its
three per-scale test.py scripts plus what it lacked (training)."""
import json
import os

import numpy as np
import pytest

from conftest import reference_available
from codon_tpu import cli


def _tiny_dataset(root, n=3, hw=(34, 29)):
    """Synthesize a reference-layout scale dir with small images."""
    import cv2
    rng = np.random.RandomState(0)
    for sub in ("input_depth", "input_color", "input_label"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    names = []
    for i in range(n):
        h, w = hw
        label = (rng.rand(h, w) * 255).astype(np.uint8)
        color = (rng.rand(h, w) * 255).astype(np.uint8)
        lr = cv2.resize(cv2.resize(label, (w // 4, h // 4)), (w, h),
                        interpolation=cv2.INTER_CUBIC)
        name = f"img{i}.png"
        cv2.imwrite(os.path.join(root, "input_depth", name), lr)
        cv2.imwrite(os.path.join(root, "input_color", name), color)
        cv2.imwrite(os.path.join(root, "input_label", name), label)
        names.append(name)
    return names


def test_eval_end_to_end(tmp_path):
    data = str(tmp_path / "data")
    _tiny_dataset(data)
    out = str(tmp_path / "out")
    jpath = str(tmp_path / "m.json")
    rc = cli.main(["eval", "--scale", "4", "--data-dir", data, "--batch",
                   "2", "--out", out, "--json", jpath, "--dtype", "fp32",
                   "--pad-multiple", "8"])
    assert rc == 0
    assert len(os.listdir(out)) == 3
    with open(jpath) as f:
        m = json.load(f)
    assert m["images"] == 3 and len(m["per_image"]) == 3
    assert m["mean_rmse"] > 0
    # resume: immediately done — assert the skip actually happened (a
    # regression that re-evaluates everything would also return 0)
    mtimes = {f: os.path.getmtime(os.path.join(out, f))
              for f in os.listdir(out)}
    rc = cli.main(["eval", "--scale", "4", "--data-dir", data, "--out", out,
                   "--resume"])
    assert rc == 0
    assert mtimes == {f: os.path.getmtime(os.path.join(out, f))
                      for f in os.listdir(out)}, "resume rewrote outputs"


def test_train_smoke(tmp_path):
    data = str(tmp_path / "data")
    _tiny_dataset(data)
    ck = str(tmp_path / "t.npz")
    rc = cli.main(["train", "--scale", "4", "--data-dir", data, "--steps",
                   "3", "--patch", "16", "--batch", "2", "--ckpt-out", ck,
                   "--log-every", "1", "--dtype", "fp32"])
    assert rc == 0
    assert os.path.exists(ck)
    # trained checkpoint loads back into eval
    out = str(tmp_path / "out2")
    rc = cli.main(["eval", "--scale", "4", "--data-dir", data, "--ckpt", ck,
                   "--no-save", "--batch", "2", "--dtype", "fp32",
                   "--out", out, "--pad-multiple", "8"])
    assert rc == 0


def test_train_ema(tmp_path):
    """--ema saves a Polyak-averaged sibling checkpoint that (a) differs
    from the final weights, (b) stays close to them at high decay over a
    short run, and (c) loads back into eval."""
    from codon_tpu.checkpoint import load_npz
    data = str(tmp_path / "data")
    _tiny_dataset(data)
    ck = str(tmp_path / "t.npz")
    rc = cli.main(["train", "--scale", "4", "--data-dir", data, "--steps",
                   "4", "--patch", "16", "--batch", "2", "--ckpt-out", ck,
                   "--log-every", "1", "--dtype", "fp32", "--ema", "0.9"])
    assert rc == 0
    ema_ck = str(tmp_path / "t_ema.npz")
    assert os.path.exists(ema_ck)
    import jax
    final = jax.tree_util.tree_leaves(load_npz(ck))
    ema = jax.tree_util.tree_leaves(load_npz(ema_ck))
    assert len(final) == len(ema)
    diffs = []
    for fv, ev in zip(final, ema):
        a, b = np.asarray(fv, np.float64), np.asarray(ev, np.float64)
        assert np.all(np.isfinite(b))
        diffs.append(np.max(np.abs(a - b)))
    assert max(diffs) > 0  # the average lags the raw weights...
    # ...but after 4 steps from the same init it cannot be far away
    assert max(diffs) < 0.1
    rc = cli.main(["eval", "--scale", "4", "--data-dir", data, "--ckpt",
                   ema_ck, "--no-save", "--batch", "2", "--dtype", "fp32",
                   "--pad-multiple", "8"])
    assert rc == 0


@pytest.mark.skipif(not reference_available(), reason="no reference data")
def test_golden_matches_baseline(capsys):
    rc = cli.main(["golden", "--scale", "8"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    mean_rmse, mean_ssim = map(float, lines[-1].split())
    assert abs(mean_rmse - 3.4789) < 5e-4
    assert abs(mean_ssim - 0.9370) < 5e-4


def test_convert_and_info(tmp_path):
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from oracle import load_reference_codonnet
    net = load_reference_codonnet()()
    pth = str(tmp_path / "x.pth")
    npz = str(tmp_path / "x.npz")
    torch.save({"epoch": 3, "model": net}, pth)
    assert cli.main(["convert", "--pth", pth, "--npz", npz]) == 0
    assert os.path.exists(npz)
    assert cli.main(["info", "--variant", "codon"]) == 0


def test_train_mix_scales(tmp_path, capsys):
    """--mix-scales pools the shipped degradations of the same scenes
    from the other scale dirs into the training set."""
    root = str(tmp_path)
    for s in (4, 8):
        _tiny_dataset(os.path.join(root, f"CODON_X{s}"))
    ck = str(tmp_path / "t.npz")
    rc = cli.main(["train", "--scale", "4", "--data-root", root,
                   "--steps", "3", "--patch", "16", "--batch", "2",
                   "--ckpt-out", ck, "--log-every", "1", "--dtype",
                   "fp32", "--mix-scales"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "mix-scales: +3 shipped degradation pairs" in out
    assert "6 source images" in out


def test_eval_tiled_devices(tmp_path):
    """--tile-devices: spatially-sharded eval over the virtual CPU mesh."""
    data = str(tmp_path / "data")
    _tiny_dataset(data, n=2, hw=(40, 33))
    out = str(tmp_path / "out_tiled")
    out_ref = str(tmp_path / "out_ref")
    j1, j2 = str(tmp_path / "t.json"), str(tmp_path / "r.json")
    rc = cli.main(["eval", "--scale", "4", "--data-dir", data, "--batch",
                   "2", "--out", out, "--json", j1, "--dtype", "fp32",
                   "--pad-multiple", "8", "--tile-devices", "4"])
    assert rc == 0
    rc = cli.main(["eval", "--scale", "4", "--data-dir", data, "--batch",
                   "2", "--out", out_ref, "--json", j2, "--dtype", "fp32",
                   "--pad-multiple", "8"])
    assert rc == 0
    m1, m2 = json.load(open(j1)), json.load(open(j2))
    # tiled execution is exact: identical metrics to the untiled run
    assert abs(m1["mean_rmse"] - m2["mean_rmse"]) < 1e-6
    assert abs(m1["mean_ssim"] - m2["mean_ssim"]) < 1e-6


def test_eval_dp_devices_and_int8_tiled(tmp_path):
    """--dp-devices eval matches single-device metrics; int8 + mesh eval
    actually runs the quantized path (round-1 advisor finding: the tiled
    branch silently fell back to bf16 while reporting int8)."""
    data = str(tmp_path / "data")
    _tiny_dataset(data, n=3, hw=(40, 33))
    jd, jr, ji, jit_ = (str(tmp_path / n) for n in
                        ("d.json", "r.json", "i.json", "it.json"))
    rc = cli.main(["eval", "--scale", "4", "--data-dir", data, "--batch",
                   "2", "--no-save", "--json", jd, "--dtype", "fp32",
                   "--pad-multiple", "8", "--dp-devices", "2",
                   "--tile-devices", "2", "--out", str(tmp_path / "o1")])
    assert rc == 0
    rc = cli.main(["eval", "--scale", "4", "--data-dir", data, "--batch",
                   "2", "--no-save", "--json", jr, "--dtype", "fp32",
                   "--pad-multiple", "8", "--out", str(tmp_path / "o2")])
    assert rc == 0
    md, mr = json.load(open(jd)), json.load(open(jr))
    assert abs(md["mean_rmse"] - mr["mean_rmse"]) < 1e-6
    # int8: untiled vs dp x sp mesh must agree (same quantized math)
    rc = cli.main(["eval", "--scale", "4", "--data-dir", data, "--batch",
                   "2", "--no-save", "--json", ji, "--dtype", "int8",
                   "--pad-multiple", "8", "--out", str(tmp_path / "o3")])
    assert rc == 0
    rc = cli.main(["eval", "--scale", "4", "--data-dir", data, "--batch",
                   "2", "--no-save", "--json", jit_, "--dtype", "int8",
                   "--pad-multiple", "8", "--dp-devices", "2",
                   "--tile-devices", "2", "--out", str(tmp_path / "o4")])
    assert rc == 0
    mi, mit = json.load(open(ji)), json.load(open(jit_))
    # int8 rides bf16 compute; halo-conv vs plain-conv accumulation order
    # flips quantization roundings that compound over 40 convs, so the two
    # runs agree only statistically (bit-exactness of tiled int8 is proven
    # in fp32 by test_quant_ops.test_int8_tiled_matches_untiled).
    assert abs(mi["mean_rmse"] - mit["mean_rmse"]) < 0.5, (mi, mit)
    # falsifiable fallback guard: a mesh branch that silently dropped the
    # int8 backend (the round-1 bug) would run the IDENTICAL bf16 program
    # — so the bf16 mesh run must NOT byte-reproduce the int8 mesh run
    jb = str(tmp_path / "mesh_bf16.json")
    rc = cli.main(["eval", "--scale", "4", "--data-dir", data, "--batch",
                   "2", "--no-save", "--json", jb, "--dtype", "bf16",
                   "--pad-multiple", "8", "--dp-devices", "2",
                   "--tile-devices", "2", "--out", str(tmp_path / "o5")])
    assert rc == 0
    mb = json.load(open(jb))
    assert ([r["rmse"] for r in mb["per_image"]]
            != [r["rmse"] for r in mit["per_image"]]), \
        "int8 mesh eval produced bit-identical metrics to bf16 (fallback?)"


def test_eval_zoo_variant(tmp_path):
    """Zoo variants run through the full eval pipeline (regression: the
    random-init fallback must use the variant's own init)."""
    data = str(tmp_path / "data")
    _tiny_dataset(data, n=2, hw=(34, 29))
    out = str(tmp_path / "outz")
    rc = cli.main(["eval", "--scale", "4", "--data-dir", data, "--batch",
                   "2", "--out", out, "--dtype", "fp32",
                   "--pad-multiple", "8", "--variant",
                   "zoo:rmcr_fuse_rmcr"])
    assert rc == 0
    assert len(os.listdir(out)) == 2


def test_train_qat_static_ships_scales(tmp_path, capsys):
    """train --qat-static calibrates, fine-tunes, and embeds act_scales;
    eval --dtype int8 picks the static backend up from the checkpoint."""
    data = str(tmp_path / "data")
    _tiny_dataset(data)
    ck = str(tmp_path / "qs.npz")
    rc = cli.main(["train", "--scale", "4", "--data-dir", data, "--steps",
                   "3", "--patch", "16", "--batch", "2", "--ckpt-out", ck,
                   "--log-every", "1", "--dtype", "fp32", "--qat-static"])
    assert rc == 0
    import numpy as np
    keys = np.load(ck).files
    assert any(k.startswith("act_scales/") for k in keys), keys
    out = str(tmp_path / "out_qs")
    capsys.readouterr()
    rc = cli.main(["eval", "--scale", "4", "--data-dir", data, "--ckpt", ck,
                   "--no-save", "--batch", "2", "--dtype", "int8",
                   "--out", out, "--pad-multiple", "8"])
    assert rc == 0
    # the eval must actually select the STATIC backend (rc==0 alone would
    # also pass on a silent dynamic fallback after a key rename)
    assert "int8: static per-channel scales from checkpoint" in \
        capsys.readouterr().out


def test_train_ema_qat_static_composition(tmp_path):
    """--ema with --qat-static: the Polyak sibling also carries the frozen
    act_scales (identical to the final checkpoint's), so BOTH artifacts
    keep the fast static-int8 deployment path."""
    data = str(tmp_path / "data")
    _tiny_dataset(data)
    ck = str(tmp_path / "qse.npz")
    rc = cli.main(["train", "--scale", "4", "--data-dir", data, "--steps",
                   "3", "--patch", "16", "--batch", "2", "--ckpt-out", ck,
                   "--log-every", "1", "--dtype", "fp32", "--qat-static",
                   "--ema", "0.9"])
    assert rc == 0
    import numpy as np
    ema_ck = str(tmp_path / "qse_ema.npz")
    assert os.path.exists(ema_ck)
    f, e = np.load(ck), np.load(ema_ck)
    scale_keys = [k for k in f.files if k.startswith("act_scales/")]
    assert scale_keys
    for k in scale_keys:
        assert k in e.files
        np.testing.assert_array_equal(f[k], e[k])
    rc = cli.main(["eval", "--scale", "4", "--data-dir", data, "--ckpt",
                   ema_ck, "--no-save", "--batch", "2", "--dtype", "int8",
                   "--pad-multiple", "8"])
    assert rc == 0


def test_train_orbax_resume(tmp_path, capsys):
    """--orbax-dir: async step saves; a rerun resumes from the latest step
    instead of restarting (crash-recovery semantics)."""
    data = str(tmp_path / "data")
    _tiny_dataset(data)
    ck = str(tmp_path / "o.npz")
    odir = str(tmp_path / "orbax_run")
    rc = cli.main(["train", "--scale", "4", "--data-dir", data, "--steps",
                   "4", "--patch", "16", "--batch", "2", "--ckpt-out", ck,
                   "--log-every", "1", "--dtype", "fp32",
                   "--orbax-dir", odir, "--save-every", "2"])
    assert rc == 0
    from codon_tpu.checkpoint import CheckpointManager
    mgr = CheckpointManager(odir)
    assert mgr.latest_step() == 4
    mgr.close()
    # rerun with more steps: resumes at 4, runs 5..6 only
    capsys.readouterr()
    rc = cli.main(["train", "--scale", "4", "--data-dir", data, "--steps",
                   "6", "--patch", "16", "--batch", "2", "--ckpt-out", ck,
                   "--log-every", "1", "--dtype", "fp32",
                   "--orbax-dir", odir, "--save-every", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    # a silent restart-from-0 would also end at latest_step()==6 — pin the
    # actual resume (and that step 1 was NOT retrained)
    assert "orbax: resumed step 4" in out
    assert "step      1" not in out and "step 1 " not in out
    mgr = CheckpointManager(odir)
    assert mgr.latest_step() == 6
    tree = mgr.restore()
    assert int(tree["step"]) == 6
    mgr.close()


def test_eval_int8_static_tiled(tmp_path, capsys):
    """A qat-static checkpoint evaluated with --dtype int8 under a dp x sp
    mesh runs the STATIC sharded backend and agrees with the untiled
    static run (same frozen grid on every shard)."""
    data = str(tmp_path / "data")
    _tiny_dataset(data, n=3, hw=(40, 33))
    ck = str(tmp_path / "qs.npz")
    rc = cli.main(["train", "--scale", "4", "--data-dir", data, "--steps",
                   "2", "--patch", "16", "--batch", "2", "--ckpt-out", ck,
                   "--log-every", "1", "--dtype", "fp32", "--qat-static"])
    assert rc == 0
    ju, jt = str(tmp_path / "u.json"), str(tmp_path / "t.json")
    rc = cli.main(["eval", "--scale", "4", "--data-dir", data, "--batch",
                   "2", "--no-save", "--json", ju, "--dtype", "int8",
                   "--pad-multiple", "8", "--ckpt", ck,
                   "--out", str(tmp_path / "o1")])
    assert rc == 0
    capsys.readouterr()
    rc = cli.main(["eval", "--scale", "4", "--data-dir", data, "--batch",
                   "2", "--no-save", "--json", jt, "--dtype", "int8",
                   "--pad-multiple", "8", "--ckpt", ck, "--dp-devices", "2",
                   "--tile-devices", "2", "--out", str(tmp_path / "o2")])
    assert rc == 0
    # the mesh run must select the STATIC backend, not fall back dynamic
    assert "int8: static per-channel scales from checkpoint" in \
        capsys.readouterr().out
    mu, mt = json.load(open(ju)), json.load(open(jt))
    # static grid is identical on every shard; residual diffs are the
    # reduction-order LSB flips quantified in test_quant_ops
    assert abs(mu["mean_rmse"] - mt["mean_rmse"]) < 0.5, (mu, mt)


def test_eval_tta(tmp_path):
    """--tta: 4-flip self-ensemble runs end-to-end and stays in the same
    accuracy class as the plain forward (exact equality is not expected —
    the ensemble is a different estimator)."""
    data = str(tmp_path / "data")
    _tiny_dataset(data)
    j1, j2 = str(tmp_path / "a.json"), str(tmp_path / "b.json")
    rc = cli.main(["eval", "--scale", "4", "--data-dir", data, "--batch",
                   "2", "--no-save", "--json", j1, "--dtype", "fp32",
                   "--pad-multiple", "8", "--out", str(tmp_path / "o1")])
    assert rc == 0
    rc = cli.main(["eval", "--scale", "4", "--data-dir", data, "--batch",
                   "2", "--no-save", "--json", j2, "--dtype", "fp32",
                   "--pad-multiple", "8", "--tta",
                   "--out", str(tmp_path / "o2")])
    assert rc == 0
    m1, m2 = json.load(open(j1)), json.load(open(j2))
    assert m2["mean_rmse"] > 0
    assert abs(m1["mean_rmse"] - m2["mean_rmse"]) < 2.0, (m1, m2)


def test_eval_tta8(tmp_path):
    """--tta8: the 8-transform dihedral ensemble runs end-to-end (the
    transposed quartet exercises non-square padded batches) and records
    its mode in the summary JSON."""
    data = str(tmp_path / "data")
    _tiny_dataset(data)
    j = str(tmp_path / "a.json")
    rc = cli.main(["eval", "--scale", "4", "--data-dir", data, "--batch",
                   "2", "--no-save", "--json", j, "--dtype", "fp32",
                   "--pad-multiple", "8", "--tta8",
                   "--out", str(tmp_path / "o1")])
    assert rc == 0
    m = json.load(open(j))
    assert m["tta_transforms"] == 8
    assert m["mean_rmse"] > 0


def test_eval_mixed_variant_ensemble(tmp_path):
    """--variant a,b with --ckpt a,b: mixed-architecture ensembles.
    codon_f5 shares codon's param pytree, so the same checkpoint serves
    both members; the ensemble must differ from the solo codon eval
    (the f5 member runs 2 extra fusion iterations)."""
    data = str(tmp_path / "data")
    _tiny_dataset(data, n=2, hw=(40, 33))
    ck = str(tmp_path / "a.npz")
    rc = cli.main(["train", "--scale", "4", "--data-dir", data, "--steps",
                   "2", "--patch", "16", "--batch", "2", "--ckpt-out", ck,
                   "--log-every", "1", "--dtype", "fp32"])
    assert rc == 0
    base = ["eval", "--scale", "4", "--data-dir", data, "--batch", "2",
            "--no-save", "--dtype", "fp32", "--pad-multiple", "8"]
    j1, j2 = str(tmp_path / "solo.json"), str(tmp_path / "mixed.json")
    rc = cli.main(base + ["--ckpt", ck, "--json", j1,
                          "--out", str(tmp_path / "o1")])
    assert rc == 0
    rc = cli.main(base + ["--ckpt", f"{ck},{ck}",
                          "--variant", "codon,codon_f5", "--json", j2,
                          "--out", str(tmp_path / "o2")])
    assert rc == 0
    m1, m2 = json.load(open(j1)), json.load(open(j2))
    assert m1["mean_rmse"] != m2["mean_rmse"]
    # mismatched list length is a hard error
    rc = None
    try:
        cli.main(base + ["--ckpt", f"{ck},{ck}",
                         "--variant", "codon,codon,codon_f5",
                         "--json", j2, "--out", str(tmp_path / "o3")])
    except SystemExit:
        rc = "raised"
    assert rc == "raised"


def test_eval_ensemble_tta_on_mesh(tmp_path):
    """Round-3: ensembles and --tta compose with the dp x sp mesh.
    Ensemble of the same checkpoint twice + TTA on a 2x2 mesh must agree
    with single-device single-model TTA (same estimator, float-order
    noise only)."""
    data = str(tmp_path / "data")
    _tiny_dataset(data, n=2, hw=(40, 33))
    ck = str(tmp_path / "a.npz")
    rc = cli.main(["train", "--scale", "4", "--data-dir", data, "--steps",
                   "2", "--patch", "16", "--batch", "2", "--ckpt-out", ck,
                   "--log-every", "1", "--dtype", "fp32"])
    assert rc == 0
    base = ["eval", "--scale", "4", "--data-dir", data, "--batch", "2",
            "--no-save", "--dtype", "fp32", "--pad-multiple", "8", "--tta"]
    j1, j2 = str(tmp_path / "single.json"), str(tmp_path / "mesh.json")
    rc = cli.main(base + ["--ckpt", ck, "--json", j1,
                          "--out", str(tmp_path / "o1")])
    assert rc == 0
    rc = cli.main(base + ["--ckpt", f"{ck},{ck}", "--json", j2,
                          "--dp-devices", "2", "--tile-devices", "2",
                          "--out", str(tmp_path / "o2")])
    assert rc == 0
    m1, m2 = json.load(open(j1)), json.load(open(j2))
    assert abs(m1["mean_rmse"] - m2["mean_rmse"]) < 0.01, (m1, m2)


def test_export_cli(tmp_path):
    """cli export: checkpoint -> serving artifact -> runs standalone."""
    data = str(tmp_path / "data")
    _tiny_dataset(data)
    ck = str(tmp_path / "t.npz")
    rc = cli.main(["train", "--scale", "4", "--data-dir", data, "--steps",
                   "2", "--patch", "16", "--batch", "2", "--ckpt-out", ck,
                   "--log-every", "1", "--dtype", "fp32"])
    assert rc == 0
    art = str(tmp_path / "m.codonx")
    rc = cli.main(["export", "--ckpt", ck, "--out", art, "--height", "24",
                   "--width", "20", "--dtype", "fp32"])
    assert rc == 0
    from codon_tpu.serve import load_exported
    fn = load_exported(art)
    d = np.zeros((2, 24, 20, 1), np.float32)
    out = np.asarray(fn(d, d))
    assert out.shape == (2, 24, 20, 1)


def test_eval_ensemble(tmp_path):
    """--ckpt a,b: model ensemble averages outputs; ensemble of the same
    checkpoint twice == single model."""
    data = str(tmp_path / "data")
    _tiny_dataset(data)
    ck1, ck2 = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    for seed, ck in (("0", ck1), ("1", ck2)):
        rc = cli.main(["train", "--scale", "4", "--data-dir", data,
                       "--steps", "2", "--patch", "16", "--batch", "2",
                       "--ckpt-out", ck, "--log-every", "1",
                       "--dtype", "fp32", "--seed", seed])
        assert rc == 0
    js, jd, je = (str(tmp_path / n) for n in ("s.json", "d.json", "e.json"))
    base = ["eval", "--scale", "4", "--data-dir", data, "--batch", "2",
            "--no-save", "--dtype", "fp32", "--pad-multiple", "8"]
    rc = cli.main(base + ["--ckpt", ck1, "--json", js,
                          "--out", str(tmp_path / "o1")])
    assert rc == 0
    rc = cli.main(base + ["--ckpt", f"{ck1},{ck1}", "--json", jd,
                          "--out", str(tmp_path / "o2")])
    assert rc == 0
    ms, md = json.load(open(js)), json.load(open(jd))
    # the averaged program reorders float ops, which can flip the final
    # uint8 truncation on boundary pixels — identical up to that noise
    assert abs(ms["mean_rmse"] - md["mean_rmse"]) < 0.01
    # a genuine two-model ensemble runs and reports metrics
    rc = cli.main(base + ["--ckpt", f"{ck1},{ck2}", "--json", je,
                          "--out", str(tmp_path / "o3")])
    assert rc == 0
    assert json.load(open(je))["mean_rmse"] > 0


def test_parse_scene_weights_validation():
    """--scene-weight must reject bad input BEFORE training starts: a NaN
    weight passes PatchSampler's guards and only detonates in the
    prefetch worker (round-4 review finding)."""
    names = ["Art", "Cones", "Books"]
    assert cli.parse_scene_weights(None, names) is None
    assert cli.parse_scene_weights("", names) is None
    assert cli.parse_scene_weights("Art=3", names) == [3.0, 1.0, 1.0]
    assert cli.parse_scene_weights("Cones=2,Books=0.5", names) == \
        [1.0, 2.0, 0.5]
    for bad in ("Art", "Art=", "=2", "Art=abc", "Art=nan", "Art=inf",
                "Art=-1", "NotAScene=2", "Art=1,Art=2"):
        with pytest.raises(SystemExit):
            cli.parse_scene_weights(bad, names)


def test_scale_conditioned_train_eval(tmp_path):
    """codon_sc end to end: train with the constant scale/16 depth channel
    (sampler cond), then eval --scale-cond — the conditioned model's
    2-channel stem runs the whole pipeline (VERDICT r4 item 1 arm b)."""
    data = str(tmp_path / "data")
    _tiny_dataset(data)
    ck = str(tmp_path / "sc.npz")
    rc = cli.main(["train", "--scale", "4", "--data-dir", data,
                   "--variant", "codon_sc", "--scale-cond", "--steps", "2",
                   "--patch", "16", "--batch", "2", "--ckpt-out", ck,
                   "--log-every", "1", "--dtype", "fp32"])
    assert rc == 0
    j = str(tmp_path / "sc.json")
    rc = cli.main(["eval", "--scale", "4", "--data-dir", data,
                   "--variant", "codon_sc", "--scale-cond", "--ckpt", ck,
                   "--batch", "2", "--no-save", "--dtype", "fp32",
                   "--pad-multiple", "8", "--json", j, "--tta"])
    assert rc == 0
    m = json.load(open(j))
    assert np.isfinite(m["mean_rmse"]) and m["mean_rmse"] > 0

    from codon_tpu.models.variants import get_variant
    v = get_variant("codon_sc")
    assert v.init(__import__("jax").random.PRNGKey(0))["input"].shape == \
        (3, 3, 2, 64)


def test_export_scale_cond(tmp_path):
    """export --scale-cond bakes the conditioning plane into the codon_sc
    artifact: callers feed 1-channel depth and get the conditioned net."""
    data = str(tmp_path / "data")
    _tiny_dataset(data)
    ck = str(tmp_path / "sc.npz")
    rc = cli.main(["train", "--scale", "4", "--data-dir", data,
                   "--variant", "codon_sc", "--scale-cond", "--steps", "2",
                   "--patch", "16", "--batch", "2", "--ckpt-out", ck,
                   "--log-every", "1", "--dtype", "fp32"])
    assert rc == 0
    art = str(tmp_path / "sc.codonx")
    rc = cli.main(["export", "--ckpt", ck, "--out", art, "--height", "24",
                   "--width", "20", "--dtype", "fp32", "--variant",
                   "codon_sc", "--scale", "4", "--scale-cond"])
    assert rc == 0
    from codon_tpu.serve import load_exported
    fn = load_exported(art)
    rng = np.random.RandomState(0)
    d = rng.rand(1, 24, 20, 1).astype(np.float32)
    c = rng.rand(1, 24, 20, 1).astype(np.float32)
    out = np.asarray(fn(d, c))
    assert out.shape == (1, 24, 20, 1) and np.isfinite(out).all()


def test_scale_cond_warm_start_widens_stem(tmp_path, capsys):
    """train --variant codon_sc --ckpt-in <1-channel ancestor> widens the
    stem function-preservingly (zero conditioning slice) instead of
    failing on the shape mismatch — the recovery path for the from-
    scratch sc collapse (ROUND5.md session 4)."""
    data = str(tmp_path / "data")
    _tiny_dataset(data)
    anc = str(tmp_path / "anc.npz")
    rc = cli.main(["train", "--scale", "4", "--data-dir", data,
                   "--variant", "codon_x16", "--steps", "2",
                   "--patch", "16", "--batch", "2", "--ckpt-out", anc,
                   "--log-every", "1", "--dtype", "fp32"])
    assert rc == 0
    ck = str(tmp_path / "sc.npz")
    rc = cli.main(["train", "--scale", "4", "--data-dir", data,
                   "--variant", "codon_sc", "--scale-cond", "--steps", "2",
                   "--patch", "16", "--batch", "2", "--ckpt-in", anc,
                   "--ckpt-out", ck, "--log-every", "1", "--dtype", "fp32",
                   "--clip-norm", "5.0"])
    assert rc == 0
    assert "widened 1-channel stem" in capsys.readouterr().out
    from codon_tpu.checkpoint import load_npz
    assert load_npz(ck)["input"].shape == (3, 3, 2, 64)
