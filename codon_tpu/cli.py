"""codon_tpu command-line driver.

One CLI replacing the reference's three per-scale test.py scripts
(/root/reference/CODON_X4/test.py etc.), minus their bugs: no fix_pic
NameError (test.py:139), RMSE always computed on the freshly-produced output
(the X16 driver scored archived PNGs instead — CODON_X16/test.py:143), and
dataset paths are flags instead of commented-out hardcoded strings.

Subcommands
-----------
eval     run a model over a scale directory, write PNGs, report RMSE/SSIM
train    train a model on synthesized degradation pairs
golden   score the reference's archived output/ PNGs (reproduces BASELINE.md)
convert  torch .pth -> native .npz checkpoint
info     print model/param summary and device info
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np


def _build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="codon_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("eval", help="run the model over a dataset")
    e.add_argument("--scale", type=int, choices=(4, 8, 16), default=4)
    e.add_argument("--data-root", default="/root/reference",
                   help="directory containing CODON_X{scale}/")
    e.add_argument("--data-dir", default=None,
                   help="explicit scale dir (overrides --data-root)")
    e.add_argument("--ckpt", default=None,
                   metavar="CKPT[,CKPT...]",
                   help=".npz or .pth checkpoint; random init if omitted. "
                        "Comma-separated list = model ensemble (outputs "
                        "averaged; composes with --tta)")
    e.add_argument("--batch", type=int, default=4)
    e.add_argument("--dtype", choices=("bf16", "fp32", "fp16", "int8"),
                   default="bf16",
                   help="int8: dynamic-scale W8A8 convs on the MXU (~1.3x "
                        "throughput; pair with a QAT-fine-tuned checkpoint)")
    e.add_argument("--pad-multiple", type=int, default=32)
    e.add_argument("--out", default="CODON_result_save")
    e.add_argument("--no-save", action="store_true")
    e.add_argument("--log", default=None, help="tee stdout to this file")
    e.add_argument("--variant", default="codon",
                   help="model variant name (see models.variants registry); "
                        "with --ckpt a,b ensembles, accepts a matching "
                        "comma list for mixed-architecture members "
                        "(single name = all members share it)")
    e.add_argument("--tile-devices", type=int, default=0,
                   help=">1: spatially-tiled inference over N devices "
                        "(the image H axis sharded, halo-exchange convs, "
                        "psum'd CAC stats)")
    e.add_argument("--dp-devices", type=int, default=0,
                   help=">1: batch data-parallel inference over N devices "
                        "(the DataParallel analog; composable with "
                        "--tile-devices into a dp x sp mesh)")
    e.add_argument("--resume", action="store_true",
                   help="skip images whose output PNG already exists")
    e.add_argument("--json", default=None,
                   help="write a structured metrics summary to this file")
    e.add_argument("--profile", default=None,
                   help="capture a jax.profiler trace into this directory")
    e.add_argument("--check-nans", action="store_true",
                   help="enable jax debug_nans (fail fast on NaN/inf)")
    e.add_argument("--tta", action="store_true",
                   help="geometric self-ensemble: average the forward over "
                        "the 4 flip transforms (id/H/V/HV), inverse-mapped "
                        "— 4x compute for a standard SR quality bump; "
                        "flips only (no rot90) so padded mixed-size "
                        "batches and masks stay valid")
    e.add_argument("--tta8", action="store_true",
                   help="full dihedral self-ensemble (the 4 flips plus "
                        "their transposes, 8 transforms, 8x compute); "
                        "implies --tta")
    e.add_argument("--scale-cond", action="store_true",
                   help="append the constant scale/16 conditioning "
                        "channel to the depth input (codon_sc variants)")
    e.add_argument("--device-metrics", action="store_true",
                   help="compute RMSE/SSIM on device inside the forward jit "
                        "(scalars are the only D2H traffic; RMSE exact, "
                        "SSIM zero-padded at image boundaries of padded "
                        "batches — see metrics/ondevice.py)")

    t = sub.add_parser("train", help="train a model on synthesized pairs")
    t.add_argument("--scale", type=int, choices=(4, 8, 16), default=4)
    t.add_argument("--data-root", default="/root/reference")
    t.add_argument("--data-dir", default=None)
    t.add_argument("--variant", default="codon")
    t.add_argument("--steps", type=int, default=2000)
    t.add_argument("--patch", type=int, default=64)
    t.add_argument("--batch", type=int, default=16)
    t.add_argument("--lr", type=float, default=1e-4)
    t.add_argument("--warmup", type=int, default=0,
                   help=">0: warmup+cosine schedule over --steps")
    t.add_argument("--loss", choices=("l1", "l2"), default="l1")
    t.add_argument("--grad-loss", type=float, default=0.0,
                   help=">0: add this weight of masked gradient-domain "
                        "L1 (edge supervision) to the pixel loss")
    t.add_argument("--weight-decay", type=float, default=0.0,
                   help="decoupled weight decay (regularizer for tiny "
                        "training sets, e.g. holdout runs)")
    t.add_argument("--clip-norm", type=float, default=0.0,
                   help=">0: clip the global gradient norm before the "
                        "optimizer update — guards against the spike-"
                        "driven dead-ReLU collapse that killed the first "
                        "scale-conditioned joint run (grad_norm 751 at "
                        "step 1, total ReLU death by step ~7k)")
    t.add_argument("--dtype", choices=("bf16", "fp32", "fp16"),
                   default="bf16")
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--ckpt-in", default=None, help="warm start from .npz")
    t.add_argument("--ckpt-out", default="codon_trained.npz")
    t.add_argument("--log-every", type=int, default=100)
    t.add_argument("--check-nans", action="store_true",
                   help="enable jax debug_nans (fail fast on NaN/inf)")
    t.add_argument("--exclude", default="",
                   help="comma-separated image names to hold out of "
                        "training (for held-out evaluation)")
    t.add_argument("--mix-scales", action="store_true",
                   help="also train on the SHIPPED degradations of the "
                        "same scenes from the other scale dirs (x4/x8/"
                        "x16 input_depth under --data-root) — 3x real "
                        "degradation pairs per scene, unlike re-"
                        "synthesized pyramids (which mismatched the "
                        "shipped degradation and regressed)")
    t.add_argument("--edge-bias", type=float, default=0.0,
                   help="probability in (0,1] that a training patch is "
                        "centered (with jitter) on a depth-discontinuity "
                        "pixel instead of uniformly placed — targets the "
                        "thin-structure error masked RMSE concentrates on")
    t.add_argument("--scene-weight", default=None,
                   help="comma list Name=W of per-scene sampling weights "
                        "(unlisted scenes weigh 1.0), e.g. Art=3 to "
                        "oversample a scene a shipping fine-tune must "
                        "not regress")
    t.add_argument("--collage", type=float, default=0.0,
                   help="probability in [0,1] that a training patch gets "
                        "a depth-collage paste from another scene "
                        "(synthetic thin-structure discontinuities with "
                        "seam-consistent degradation — the data-axis "
                        "lever for texture-hard scenes)")
    t.add_argument("--scale-cond", action="store_true",
                   help="append a constant scale/16 channel to the depth "
                        "input (use with --variant codon_sc and "
                        "--mix-scales: ONE model trained jointly on all "
                        "three shipped degradations, conditioned on "
                        "which one it sees)")
    t.add_argument("--augment", choices=("full", "flips", "none"),
                   default="full",
                   help="patch augmentation: full = flips+rot90+photometric"
                        " guidance jitter+depth affine (generalization "
                        "recipe); flips = geometric only")
    t.add_argument("--orbax-dir", default=None,
                   help="production checkpointing: async orbax saves of "
                        "{params, opt_state, step} every --save-every "
                        "steps into this directory (keep-last-3, atomic), "
                        "resuming from the latest step if one exists")
    t.add_argument("--save-every", type=int, default=500)
    t.add_argument("--no-handoff", action="store_true",
                   help="with --qat-static: drop the int8 gate/stem "
                        "handoff grids (Ops.roundtrip sites) from the "
                        "calibration — pure conv-site quantization; "
                        "slightly slower deployment, measurably better "
                        "RMSE on edge-heavy scenes at x4")
    t.add_argument("--qat-static", action="store_true",
                   help="QAT on FROZEN per-channel static activation "
                        "scales: calibrates scales on full frames first, "
                        "fine-tunes weights on that grid, and saves the "
                        "scales into the checkpoint (eval --dtype int8 "
                        "then runs the fast static path)")
    t.add_argument("--qat", action="store_true",
                   help="quantization-aware fine-tuning (fake-quant convs; "
                        "deploy with eval --dtype int8)")
    t.add_argument("--ema", type=float, default=0.0, metavar="DECAY",
                   help="maintain a Polyak/EMA average of the weights "
                        "(e.g. 0.999) and save it alongside --ckpt-out "
                        "as <out>_ema.npz; evaluate THAT checkpoint for "
                        "the smoothed-weights quality lever")

    g = sub.add_parser("golden", help="score archived reference outputs")
    g.add_argument("--scale", type=int, choices=(4, 8, 16), default=4)
    g.add_argument("--data-root", default="/root/reference")

    c = sub.add_parser("convert", help="torch .pth -> .npz")
    c.add_argument("--pth", required=True)
    c.add_argument("--npz", required=True)
    c.add_argument("--no-dead-heads", action="store_true",
                   help="X16-style checkpoints without attention_{c5,s5}")

    x = sub.add_parser("export",
                       help="AOT-export the forward (weights baked in) as "
                            "a StableHLO serving artifact, batch-"
                            "polymorphic; platform = current backend")
    x.add_argument("--ckpt", required=True)
    x.add_argument("--out", required=True)
    x.add_argument("--variant", default="codon")
    x.add_argument("--height", type=int, default=370)
    x.add_argument("--width", type=int, default=463)
    x.add_argument("--dtype", choices=("bf16", "fp32", "int8"),
                   default="bf16")
    x.add_argument("--mask", action="store_true",
                   help="artifact takes a validity-mask input "
                        "(padded-batch serving)")
    x.add_argument("--tta", action="store_true",
                   help="bake the 4-flip self-ensemble into the artifact "
                        "(batched lowering)")
    x.add_argument("--tta8", action="store_true",
                   help="bake the full 8-transform dihedral self-ensemble "
                        "(quality-flagship serving config when combined "
                        "with --dtype int8); implies --tta")
    x.add_argument("--scale", type=int, choices=(4, 8, 16), default=4,
                   help="upsampling factor baked into --scale-cond "
                        "artifacts")
    x.add_argument("--scale-cond", action="store_true",
                   help="bake the constant scale/16 conditioning plane "
                        "into the artifact (codon_sc variants; callers "
                        "still feed 1-channel depth)")

    i = sub.add_parser("info", help="model + device summary")
    i.add_argument("--variant", default="codon")
    return p


def _scale_dir(args) -> str:
    if getattr(args, "data_dir", None):
        return args.data_dir
    return os.path.join(args.data_root, f"CODON_X{args.scale}")


def _load_params(args, variant):
    import jax
    from codon_tpu.checkpoint import load_npz, load_pth

    if args.ckpt is None:
        print("WARNING: no --ckpt given; using random init "
              "(outputs will not match the reference).")
        return variant.init(jax.random.PRNGKey(0))
    if args.ckpt.endswith(".pth"):
        params, epoch = load_pth(args.ckpt, variant.cfg)
        print(f"loaded torch checkpoint {args.ckpt} (epoch {epoch})")
        return params
    params = load_npz(args.ckpt)
    print(f"loaded native checkpoint {args.ckpt}")
    return params


def cmd_eval(args) -> int:
    import jax
    from codon_tpu.core.params import DTYPE_POLICIES
    from codon_tpu.data.io import discover_pairs, imwrite_gray
    from codon_tpu.data.pipeline import batched_loader
    from codon_tpu.metrics import masked_rmse, ssim_exact
    from codon_tpu.models.variants import get_variant
    from codon_tpu.utils.logging import Logger

    if getattr(args, "check_nans", False):
        jax.config.update("jax_debug_nans", True)

    log_ctx = Logger(args.log) if args.log else None
    if log_ctx:
        log_ctx.__enter__()
    try:
        scale_dir = _scale_dir(args)
        dtypes = DTYPE_POLICIES[args.dtype]
        vnames = args.variant.split(",")
        variant = get_variant(vnames[0], dtypes=dtypes)

        def make_ops(act_scales, verbose=True):
            if args.dtype != "int8":
                return None
            if act_scales is not None:
                from codon_tpu.quant_ops import Int8StaticOps
                if verbose:
                    print(f"int8: static per-channel scales from checkpoint "
                          f"({len(act_scales)} conv sites)")
                return Int8StaticOps(
                    act_scales,
                    compute_dtype=variant.cfg.dtypes.compute_dtype)
            from codon_tpu.quant_ops import Int8Ops
            if verbose:
                print("int8: dynamic per-sample scales (checkpoint carries "
                      "no act_scales; train --qat-static to add them)")
            return Int8Ops()

        member_specs = []   # [(params, act_scales, variant)] — 1 = solo
        if args.ckpt and "," in args.ckpt:
            import argparse as _ap
            ckpts = args.ckpt.split(",")
            if len(vnames) not in (1, len(ckpts)):
                raise SystemExit(
                    f"--variant lists {len(vnames)} names for "
                    f"{len(ckpts)} --ckpt members (give 1 or {len(ckpts)})")
            member_variants = [get_variant(v, dtypes=dtypes) for v in
                               (vnames * len(ckpts) if len(vnames) == 1
                                else vnames)]
            for ck, mv in zip(ckpts, member_variants):
                sub_args = _ap.Namespace(**{**vars(args), "ckpt": ck})
                p = _load_params(sub_args, mv)
                member_specs.append(
                    (p, p.pop("act_scales", None)
                     if isinstance(p, dict) else None, mv))
            print(f"ensemble: averaging {len(member_specs)} models"
                  + (f" [{', '.join(v.name for v in member_variants)}]"
                     if len(vnames) > 1 else ""))
        else:
            if len(vnames) > 1:
                raise SystemExit("--variant lists multiple names but "
                                 "--ckpt is not an ensemble")
            p = _load_params(args, variant)
            member_specs.append(
                (p, p.pop("act_scales", None)
                 if isinstance(p, dict) else None, variant))
        params, act_scales, _ = member_specs[0]
        ensemble = member_specs if len(member_specs) > 1 else None
        if args.dtype == "int8" and ensemble is not None:
            # per-member backends are built inside raw_fwd; a single
            # make_ops banner keyed to member 0 would misdescribe the run
            modes = ["static" if sc is not None else "dynamic"
                     for _, sc, _ in member_specs]
            print(f"int8: per-member scales [{', '.join(modes)}]")
            eval_ops = None
        else:
            eval_ops = make_ops(act_scales)
        names = discover_pairs(scale_dir)
        print(f"eval x{args.scale}: {len(names)} images from {scale_dir} "
              f"[{args.dtype}, batch={args.batch}, variant={args.variant}]")

        if getattr(args, "resume", False) and not args.no_save:
            done = {n for n in names
                    if os.path.exists(os.path.join(args.out, n + ".png"))}
            if done:
                print(f"resume: skipping {len(done)} already-written images")
            names = [n for n in names if n not in done]
            if not names:
                print("resume: nothing to do")
                if getattr(args, "json", None):
                    # keep scripted pipelines honest: write a summary with
                    # the NORMAL schema (metric keys present, null) instead
                    # of leaving a stale file or a key-missing stub
                    with open(args.json, "w") as f:
                        json.dump({"scale": args.scale, "images": 0,
                                   "resumed_all": True,
                                   "img_per_sec_steady": None,
                                   "mean_rmse": None, "mean_ssim": None,
                                   "img_per_sec_e2e": None,
                                   "img_per_sec_compute": None,
                                   "tta_transforms": 0,
                                   "per_image": []}, f, indent=2)
                    print(f"metrics written to {args.json}")
                return 0

        dp = max(1, getattr(args, "dp_devices", 0))
        sp = max(1, args.tile_devices)
        if ensemble is not None and getattr(args, "device_metrics", False):
            raise SystemExit("--ckpt ensembles are not supported with "
                             "--device-metrics")
        if dp > 1 or sp > 1:
            from codon_tpu.parallel.tiling import make_tiled_forward

            def make_mesh_fwd(static, mv):
                # tiled/dp int8 keeps the quantized path (round-1 bug:
                # the mesh branch silently fell back to bf16). Static
                # scales are NOT closed over: scales_factory rebuilds the
                # backend from params["act_scales"] at call time, so the
                # member's weights AND scales ride the jit as arguments
                # and the compiled program is checkpoint-agnostic.
                ops_factory = None
                scales_factory = None
                if args.dtype == "int8":
                    cdt = mv.cfg.dtypes.compute_dtype
                    if static:
                        from codon_tpu.quant_ops import (Int8StaticOps,
                                                         Int8StaticShardedOps)

                        def scales_factory(scales, axis_name, **kw):
                            if axis_name:
                                return Int8StaticShardedOps(
                                    scales, axis_name=axis_name,
                                    compute_dtype=cdt, **kw)
                            return Int8StaticOps(scales, compute_dtype=cdt)
                    else:
                        from codon_tpu.quant_ops import Int8ShardedOps
                        ops_factory = Int8ShardedOps
                return make_tiled_forward(
                    mv, sp, dp, ops_factory=ops_factory,
                    local_ops=None if static else make_ops(None,
                                                           verbose=False),
                    scales_factory=scales_factory)

            int8_static = [args.dtype == "int8" and sc is not None
                           for _, sc, _ in member_specs]
            member_fwds = [make_mesh_fwd(st, mv) for st, (_, _, mv)
                           in zip(int8_static, member_specs)]
            # scales ride each member's params dict (see make_mesh_fwd)
            params = [dict(mp, act_scales=sc) if st else mp
                      for st, (mp, sc, _) in zip(int8_static, member_specs)]
            print(f"mesh eval: dp={dp} x sp={sp} over "
                  f"{dp * sp} devices"
                  + (f", {len(member_fwds)}-model ensemble"
                     if ensemble else ""))

            def raw_fwd(plist, d, c, m):
                outs = [f(p, d, c, m) for p, f in zip(plist, member_fwds)]
                return sum(outs) / len(outs)
        elif ensemble is not None:
            # members ride the jit as ONE list-pytree argument (scales
            # included), so ensemble programs are also checkpoint-
            # agnostic and compile-cached per (member-count, dtype,
            # shape) family
            member_vs = [mv for _, _, mv in member_specs]
            if args.dtype == "int8":
                from codon_tpu.quant_ops import Int8Ops, Int8StaticOps
                cdt = variant.cfg.dtypes.compute_dtype
                params = [dict(mp, act_scales=sc) if sc is not None
                          else dict(mp) for mp, sc, _ in member_specs]

                def raw_fwd(plist, d, c, m):
                    outs = []
                    for p, mv in zip(plist, member_vs):
                        p = dict(p)
                        sc = p.pop("act_scales", None)
                        mo = (Int8StaticOps(sc, compute_dtype=cdt)
                              if sc is not None else Int8Ops())
                        outs.append(mv.forward(p, d, c, mask=m, ops=mo))
                    return sum(outs) / len(outs)
            else:
                params = [mp for mp, _, _ in member_specs]

                def raw_fwd(plist, d, c, m):
                    outs = [mv.forward(p, d, c, mask=m, ops=eval_ops)
                            for p, mv in zip(plist, member_vs)]
                    return sum(outs) / len(outs)
        elif args.dtype == "int8" and act_scales is not None:
            # scales ride the params pytree as jit ARGUMENTS, not closure
            # constants: the compiled program (and the persistent compile
            # cache entry) is then shared by every checkpoint of the same
            # shape family instead of recompiling per checkpoint (the
            # remote compile service makes that minutes per eval)
            from codon_tpu.quant_ops import Int8StaticOps
            params = dict(params)
            params["act_scales"] = act_scales
            cdt = variant.cfg.dtypes.compute_dtype

            def raw_fwd(p, d, c, m):
                p = dict(p)
                sc = p.pop("act_scales")
                return variant.forward(
                    p, d, c, mask=m,
                    ops=Int8StaticOps(sc, compute_dtype=cdt))
        else:
            def raw_fwd(p, d, c, m):
                return variant.forward(p, d, c, mask=m, ops=eval_ops)

        # clip+quantize ON DEVICE: the tunneled D2H link is slow (~30MB/s);
        # uint8 is 4x smaller than f32 and matches the reference's
        # (clip(out,0,1)*255).astype(uint8) truncation (CODON_X4/test.py:130)
        import jax.numpy as jnp

        if getattr(args, "scale_cond", False):
            # scale-conditioned variants (codon_sc): the depth stem takes
            # (depth, constant scale/16 plane). Innermost wrapper so TTA
            # flips the 1-channel depth and the constant plane is added
            # after (a constant is flip/transpose-invariant); the forward
            # masks x before the stem, so padded rows zero out as usual.
            _cond_inner = raw_fwd
            _cond_val = args.scale / 16.0

            def raw_fwd(p, d, c, m):
                plane = jnp.full_like(d[..., :1], _cond_val)
                return _cond_inner(p, jnp.concatenate([d, plane], -1),
                                   c, m)
            print(f"scale conditioning: constant channel {_cond_val}")

        tta_n = 8 if getattr(args, "tta8", False) else (
            4 if getattr(args, "tta", False) else 0)
        if tta_n:
            from codon_tpu.models.tta import make_tta_forward
            raw_fwd = make_tta_forward(raw_fwd, transforms=tta_n)
            print(f"tta: {tta_n}-transform geometric self-ensemble")

        @jax.jit
        def fwd_u8(p, d, c, m):
            out = raw_fwd(p, d, c, m)
            return (jnp.clip(out[..., 0], 0.0, 1.0) * 255).astype(jnp.uint8)

        profile_ctx = None
        if getattr(args, "profile", None):
            jax.profiler.start_trace(args.profile)
            profile_ctx = args.profile

        evaluator = None
        if getattr(args, "device_metrics", False):
            if dp > 1 or sp > 1:
                raise SystemExit("--device-metrics is a single-device "
                                 "path; drop --dp-devices/--tile-devices")
            from codon_tpu.metrics.ondevice import make_batch_evaluator
            # threads the TTA wrapper and the quantized Ops backend into
            # the fused evaluator (round-2 advisor: the combination used
            # to silently score the plain bf16 forward). Static scales go
            # in via scales_to_ops + params["act_scales"] (already
            # embedded by the int8-static branch above) so the compiled
            # evaluator is checkpoint-agnostic like the main path.
            scales_to_ops = None
            if args.dtype == "int8" and act_scales is not None:
                from codon_tpu.quant_ops import Int8StaticOps
                _cdt = variant.cfg.dtypes.compute_dtype

                def scales_to_ops(sc):
                    return Int8StaticOps(sc, compute_dtype=_cdt)
            evaluator = make_batch_evaluator(
                variant, tta=tta_n,
                ops=None if scales_to_ops is not None else eval_ops,
                scales_to_ops=scales_to_ops)

        rmse_sum = ssim_sum = 0.0
        per_image = []
        n = 0
        t_total = t_compute = 0.0
        batch_times = []
        t0_all = time.time()
        for batch in batched_loader(scale_dir, names, args.batch,
                                    args.pad_multiple):
            t0 = time.time()
            if evaluator is not None and batch.label_dev is not None:
                # mask=None passes through: the evaluator's exact unmasked
                # SSIM path (a fabricated all-ones mask would force the
                # ~1e-7-off normalized-convolution branch)
                stats = evaluator(params, batch.depth, batch.color,
                                  batch.mask, batch.label_dev)
                rmse_v = np.asarray(stats["rmse"])
                ssim_v = np.asarray(stats["ssim"])
                out = (np.asarray(stats["out_u8"])
                       if not args.no_save else None)
                t_compute += time.time() - t0
                batch_times.append((time.time() - t0, len(batch.names)))
                for i, name in enumerate(batch.names):
                    h, w = batch.sizes[i]
                    if out is not None:
                        imwrite_gray(os.path.join(args.out, name + ".png"),
                                     out[i, :h, :w])
                    r, s = float(rmse_v[i]), float(ssim_v[i])
                    rmse_sum += r
                    ssim_sum += s
                    n += 1
                    per_image.append({"name": name, "rmse": r, "ssim": s})
                    print(f"{name}.png {r} {s}")
                continue
            out = np.asarray(fwd_u8(params, batch.depth, batch.color,
                                    batch.mask))
            t_compute += time.time() - t0
            batch_times.append((time.time() - t0, len(batch.names)))
            for i, name in enumerate(batch.names):
                h, w = batch.sizes[i]
                img_u8 = out[i, :h, :w]
                if not args.no_save:
                    imwrite_gray(os.path.join(args.out, name + ".png"),
                                 img_u8)
                label = batch.labels[i]
                if label is not None:
                    r = masked_rmse(label, img_u8)
                    s = ssim_exact(label / 255, img_u8 / 255)
                    rmse_sum += r
                    ssim_sum += s
                    n += 1
                    per_image.append({"name": name, "rmse": r, "ssim": s})
                    print(f"{name}.png {r} {s}")
        t_total = time.time() - t0_all
        if profile_ctx:
            jax.profiler.stop_trace()
            print(f"profiler trace written to {profile_ctx}")
        # steady-state throughput: the first batch pays XLA compile and
        # the (minutes-long, on tunneled platforms) executable load
        steady = None
        if len(batch_times) > 1:
            dt = sum(t for t, _ in batch_times[1:])
            imgs = sum(k for _, k in batch_times[1:])
            steady = imgs / dt if dt > 0 else None
        summary = {
            "scale": args.scale, "images": len(names),
            "img_per_sec_steady": steady,
            "mean_rmse": rmse_sum / n if n else None,
            "mean_ssim": ssim_sum / n if n else None,
            "img_per_sec_e2e": len(names) / t_total if t_total else None,
            "img_per_sec_compute": (len(names) / t_compute
                                    if t_compute else None),
            "tta_transforms": tta_n,
            "per_image": per_image,
        }
        if n:
            print(n)
            print(rmse_sum / n, ssim_sum / n)
        print(f"images/sec (end-to-end): {summary['img_per_sec_e2e']:.3f}  "
              f"(compute+D2H only: {summary['img_per_sec_compute']:.3f})")
        if steady:
            print(f"images/sec (steady-state, first batch excluded: it "
                  f"pays compile + executable load): {steady:.3f}")
        if getattr(args, "json", None):
            with open(args.json, "w") as f:
                json.dump(summary, f, indent=2)
            print(f"metrics written to {args.json}")
        return 0
    finally:
        if log_ctx:
            log_ctx.__exit__(None, None, None)


def parse_scene_weights(spec, pair_names):
    """Parse `--scene-weight "Name=W[,Name=W...]"` into a weight list
    aligned with `pair_names` (1.0 where unnamed), or None for an empty
    spec. Validates eagerly — malformed entries, non-finite or negative
    weights, and unknown scene names all SystemExit BEFORE training
    starts (a NaN weight sails through PatchSampler's sum/negativity
    guards and would only blow up in the prefetch worker after dataset
    load and jit setup)."""
    if not spec:
        return None
    wmap = {}
    for item in spec.split(","):
        k, sep, v = item.partition("=")
        if not sep or not k.strip():
            raise SystemExit(f"--scene-weight expects Name=W[,..], "
                             f"got {item!r}")
        try:
            w = float(v)
        except ValueError:
            raise SystemExit(f"--scene-weight: bad weight {v!r} "
                             f"for {k.strip()!r}")
        if not math.isfinite(w) or w < 0:
            raise SystemExit(f"--scene-weight: weight for {k.strip()!r} "
                             f"must be finite and >= 0, got {w}")
        if k.strip() in wmap:
            raise SystemExit(f"--scene-weight: {k.strip()!r} appears "
                             f"twice in the spec")
        wmap[k.strip()] = w
    unknown = set(wmap) - set(pair_names)
    if unknown:
        raise SystemExit(f"--scene-weight names not in the training "
                         f"set: {sorted(unknown)}")
    print(f"scene weights: {wmap} over {len(pair_names)} pairs")
    return [wmap.get(n, 1.0) for n in pair_names]


def cmd_train(args) -> int:
    import jax
    from codon_tpu.checkpoint import load_npz, save_npz
    from codon_tpu.data.io import discover_pairs, imread_gray
    from codon_tpu.models.variants import get_variant
    from codon_tpu.train.data import PatchSampler
    from codon_tpu.train.trainer import TrainConfig, make_train_step

    if getattr(args, "check_nans", False):
        jax.config.update("jax_debug_nans", True)

    scale_dir = _scale_dir(args)
    names = discover_pairs(scale_dir)
    excluded = {n.strip() for n in args.exclude.split(",") if n.strip()}
    if excluded:
        missing = excluded - set(names)
        if missing:
            raise SystemExit(f"--exclude names not in dataset: {missing}")
        names = [n for n in names if n not in excluded]
        print(f"holding out: {sorted(excluded)}")
    pair_names = list(names)   # one entry per (label, color, degraded) pair
    pair_scales = [args.scale] * len(names)
    labels, colors, degraded = [], [], []
    for n in names:
        labels.append(imread_gray(os.path.join(scale_dir, "input_label",
                                               n + ".png")))
        colors.append(imread_gray(os.path.join(scale_dir, "input_color",
                                               n + ".png")))
        dpath = os.path.join(scale_dir, "input_depth", n + ".png")
        if os.path.exists(dpath):
            degraded.append(imread_gray(dpath))
    use_real = len(degraded) == len(labels)
    if getattr(args, "mix_scales", False):
        if not use_real:
            raise SystemExit("--mix-scales needs shipped input_depth for "
                             "the primary scale")
        if getattr(args, "data_dir", None):
            # the cross-scale dirs are derived from data_root; pooling a
            # --data-dir override's labels with data_root's degradations
            # would silently mix datasets on any name collision
            raise SystemExit("--mix-scales derives the other-scale dirs "
                             "from --data-root and cannot be combined "
                             "with a --data-dir override")
        added, skipped = 0, 0
        for s in (4, 8, 16):
            if s == args.scale:
                continue
            sdir = os.path.join(args.data_root, f"CODON_X{s}")
            for i, n in enumerate(names):
                dpath = os.path.join(sdir, "input_depth", n + ".png")
                if os.path.exists(dpath):
                    deg = imread_gray(dpath)
                    if deg.shape != labels[i].shape:
                        skipped += 1
                        continue
                    labels.append(labels[i])
                    colors.append(colors[i])
                    degraded.append(deg)
                    pair_names.append(n)
                    pair_scales.append(s)
                    added += 1
        print(f"mix-scales: +{added} shipped degradation pairs from the "
              f"other scale dirs"
              + (f" ({skipped} skipped: shape mismatch vs primary label)"
                 if skipped else ""))
    print(f"train x{args.scale}: {len(labels)} source images, "
          f"patch={args.patch} batch={args.batch} steps={args.steps} "
          f"[{'shipped input_depth' if use_real else 'synthesized'} "
          f"degradation]")

    import dataclasses
    from codon_tpu.core.params import DTYPE_POLICIES
    variant = get_variant(args.variant, dtypes=DTYPE_POLICIES[args.dtype])
    if hasattr(variant.cfg, "loop_impl"):
        # scan lowering: ~5x smaller fwd+bwd HLO, much faster compiles
        variant = dataclasses.replace(
            variant, cfg=dataclasses.replace(variant.cfg,
                                             loop_impl="scan"))
    params = (load_npz(args.ckpt_in) if args.ckpt_in
              else variant.init(jax.random.PRNGKey(args.seed)))
    if (args.ckpt_in and getattr(variant.cfg, "in_channels", 1) == 2
            and params["input"].shape[2] == 1):
        # scale-conditioned warm start from a 1-channel ancestor: see
        # widen_stem_params (function-preserving zero pad; the
        # from-scratch alternative collapsed into total ReLU death).
        from codon_tpu.models.codon_net import widen_stem_params
        params = widen_stem_params(params, variant.cfg.in_channels)
        print(f"warm start: widened 1-channel stem -> "
              f"{params['input'].shape} with a zero conditioning slice "
              f"(function-preserving)")
    act_scales = (params.pop("act_scales", None)
                  if isinstance(params, dict) else None)
    if act_scales is not None and not getattr(args, "qat_static", False):
        print("WARNING: the input checkpoint carries act_scales (static "
              "int8 grid) but --qat-static is not set; the output "
              "checkpoint will NOT carry them and loses the fast "
              "static-int8 path. Re-run with --qat-static to keep it.")
    qat_ops = None
    if getattr(args, "qat_static", False) and args.qat:
        raise SystemExit("--qat-static and --qat are mutually exclusive "
                         "(frozen static grid vs dynamic scales); pick one")
    if getattr(args, "qat_static", False):
        if not args.ckpt_in:
            print("WARNING: --qat-static without --ckpt-in calibrates the "
                  "frozen activation grid from RANDOM-init statistics, "
                  "which caps int8 quality; warm-start from a trained "
                  "checkpoint instead.")
        from codon_tpu.data.pipeline import batched_loader
        from codon_tpu.quant_ops import (FakeQuantStaticOps,
                                         calibrate_act_scales)
        # calibrate on FULL frames with the eval-shaped (unrolled) forward:
        # scan would hide per-stage absmax inside the loop body, and eval
        # sees whole images, not training patches
        cal_variant = get_variant(args.variant,
                                  dtypes=DTYPE_POLICIES[args.dtype])

        if use_real:
            def cal_batches():
                for b in batched_loader(scale_dir, names, 2, 32):
                    yield b.depth, b.color, b.mask
        else:
            # synthesized-degradation datasets have no input_depth/ for
            # batched_loader; calibrate on full frames synthesized the
            # same way training pairs are
            from codon_tpu.train.data import synthesize_lr

            def cal_batches():
                for lab, col in zip(labels, colors):
                    d = synthesize_lr(lab, args.scale)
                    yield (d.astype(np.float32)[None, ..., None] / 255.0,
                           col.astype(np.float32)[None, ..., None] / 255.0,
                           None)

        act_scales = calibrate_act_scales(
            lambda p, d, c, ops, mask: cal_variant.forward(
                p, d, c, ops=ops, mask=mask),
            params, cal_batches())
        if getattr(args, "no_handoff", False):
            from codon_tpu.quant_ops import HANDOFF_SITES
            act_scales = {k: v for k, v in act_scales.items()
                          if k not in HANDOFF_SITES}
            print("no-handoff: dropped the roundtrip grids "
                  f"({len(act_scales)} conv sites kept)")
        qat_ops = FakeQuantStaticOps(act_scales)
        print(f"QAT-static: calibrated {len(act_scales)} conv sites on "
              f"{len(names)} full frames; training on the frozen grid")
    elif args.qat:
        from codon_tpu.quant_ops import FakeQuantOps
        qat_ops = FakeQuantOps()
        print("QAT: fake-quantized convs (int8 grid, dynamic scales)")
    step, tx = make_train_step(
        variant, TrainConfig(learning_rate=args.lr, loss=args.loss,
                             warmup_steps=args.warmup,
                             weight_decay=getattr(args, "weight_decay",
                                                  0.0),
                             clip_norm=(getattr(args, "clip_norm", 0.0)
                                        or None),
                             grad_weight=getattr(args, "grad_loss", 0.0),
                             total_steps=args.steps), ops=qat_ops)
    opt_state = tx.init(params)

    scene_weights = parse_scene_weights(
        getattr(args, "scene_weight", None), pair_names)
    sampler_src = PatchSampler(labels, colors, scale=args.scale,
                               patch=args.patch, batch=args.batch,
                               seed=args.seed, augment=args.augment,
                               degraded=degraded if use_real else None,
                               edge_bias=getattr(args, "edge_bias", 0.0),
                               scene_weights=scene_weights,
                               collage=getattr(args, "collage", 0.0),
                               cond=([s / 16.0 for s in pair_scales]
                                     if getattr(args, "scale_cond", False)
                                     else None))

    mgr = None
    start_step = 0
    if getattr(args, "orbax_dir", None):
        from codon_tpu.checkpoint import CheckpointManager
        from codon_tpu.checkpoint.orbax_io import device_tree
        mgr = CheckpointManager(args.orbax_dir, max_to_keep=3)
        latest = mgr.latest_step()
        if latest is not None:
            import numpy as _np
            # `like` restores straight into the live structures (optax
            # NamedTuples included) instead of generic nested dicts
            try:
                tree = mgr.restore(latest, like={
                    "params": params, "opt_state": opt_state,
                    "step": _np.zeros((), _np.int64)})
            except Exception as e:
                # most common cause: the checkpoint was written by a
                # different optimizer-chain layout (e.g. pre/post the
                # adamw decay-ordering fix, or a changed --weight-decay),
                # whose opt_state pytree no longer matches `like`
                raise SystemExit(
                    f"orbax: cannot restore step {latest} from "
                    f"{args.orbax_dir}: {e}\nThe saved opt_state tree "
                    f"must match the CURRENT optimizer chain — resume "
                    f"with the same flags/version that wrote it, or "
                    f"start a fresh --orbax-dir (warm-start weights via "
                    f"--ckpt-in instead).")
            params = device_tree(tree["params"])
            opt_state = device_tree(tree["opt_state"])
            start_step = int(tree["step"])
            print(f"orbax: resumed step {start_step} from {args.orbax_dir} "
                  f"(sampler stream resumes at the same step — batches "
                  f"match the uninterrupted run)")
        else:
            print(f"orbax: async checkpoints -> {args.orbax_dir} "
                  f"every {args.save_every} steps (keep-last-3)")

    # prefetch starts AFTER the orbax restore so the stream begins at the
    # restored step: batch i is a pure function of (seed, i), making an
    # interrupted+resumed run reproduce the uninterrupted one
    sampler = sampler_src.prefetch(2, start_step)

    ema_decay = getattr(args, "ema", 0.0)
    ema_params = None
    ema_update = None
    if ema_decay:
        if not 0.0 < ema_decay < 1.0:
            raise SystemExit(f"--ema must be in (0, 1), got {ema_decay}")
        # EMA starts AT the current weights (warm start or init), so no
        # zero-init debiasing is needed; on orbax resume it restarts from
        # the restored weights (the average stream is not checkpointed).
        ema_params = jax.tree_util.tree_map(lambda x: x + 0, params)
        ema_update = jax.jit(lambda e, p: jax.tree_util.tree_map(
            lambda ev, pv: ema_decay * ev + (1.0 - ema_decay) * pv, e, p))
        print(f"ema: decay {ema_decay} -> "
              f"{_ema_path(args.ckpt_out)}")

    from codon_tpu.train.trainer import CollapseDetector
    collapse = CollapseDetector()
    t0 = time.time()
    for i in range(start_step + 1, args.steps + 1):
        params, opt_state, m = step(params, opt_state, sampler.sample())
        if ema_update is not None:
            ema_params = ema_update(ema_params, params)
        if i % args.log_every == 0 or i == 1:
            loss = float(m["loss"])  # D2H sync point
            gnorm = float(m["grad_norm"])
            rate = (i - start_step) * args.batch / (time.time() - t0)
            print(f"step {i:6d}  loss {loss:.5f}  "
                  f"grad_norm {gnorm:.3f}  "
                  f"{rate:.0f} patches/s")
            if collapse.update(gnorm):
                # dead network: every remaining step is a no-op. Save the
                # state for post-mortem and fail the run loudly so chains
                # gate on it instead of shipping an identity model.
                sampler.close()
                if mgr is not None:
                    mgr.close()
                dead = args.ckpt_out + ".collapsed"
                save_npz(dead, params)
                raise SystemExit(
                    f"TRAIN COLLAPSE at step {i}: global grad norm has "
                    f"been exactly 0.0 for {collapse.patience} "
                    f"consecutive log intervals — the network is a dead-"
                    f"ReLU fixed point (output == residual passthrough) "
                    f"and cannot recover. State saved to {dead} for "
                    f"inspection. Retry with --clip-norm, a lower --lr, "
                    f"or a --ckpt-in warm start.")
        if mgr is not None and (i % args.save_every == 0
                                or i == args.steps):
            # async: training continues while the tree serializes
            import numpy as _np
            mgr.save(i, {"params": params, "opt_state": opt_state,
                         "step": _np.asarray(i, _np.int64)})
    sampler.close()
    if mgr is not None:
        mgr.close()
    if getattr(args, "qat_static", False) and act_scales is not None:
        # ship the frozen grid with the weights: eval --dtype int8 detects
        # act_scales and runs Int8StaticOps (no dynamic reductions)
        params = dict(params)
        params["act_scales"] = act_scales
        if ema_params is not None:
            ema_params = dict(ema_params)
            ema_params["act_scales"] = act_scales
    save_npz(args.ckpt_out, params)
    print(f"saved {args.ckpt_out}")
    if ema_params is not None:
        save_npz(_ema_path(args.ckpt_out), ema_params)
        print(f"saved {_ema_path(args.ckpt_out)}")
    return 0


def _ema_path(ckpt_out: str) -> str:
    base, ext = os.path.splitext(ckpt_out)
    return base + "_ema" + (ext or ".npz")


def cmd_golden(args) -> int:
    from codon_tpu.data.io import imread_gray
    from codon_tpu.metrics import masked_rmse, ssim_exact

    scale_dir = _scale_dir(args)
    out_dir = os.path.join(scale_dir, "output")
    names = sorted(os.path.splitext(f)[0] for f in os.listdir(out_dir)
                   if f.endswith(".png"))
    if not names:
        raise SystemExit(f"golden: no archived PNGs under {out_dir}")
    rmse_sum = ssim_sum = 0.0
    for name in names:
        out = imread_gray(os.path.join(out_dir, name + ".png"))
        label = imread_gray(os.path.join(scale_dir, "input_label",
                                         name + ".png"))
        r = masked_rmse(label, out)
        s = ssim_exact(label / 255, out / 255)
        rmse_sum += r
        ssim_sum += s
        print(f"{name}.png {r} {s}")
    print(len(names))
    print(rmse_sum / len(names), ssim_sum / len(names))
    return 0


def cmd_convert(args) -> int:
    from codon_tpu.checkpoint import load_pth, save_npz
    from codon_tpu.models.codon_net import CodonConfig

    cfg = CodonConfig(dead_heads=not args.no_dead_heads)
    params, epoch = load_pth(args.pth, cfg)
    save_npz(args.npz, params)
    print(f"converted {args.pth} (epoch {epoch}) -> {args.npz}")
    return 0


def cmd_export(args) -> int:
    from codon_tpu.checkpoint import load_npz
    from codon_tpu.core.params import DTYPE_POLICIES
    from codon_tpu.models.variants import get_variant
    from codon_tpu.serve import export_forward

    dtypes = DTYPE_POLICIES[args.dtype]
    variant = get_variant(args.variant, dtypes=dtypes)
    params = load_npz(args.ckpt)
    act_scales = (params.pop("act_scales", None)
                  if isinstance(params, dict) else None)
    ops = None
    if args.dtype == "int8":
        if act_scales is not None:
            from codon_tpu.quant_ops import Int8StaticOps
            ops = Int8StaticOps(
                act_scales,
                compute_dtype=variant.cfg.dtypes.compute_dtype)
            print(f"int8: static scales from checkpoint "
                  f"({len(act_scales)} sites) baked into the artifact")
        else:
            from codon_tpu.quant_ops import Int8Ops
            ops = Int8Ops()
            print("int8: dynamic per-sample scales")
    tta_n = (8 if getattr(args, "tta8", False)
             else 4 if getattr(args, "tta", False) else 0)
    n = export_forward(variant, params, (args.height, args.width),
                       args.out, ops=ops, mask=args.mask, tta=tta_n,
                       scale_cond=(args.scale / 16.0
                                   if getattr(args, "scale_cond", False)
                                   else None))
    import jax
    print(f"exported {args.variant} {args.width}x{args.height} "
          f"[{args.dtype}{f'+tta{tta_n}' if tta_n else ''}] "
          f"for platform '{jax.default_backend()}' "
          f"-> {args.out} ({n / 1e6:.1f} MB)")
    return 0


def cmd_info(args) -> int:
    import jax
    from codon_tpu.core.params import param_count
    from codon_tpu.models.variants import get_variant, list_variants

    print(f"jax backend: {jax.default_backend()}, devices: {jax.devices()}")
    variant = get_variant(args.variant)
    params = variant.init(jax.random.PRNGKey(0))
    print(f"variant '{args.variant}': {param_count(params):,} params")
    print("available variants:", ", ".join(list_variants()))
    return 0


def main(argv=None) -> int:
    from codon_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    args = _build_argparser().parse_args(argv)
    return {"eval": cmd_eval, "train": cmd_train, "golden": cmd_golden,
            "convert": cmd_convert, "info": cmd_info,
            "export": cmd_export}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
