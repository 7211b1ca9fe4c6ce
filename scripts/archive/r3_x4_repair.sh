#!/bin/bash
# x4 holdout int8 quality repair: the 18-site static QAT at x4 lands at
# TTA 1.809 vs the 1.778 bar. Levers: (a) a second static member (warm
# from the other bf16 seed) + 2-model ensemble x TTA — the measured x4
# ensemble gain was ~-0.03 RMSE and better every held-out image; (b) a
# longer static-QAT refinement at the same patch/lr recipe.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 3600 python -m codon_tpu.cli "$@"; }

run train --scale 4 --exclude $EX --qat --steps 2000 --lr 3e-5 --warmup 50 \
    --ckpt-in checkpoints/x4_holdout.npz \
    --ckpt-out checkpoints/x4_holdout_qat_b.npz
run train --scale 4 --exclude $EX --qat-static --steps 1500 --lr 3e-5 \
    --warmup 50 --ckpt-in checkpoints/x4_holdout_qat_b.npz \
    --ckpt-out checkpoints/x4_holdout_qat_static_b.npz
run eval --scale 4 --ckpt checkpoints/x4_holdout_qat_static_b.npz \
    --dtype int8 --tta --no-save \
    --json checkpoints/x4_holdout_qat_static_b_int8_tta_eval.json
run eval --scale 4 \
    --ckpt checkpoints/x4_holdout_qat_static.npz,checkpoints/x4_holdout_qat_static_b.npz \
    --dtype int8 --tta --no-save \
    --json checkpoints/x4_holdout_qat_static_ens2_int8_tta_eval.json

# longer static refinement from the stronger warm start
run train --scale 4 --exclude $EX --qat-static --steps 4000 --lr 3e-5 \
    --warmup 100 --ckpt-in checkpoints/x4_holdout_qat.npz \
    --ckpt-out checkpoints/x4_holdout_qat_static_long.npz
run eval --scale 4 --ckpt checkpoints/x4_holdout_qat_static_long.npz \
    --dtype int8 --tta --no-save \
    --json checkpoints/x4_holdout_qat_static_long_int8_tta_eval.json

# no-handoff arm (13-site grid): x4 is the edge-heavy scale where the
# gate-input grids measurably cost RMSE (2.053 -> 2.147 plain)
run train --scale 4 --exclude $EX --qat-static --no-handoff --steps 1500 \
    --lr 3e-5 --warmup 50 --ckpt-in checkpoints/x4_holdout_qat.npz \
    --ckpt-out checkpoints/x4_holdout_qat_static_nh.npz
run eval --scale 4 --ckpt checkpoints/x4_holdout_qat_static_nh.npz \
    --dtype int8 --no-save \
    --json checkpoints/x4_holdout_qat_static_nh_int8_eval.json
run eval --scale 4 --ckpt checkpoints/x4_holdout_qat_static_nh.npz \
    --dtype int8 --tta --no-save \
    --json checkpoints/x4_holdout_qat_static_nh_int8_tta_eval.json
echo X4_REPAIR_DONE
