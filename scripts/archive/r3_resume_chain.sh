#!/bin/bash
# Round-3 resume: picks up where r3_phased_chain.sh was interrupted.
# Already done before the interrupt: bench (89.083 img/s), perf_bound
# (105.9% of measured-primitive bound), export_matrix artifacts written,
# x16_holdout_qat2 + x16_holdout_qat_static2 trained (phase-C chain).
# Order: cheap evals first (feed README), long trainings last.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 7200 python -m codon_tpu.cli "$@"; }

# D-evals. x16 holdout QAT refresh evals (training already done)
run eval --scale 16 --ckpt checkpoints/x16_holdout_qat_static2.npz \
    --dtype int8 --no-save \
    --json checkpoints/x16_holdout_qat_static2_int8_eval.json
run eval --scale 16 --ckpt checkpoints/x16_holdout_qat_static2.npz \
    --dtype int8 --tta --no-save \
    --json checkpoints/x16_holdout_qat_static2_int8_tta_eval.json

# C. shipping static2 TTA int8 evals
run eval --scale 8 --ckpt checkpoints/x8_qat_static2.npz --dtype int8 \
    --tta --no-save \
    --json checkpoints/x8_qat_static2_int8_tta_eval.json
run eval --scale 16 --ckpt checkpoints/x16_qat_static2.npz --dtype int8 \
    --tta --no-save \
    --json checkpoints/x16_qat_static2_int8_tta_eval.json

# B. shipping x4 static2 repair: warm the 18-site static QAT from the
# good 13-site static weights instead of the dynamic-QAT checkpoint
run train --scale 4 --qat-static --steps 1500 --lr 3e-5 --warmup 50 \
    --ckpt-in checkpoints/x4_qat_static.npz \
    --ckpt-out checkpoints/x4_qat_static2b.npz
run eval --scale 4 --ckpt checkpoints/x4_qat_static2b.npz --dtype int8 \
    --no-save --json checkpoints/x4_qat_static2b_int8_eval.json
run eval --scale 4 --ckpt checkpoints/x4_qat_static2b.npz --dtype int8 \
    --tta --no-save \
    --json checkpoints/x4_qat_static2b_int8_tta_eval.json

# A-remainder. export artifact load-check (artifacts already written)
timeout 2400 python scripts/export_matrix.py --load-check \
    --out-dir artifacts 2>&1 | tee /tmp/r3_export_matrix.log

# E. strong third x8 member + 3-member ensemble
run train --scale 8 --exclude $EX --augment full --patch 96 --batch 16 \
    --steps 20000 --warmup 500 --lr 1e-4 --seed 9 \
    --ckpt-in checkpoints/x4_holdout2.npz \
    --ckpt-out checkpoints/x8_holdout3.npz
run eval --scale 8 --ckpt checkpoints/x8_holdout3.npz --tta --no-save \
    --json checkpoints/x8_holdout3_tta_eval.json
run eval --scale 8 --ckpt \
checkpoints/x8_holdout.npz,checkpoints/x8_holdout2.npz,checkpoints/x8_holdout3.npz \
    --tta --no-save \
    --json checkpoints/x8_holdout_ens3_tta_eval.json

# F. comparably-strong second x16 member (warm from the OTHER strong x8)
run train --scale 16 --exclude $EX --augment full --patch 96 --batch 16 \
    --steps 20000 --warmup 500 --lr 1e-4 --seed 9 \
    --ckpt-in checkpoints/x8_holdout3.npz \
    --ckpt-out checkpoints/x16_holdout3.npz
run eval --scale 16 --ckpt checkpoints/x16_holdout3.npz --tta --no-save \
    --json checkpoints/x16_holdout3_tta_eval.json
run eval --scale 16 \
    --ckpt checkpoints/x16_holdout2.npz,checkpoints/x16_holdout3.npz \
    --tta --no-save \
    --json checkpoints/x16_holdout_ens23_tta_eval.json
echo RESUME_DONE
