#!/bin/bash
# Round-3 phase D. Replaces the mix-scales members of phase C part 3
# after the measured x4 negative (mix solo 1.935 vs 1.707: training on
# mixed degradations dilutes the scale-specific task — same failure mode
# as round-2 pyramid augmentation). Order: clean-chip perf measurements
# first, then the short shipping-quality repairs, then the long
# strong-member trainings (cross-scale warm starts, target-scale data).
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 7200 python -m codon_tpu.cli "$@"; }

# A. clean-chip perf evidence
timeout 1200 python bench.py | tee /tmp/r3_bench.json
timeout 2400 python scripts/perf_bound_int8.py 2>&1 \
    | tee /tmp/r3_bound.log
timeout 2400 python scripts/export_matrix.py --load-check \
    --out-dir artifacts 2>&1 | tee /tmp/r3_export_matrix.log

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

# C. shipping static2 TTA int8 evals (README "+tta" column for the
# handoff generation)
run eval --scale 8 --ckpt checkpoints/x8_qat_static2.npz --dtype int8 \
    --tta --no-save \
    --json checkpoints/x8_qat_static2_int8_tta_eval.json
run eval --scale 16 --ckpt checkpoints/x16_qat_static2.npz --dtype int8 \
    --tta --no-save \
    --json checkpoints/x16_qat_static2_int8_tta_eval.json

# D. x16 holdout QAT refresh from the new best bf16 holdout checkpoint
run train --scale 16 --exclude $EX --qat --steps 2000 --lr 3e-5 \
    --warmup 50 --ckpt-in checkpoints/x16_holdout2.npz \
    --ckpt-out checkpoints/x16_holdout_qat2.npz
run train --scale 16 --exclude $EX --qat-static --steps 1500 --lr 3e-5 \
    --warmup 50 --ckpt-in checkpoints/x16_holdout_qat2.npz \
    --ckpt-out checkpoints/x16_holdout_qat_static2.npz
run eval --scale 16 --ckpt checkpoints/x16_holdout_qat_static2.npz \
    --dtype int8 --no-save \
    --json checkpoints/x16_holdout_qat_static2_int8_eval.json
run eval --scale 16 --ckpt checkpoints/x16_holdout_qat_static2.npz \
    --dtype int8 --tta --no-save \
    --json checkpoints/x16_holdout_qat_static2_int8_tta_eval.json

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
echo PHASED_DONE
