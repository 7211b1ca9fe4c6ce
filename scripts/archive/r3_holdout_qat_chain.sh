#!/bin/bash
# Round-3 holdout QAT chain (VERDICT #1): hold the int8-static shipping
# path to the holdout bar. Per scale: dynamic-QAT fine-tune of the best
# holdout bf16 checkpoint, then frozen-static-grid QAT (the round-2
# recipe: 1500 steps, patch 64, lr 3e-5, warmup 50), then int8 evals
# (plain + TTA) with Art/Cones/Teddy never seen in training OR scale
# calibration (--exclude filters the calibration frame list too).
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 3600 python -m codon_tpu.cli "$@"; }

# ---------------- x4 (warm: x4_holdout2, best single member) ----------
run train --scale 4 --exclude $EX --qat --steps 2000 --lr 3e-5 --warmup 50 \
    --ckpt-in checkpoints/x4_holdout2.npz \
    --ckpt-out checkpoints/x4_holdout_qat.npz
run train --scale 4 --exclude $EX --qat-static --steps 1500 --lr 3e-5 \
    --warmup 50 --ckpt-in checkpoints/x4_holdout_qat.npz \
    --ckpt-out checkpoints/x4_holdout_qat_static.npz
run eval --scale 4 --ckpt checkpoints/x4_holdout_qat_static.npz \
    --dtype int8 --no-save \
    --json checkpoints/x4_holdout_qat_static_int8_eval.json
run eval --scale 4 --ckpt checkpoints/x4_holdout_qat_static.npz \
    --dtype int8 --tta --no-save \
    --json checkpoints/x4_holdout_qat_static_int8_tta_eval.json

# ---------------- x8 (warm: x8_holdout) -------------------------------
run train --scale 8 --exclude $EX --qat --steps 2000 --lr 3e-5 --warmup 50 \
    --ckpt-in checkpoints/x8_holdout.npz \
    --ckpt-out checkpoints/x8_holdout_qat.npz
run train --scale 8 --exclude $EX --qat-static --steps 1500 --lr 3e-5 \
    --warmup 50 --ckpt-in checkpoints/x8_holdout_qat.npz \
    --ckpt-out checkpoints/x8_holdout_qat_static.npz
run eval --scale 8 --ckpt checkpoints/x8_holdout_qat_static.npz \
    --dtype int8 --no-save \
    --json checkpoints/x8_holdout_qat_static_int8_eval.json
run eval --scale 8 --ckpt checkpoints/x8_holdout_qat_static.npz \
    --dtype int8 --tta --no-save \
    --json checkpoints/x8_holdout_qat_static_int8_tta_eval.json

# ---------------- x16 (warm: x16_holdout) -----------------------------
run train --scale 16 --exclude $EX --qat --steps 2000 --lr 3e-5 --warmup 50 \
    --ckpt-in checkpoints/x16_holdout.npz \
    --ckpt-out checkpoints/x16_holdout_qat.npz
run train --scale 16 --exclude $EX --qat-static --steps 1500 --lr 3e-5 \
    --warmup 50 --ckpt-in checkpoints/x16_holdout_qat.npz \
    --ckpt-out checkpoints/x16_holdout_qat_static.npz
run eval --scale 16 --ckpt checkpoints/x16_holdout_qat_static.npz \
    --dtype int8 --no-save \
    --json checkpoints/x16_holdout_qat_static_int8_eval.json
run eval --scale 16 --ckpt checkpoints/x16_holdout_qat_static.npz \
    --dtype int8 --tta --no-save \
    --json checkpoints/x16_holdout_qat_static_int8_tta_eval.json
echo CHAIN_DONE
