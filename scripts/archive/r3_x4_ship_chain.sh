#!/bin/bash
# Round-3 phase G: rebuild the x4 SHIPPING chain with the full-augment
# recipe that made the holdout chain QAT-robust. Motivation (measured):
# the 18-site handoff grid costs quality at x4 when warm-started from the
# flips-era x4_qat ancestry (static2 1.833, static2b 1.854 vs the 13-site
# 1.765), while the full-augment 7-image holdout chain lands 1.805 plain
# int8 — better while seeing LESS data. Mirror that ancestry on all 10
# images: full-augment bf16 -> dynamic QAT -> 18-site static QAT.
# Waits for the resume chain (phases E/F) to release the chip first.
set -x
cd /root/repo
if [ -f /tmp/r3_resume.pid ]; then
    while kill -0 "$(cat /tmp/r3_resume.pid)" 2>/dev/null; do sleep 60; done
fi
run() { timeout 7200 python -m codon_tpu.cli "$@"; }

run train --scale 4 --augment full --patch 96 --batch 16 \
    --steps 20000 --warmup 500 --lr 1e-4 --seed 11 \
    --ckpt-in checkpoints/x4_holdout2.npz \
    --ckpt-out checkpoints/x4_ship.npz
run eval --scale 4 --ckpt checkpoints/x4_ship.npz --no-save \
    --json checkpoints/x4_ship_eval.json
run eval --scale 4 --ckpt checkpoints/x4_ship.npz --tta --no-save \
    --json checkpoints/x4_ship_tta_eval.json

run train --scale 4 --qat --steps 2000 --lr 3e-5 --warmup 50 \
    --ckpt-in checkpoints/x4_ship.npz \
    --ckpt-out checkpoints/x4_ship_qat.npz
run train --scale 4 --qat-static --steps 1500 --lr 3e-5 --warmup 50 \
    --ckpt-in checkpoints/x4_ship_qat.npz \
    --ckpt-out checkpoints/x4_ship_qat_static.npz
run eval --scale 4 --ckpt checkpoints/x4_ship_qat_static.npz \
    --dtype int8 --no-save \
    --json checkpoints/x4_ship_qat_static_int8_eval.json
run eval --scale 4 --ckpt checkpoints/x4_ship_qat_static.npz \
    --dtype int8 --tta --no-save \
    --json checkpoints/x4_ship_qat_static_int8_tta_eval.json

# serving numbers for the quality-flagship config
timeout 2400 python scripts/perf_tta.py 2>&1 | tee /tmp/r3_perf_tta.log
echo X4_SHIP_DONE
