#!/bin/bash
# Round-3 phase H: third x4 holdout seed (cross-scale back-down warm
# start), x8 holdout QAT refresh from the new strongest member, and a
# conditional x16 QAT refresh if the F-phase member beats x16_holdout2.
# Waits for the x4 ship chain (phase G) to release the chip.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
if [ -f /tmp/r3_x4_ship.pid ]; then
    while kill -0 "$(cat /tmp/r3_x4_ship.pid)" 2>/dev/null; do sleep 60; done
fi
run() { timeout 7200 python -m codon_tpu.cli "$@"; }

# H1. x4 third strong seed: warm from the strong x8 (back-down warm
# start — the forward chain x4->x8->x16 compounded; test the reverse)
run train --scale 4 --exclude $EX --augment full --patch 96 --batch 16 \
    --steps 20000 --warmup 500 --lr 1e-4 --seed 13 \
    --ckpt-in checkpoints/x8_holdout2.npz \
    --ckpt-out checkpoints/x4_holdout4.npz
run eval --scale 4 --ckpt checkpoints/x4_holdout4.npz --tta --no-save \
    --json checkpoints/x4_holdout4_tta_eval.json
run eval --scale 4 --ckpt \
checkpoints/x4_holdout2.npz,checkpoints/x4_holdout4.npz \
    --tta --no-save \
    --json checkpoints/x4_holdout_ens24_tta_eval.json
run eval --scale 4 --ckpt \
checkpoints/x4_holdout2.npz,checkpoints/x4_holdout_s7b.npz,checkpoints/x4_holdout4.npz \
    --tta --no-save \
    --json checkpoints/x4_holdout_ens3_tta_eval.json

# H2. x8 holdout QAT refresh from the strongest member (x8_holdout3)
run train --scale 8 --exclude $EX --qat --steps 2000 --lr 3e-5 \
    --warmup 50 --ckpt-in checkpoints/x8_holdout3.npz \
    --ckpt-out checkpoints/x8_holdout_qat3.npz
run train --scale 8 --exclude $EX --qat-static --steps 1500 --lr 3e-5 \
    --warmup 50 --ckpt-in checkpoints/x8_holdout_qat3.npz \
    --ckpt-out checkpoints/x8_holdout_qat_static3.npz
run eval --scale 8 --ckpt checkpoints/x8_holdout_qat_static3.npz \
    --dtype int8 --no-save \
    --json checkpoints/x8_holdout_qat_static3_int8_eval.json
run eval --scale 8 --ckpt checkpoints/x8_holdout_qat_static3.npz \
    --dtype int8 --tta --no-save \
    --json checkpoints/x8_holdout_qat_static3_int8_tta_eval.json

# H3. conditional x16 QAT refresh: only if x16_holdout3 beat x16_holdout2
BETTER=$(python - <<'EOF'
import json
try:
    new = json.load(open('checkpoints/x16_holdout3_tta_eval.json'))['mean_rmse']
    old = json.load(open('checkpoints/x16_holdout2_tta_eval.json'))['mean_rmse']
    print('yes' if new < old else 'no')
except Exception:
    print('no')
EOF
)
if [ "$BETTER" = "yes" ]; then
    run train --scale 16 --exclude $EX --qat --steps 2000 --lr 3e-5 \
        --warmup 50 --ckpt-in checkpoints/x16_holdout3.npz \
        --ckpt-out checkpoints/x16_holdout_qat3.npz
    run train --scale 16 --exclude $EX --qat-static --steps 1500 --lr 3e-5 \
        --warmup 50 --ckpt-in checkpoints/x16_holdout_qat3.npz \
        --ckpt-out checkpoints/x16_holdout_qat_static3.npz
    run eval --scale 16 --ckpt checkpoints/x16_holdout_qat_static3.npz \
        --dtype int8 --no-save \
        --json checkpoints/x16_holdout_qat_static3_int8_eval.json
    run eval --scale 16 --ckpt checkpoints/x16_holdout_qat_static3.npz \
        --dtype int8 --tta --no-save \
        --json checkpoints/x16_holdout_qat_static3_int8_tta_eval.json
fi
echo PHASEH_DONE
