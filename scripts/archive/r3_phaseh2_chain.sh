#!/bin/bash
# Round-3 phase H' (replaces r3_phaseh_chain.sh, which was cancelled
# before it started): adds G2 — the x4 shipping static repair via direct
# all-10 fine-tune of the ROBUST holdout static checkpoint — after the
# measured failures of static2 (1.833), static2b (1.854) and the
# wandering full-augment re-train (x4_ship bf16 1.88, in-sample Teddy
# 3.08: 20k steps at peak lr from a converged start trades images).
# Then the original H1/H2/H3. Waits for phase G to release the chip.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
if [ -f /tmp/r3_x4_ship.pid ]; then
    while kill -0 "$(cat /tmp/r3_x4_ship.pid)" 2>/dev/null; do sleep 60; done
fi
run() { timeout 7200 python -m codon_tpu.cli "$@"; }

# G2. x4 shipping static: all-10 qat-static fine-tune of the holdout
# static member with the full-augment ancestry (1.805 plain int8 while
# 3 images were UNSEEN; absorbing them in-sample should do better)
run train --scale 4 --qat-static --steps 1500 --lr 3e-5 --warmup 50 \
    --ckpt-in checkpoints/x4_holdout_qat_static_b.npz \
    --ckpt-out checkpoints/x4_ship2_qat_static.npz
run eval --scale 4 --ckpt checkpoints/x4_ship2_qat_static.npz \
    --dtype int8 --no-save \
    --json checkpoints/x4_ship2_qat_static_int8_eval.json
run eval --scale 4 --ckpt checkpoints/x4_ship2_qat_static.npz \
    --dtype int8 --tta --no-save \
    --json checkpoints/x4_ship2_qat_static_int8_tta_eval.json

# H1. x4 third strong holdout seed (cross-scale back-down warm start)
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

# H3. x16 holdout QAT refresh from the new best member (x16_holdout3
# 4.069 TTA < x16_holdout2 4.270 — condition already measured true)
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
echo PHASEH2_DONE
