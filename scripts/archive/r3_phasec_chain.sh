#!/bin/bash
# Round-3 phase C: (1) relaunch the x4 --mix-scales run interrupted at the
# end of the previous session; (2) refresh the x16 holdout QAT-static int8
# chain from x16_holdout2 (bf16 holdout TTA 4.27 vs the 5.02 the current
# int8 chain was warmed from); (3) mix-scales members at x8/x16 to attack
# the Art/Cones per-image holdout gap and feed stronger ensembles.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 7200 python -m codon_tpu.cli "$@"; }

# (1) x4 mix-scales: same 7 scenes, three shipped degradations each
run train --scale 4 --exclude $EX --augment full --patch 96 --batch 16 \
    --steps 20000 --warmup 500 --lr 7e-5 --seed 5 --mix-scales \
    --ckpt-in checkpoints/x4_holdout2.npz \
    --ckpt-out checkpoints/x4_holdout_mix.npz
run eval --scale 4 --ckpt checkpoints/x4_holdout_mix.npz --tta --no-save \
    --json checkpoints/x4_holdout_mix_tta_eval.json
run eval --scale 4 \
    --ckpt checkpoints/x4_holdout_mix.npz,checkpoints/x4_holdout2.npz \
    --tta --no-save \
    --json checkpoints/x4_holdout_mix_ens2_tta_eval.json

# (2) x16 QAT refresh from the new best bf16 holdout checkpoint
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

# (3) x8/x16 mix-scales members + ensembles
run train --scale 8 --exclude $EX --augment full --patch 96 --batch 16 \
    --steps 20000 --warmup 500 --lr 7e-5 --seed 7 --mix-scales \
    --ckpt-in checkpoints/x8_holdout.npz \
    --ckpt-out checkpoints/x8_holdout_mix.npz
run eval --scale 8 --ckpt checkpoints/x8_holdout_mix.npz --tta --no-save \
    --json checkpoints/x8_holdout_mix_tta_eval.json
run eval --scale 8 --ckpt \
checkpoints/x8_holdout.npz,checkpoints/x8_holdout2.npz,checkpoints/x8_holdout_mix.npz \
    --tta --no-save \
    --json checkpoints/x8_holdout_ens3_tta_eval.json

run train --scale 16 --exclude $EX --augment full --patch 96 --batch 16 \
    --steps 20000 --warmup 500 --lr 7e-5 --seed 7 --mix-scales \
    --ckpt-in checkpoints/x16_holdout2.npz \
    --ckpt-out checkpoints/x16_holdout_mix.npz
run eval --scale 16 --ckpt checkpoints/x16_holdout_mix.npz --tta --no-save \
    --json checkpoints/x16_holdout_mix_tta_eval.json
run eval --scale 16 \
    --ckpt checkpoints/x16_holdout2.npz,checkpoints/x16_holdout_mix.npz \
    --tta --no-save \
    --json checkpoints/x16_holdout_mix_ens2_tta_eval.json
echo PHASEC_DONE
