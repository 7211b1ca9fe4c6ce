#!/bin/bash
# Round-3 phase B (VERDICT #3): second strong seeds at x8/x16 + 2-model
# ensembles (the cheapest measured quality lever, only applied at x4 so
# far), and an x4 --mix-scales run (3x real degradation pairs/scene) for
# the per-image holdout gap. Recipe mirrors the round-2 holdout chain:
# full augmentation, patch 96, 20k steps, cross-scale warm starts; the
# second seed diverges via --seed and a different warm start.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 7200 python -m codon_tpu.cli "$@"; }

# x8 second seed: warm from x4_holdout (x8_holdout came from x4_holdout2)
run train --scale 8 --exclude $EX --augment full --patch 96 --batch 16 \
    --steps 20000 --warmup 500 --lr 1e-4 --seed 3 \
    --ckpt-in checkpoints/x4_holdout.npz \
    --ckpt-out checkpoints/x8_holdout2.npz
run eval --scale 8 --ckpt checkpoints/x8_holdout2.npz --tta --no-save \
    --json checkpoints/x8_holdout2_tta_eval.json
run eval --scale 8 \
    --ckpt checkpoints/x8_holdout.npz,checkpoints/x8_holdout2.npz \
    --tta --no-save \
    --json checkpoints/x8_holdout_ens2_tta_eval.json

# x16 second seed: warm from x8_holdout2 (x16_holdout came from x8_holdout)
run train --scale 16 --exclude $EX --augment full --patch 96 --batch 16 \
    --steps 20000 --warmup 500 --lr 1e-4 --seed 3 \
    --ckpt-in checkpoints/x8_holdout2.npz \
    --ckpt-out checkpoints/x16_holdout2.npz
run eval --scale 16 --ckpt checkpoints/x16_holdout2.npz --tta --no-save \
    --json checkpoints/x16_holdout2_tta_eval.json
run eval --scale 16 \
    --ckpt checkpoints/x16_holdout.npz,checkpoints/x16_holdout2.npz \
    --tta --no-save \
    --json checkpoints/x16_holdout_ens2_tta_eval.json

# x4 mix-scales: same scenes, three shipped degradations (x4+x8+x16)
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
echo SEEDS_CHAIN_DONE
