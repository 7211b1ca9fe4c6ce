#!/bin/bash
# Round-3 phase I: exploit the codon_f5 diversity member (x4 solo TTA4
# 1.6489 — best solo) via mixed-architecture ensembles (--variant comma
# list), then train f5 members at x8/x16 (cross-scale warm from the
# strongest 3-fuse seeds) and ensemble them.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
if [ -f /tmp/r3_phaseh2.pid ]; then
    while kill -0 "$(cat /tmp/r3_phaseh2.pid)" 2>/dev/null; do sleep 60; done
fi
run() { timeout 10800 python -m codon_tpu.cli "$@"; }
CK=checkpoints

# I1. x4 mixed-ensemble probes (TTA8: all members full-augment ancestry)
run eval --scale 4 --ckpt \
$CK/x4_holdout2.npz,$CK/x4_holdout_s7b.npz,$CK/x4_holdout4.npz,$CK/x4_holdout_f5.npz \
    --variant codon,codon,codon,codon_f5 --tta8 --no-save \
    --json $CK/x4_holdout_ens4f_tta8_eval.json
run eval --scale 4 --ckpt \
$CK/x4_holdout2.npz,$CK/x4_holdout4.npz,$CK/x4_holdout_f5.npz \
    --variant codon,codon,codon_f5 --tta8 --no-save \
    --json $CK/x4_holdout_ens3f_tta8_eval.json
run eval --scale 4 --ckpt $CK/x4_holdout2.npz,$CK/x4_holdout_f5.npz \
    --variant codon,codon_f5 --tta8 --no-save \
    --json $CK/x4_holdout_ens2f_tta8_eval.json
run eval --scale 4 --variant codon_f5 --ckpt $CK/x4_holdout_f5.npz \
    --tta8 --no-save --json $CK/x4_holdout_f5_tta8_eval.json

# I2. x8 f5 diversity member (warm from strongest x8 3-fuse seed)
run train --scale 8 --variant codon_f5 --exclude $EX --augment full \
    --patch 96 --batch 16 --steps 20000 --warmup 500 --lr 1e-4 --seed 19 \
    --ckpt-in $CK/x8_holdout3.npz \
    --ckpt-out $CK/x8_holdout_f5.npz
run eval --scale 8 --variant codon_f5 --ckpt $CK/x8_holdout_f5.npz \
    --tta --no-save --json $CK/x8_holdout_f5_tta_eval.json
run eval --scale 8 --ckpt \
$CK/x8_holdout.npz,$CK/x8_holdout2.npz,$CK/x8_holdout3.npz,$CK/x8_holdout_f5.npz \
    --variant codon,codon,codon,codon_f5 --tta --no-save \
    --json $CK/x8_holdout_ens4f_tta_eval.json
run eval --scale 8 --ckpt $CK/x8_holdout3.npz,$CK/x8_holdout_f5.npz \
    --variant codon,codon_f5 --tta --no-save \
    --json $CK/x8_holdout_ens2f_tta_eval.json

# I3. x16 f5 diversity member (warm from strongest x16 seed)
run train --scale 16 --variant codon_f5 --exclude $EX --augment full \
    --patch 96 --batch 16 --steps 20000 --warmup 500 --lr 1e-4 --seed 19 \
    --ckpt-in $CK/x16_holdout3.npz \
    --ckpt-out $CK/x16_holdout_f5.npz
run eval --scale 16 --variant codon_f5 --ckpt $CK/x16_holdout_f5.npz \
    --tta8 --no-save --json $CK/x16_holdout_f5_tta8_eval.json
run eval --scale 16 --ckpt $CK/x16_holdout3.npz,$CK/x16_holdout_f5.npz \
    --variant codon,codon_f5 --tta8 --no-save \
    --json $CK/x16_holdout_ens2f_tta8_eval.json
echo PHASEI_DONE
