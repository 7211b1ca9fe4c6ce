#!/bin/bash
# Round-3 phase I2: repaired continuation of phase I after the TPU
# stale-session incident (a killed mid-compile eval left the device
# unavailable; subsequent processes blocked ~25 min in backend init and
# died UNAVAILABLE). Probes the device until it is genuinely free, then
# re-runs the lost f5 evals and the x8/x16 f5 member training.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 10800 python -m codon_tpu.cli "$@"; }
CK=checkpoints

# 0. wait for the device: a trivial client must init + run within 120 s
until timeout 120 python -c "
import jax, jax.numpy as jnp
print(jnp.add(1, 1), jax.devices())" 2>/dev/null; do
    echo "device busy/unavailable; retry in 60s"
    sleep 60
done

# I1-remainder. x4 f5 solo tta8 (lost to the incident)
run eval --scale 4 --variant codon_f5 --ckpt $CK/x4_holdout_f5.npz \
    --tta8 --no-save --json $CK/x4_holdout_f5_tta8_eval.json

# I2. x8 f5 diversity member (warm from strongest x8 3-fuse seed)
if [ ! -f $CK/x8_holdout_f5.npz ]; then
run train --scale 8 --variant codon_f5 --exclude $EX --augment full \
    --patch 96 --batch 16 --steps 20000 --warmup 500 --lr 1e-4 --seed 19 \
    --ckpt-in $CK/x8_holdout3.npz \
    --ckpt-out $CK/x8_holdout_f5.npz
fi
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
if [ ! -f $CK/x16_holdout_f5.npz ]; then
run train --scale 16 --variant codon_f5 --exclude $EX --augment full \
    --patch 96 --batch 16 --steps 20000 --warmup 500 --lr 1e-4 --seed 19 \
    --ckpt-in $CK/x16_holdout3.npz \
    --ckpt-out $CK/x16_holdout_f5.npz
fi
run eval --scale 16 --variant codon_f5 --ckpt $CK/x16_holdout_f5.npz \
    --tta8 --no-save --json $CK/x16_holdout_f5_tta8_eval.json
run eval --scale 16 --ckpt $CK/x16_holdout3.npz,$CK/x16_holdout_f5.npz \
    --variant codon,codon_f5 --tta8 --no-save \
    --json $CK/x16_holdout_ens2f_tta8_eval.json
echo PHASEI2_DONE
