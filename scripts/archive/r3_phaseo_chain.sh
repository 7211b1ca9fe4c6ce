#!/bin/bash
# Round-3 phase O: comparably-strong ensemble pairs. The round's
# repeated finding is that ensembles only pay when members are equally
# strong (x16 ens2f 3.83 LOST to f5 solo 3.78; x8 ens2f 2.83 lost to
# 2.80); the f5 members are the strongest at every scale but exist as
# singletons. Train a second f5 seed at each scale (same recipe, new
# seed) and ensemble the pair. Plus: x4 ensemble refreshes slotting in
# the 5e_ema member (solo 1.6249, far stronger than the holdout4 slot
# it can replace at 1.833).
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 10800 python -m codon_tpu.cli "$@"; }
CK=checkpoints
stop_requested() { [ -f /tmp/STOP_CHAIN ]; }

while kill -0 "$(cat /tmp/phasen.pid)" 2>/dev/null; do sleep 60; done
echo "PHASEN_RELEASED $(date -u +%H:%M:%S)"
until python -c "import jax, jax.numpy as jnp; print(jnp.add(1,1), jax.devices())"; do
    echo "device unavailable; waiting 60s before next untimed probe"
    sleep 60
done

# 1. cheap x4 ensemble refreshes with the 5e_ema member
run eval --scale 4 --ckpt \
$CK/x4_holdout2.npz,$CK/x4_holdout_s7b.npz,$CK/x4_holdout5e_ema.npz,$CK/x4_holdout_f5.npz \
    --variant codon,codon,codon,codon_f5 --tta8 --no-save \
    --json $CK/x4_holdout_ens4e_tta8_eval.json
run eval --scale 4 --ckpt \
$CK/x4_holdout2.npz,$CK/x4_holdout_s7b.npz,$CK/x4_holdout4.npz,$CK/x4_holdout_f5.npz,$CK/x4_holdout5e_ema.npz \
    --variant codon,codon,codon,codon_f5,codon --tta8 --no-save \
    --json $CK/x4_holdout_ens5e_tta8_eval.json

# 2. second f5 seeds: x8 and x16 (largest per-image gaps live here)
for S in 8 16; do
  stop_requested && { echo STOPPED_AT_X$S; exit 0; }
  if [ ! -f $CK/x${S}_holdout_f5b.npz ]; then
  run train --scale $S --variant codon_f5 --exclude $EX --augment full \
      --patch 96 --batch 16 --steps 20000 --warmup 500 --lr 1e-4 --seed 41 \
      --ckpt-in $CK/x${S}_holdout3.npz \
      --ckpt-out $CK/x${S}_holdout_f5b.npz
  fi
  run eval --scale $S --variant codon_f5 --ckpt $CK/x${S}_holdout_f5b.npz \
      --tta8 --no-save --json $CK/x${S}_holdout_f5b_tta8_eval.json
  run eval --scale $S --variant codon_f5,codon_f5 \
      --ckpt $CK/x${S}_holdout_f5.npz,$CK/x${S}_holdout_f5b.npz \
      --tta8 --no-save --json $CK/x${S}_holdout_ens2f5_tta8_eval.json
done

# 3. x4 second f5 seed warm from the EMA member (decorrelated ancestor)
stop_requested && { echo STOPPED_AT_X4F5B; exit 0; }
if [ ! -f $CK/x4_holdout_f5b.npz ]; then
run train --scale 4 --variant codon_f5 --exclude $EX --augment full \
    --patch 96 --batch 16 --steps 20000 --warmup 500 --lr 1e-4 --seed 47 \
    --ckpt-in $CK/x4_holdout5e_ema.npz \
    --ckpt-out $CK/x4_holdout_f5b.npz
fi
run eval --scale 4 --variant codon_f5 --ckpt $CK/x4_holdout_f5b.npz \
    --tta8 --no-save --json $CK/x4_holdout_f5b_tta8_eval.json
run eval --scale 4 --variant codon_f5,codon_f5 \
    --ckpt $CK/x4_holdout_f5.npz,$CK/x4_holdout_f5b.npz \
    --tta8 --no-save --json $CK/x4_holdout_ens2f5_tta8_eval.json
run eval --scale 4 --ckpt \
$CK/x4_holdout2.npz,$CK/x4_holdout_s7b.npz,$CK/x4_holdout_f5b.npz,$CK/x4_holdout_f5.npz \
    --variant codon,codon,codon_f5,codon_f5 --tta8 --no-save \
    --json $CK/x4_holdout_ens4ff_tta8_eval.json
echo PHASEO_DONE
