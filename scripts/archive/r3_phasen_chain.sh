#!/bin/bash
# Round-3 phase N: shipping-path (int8-static) refresh from the f5
# members, which set the round's bf16 quality bests at every scale
# (x4 1.624 / x8 2.821 / x16 3.782). QAT refresh inherited float-seed
# gains twice already this round (h2/i chains); the f5 seeds are
# stronger again, so re-run the 2000-step QAT + 1500-step QAT-static
# recipe from them, eval int8 plain + TTA8 (full-augment ancestry), and
# attempt an x4 shipping (all-10) static from the f5 line against the
# incumbent x4_ship2 1.749.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 7200 python -m codon_tpu.cli "$@"; }
CK=checkpoints
stop_requested() { [ -f /tmp/STOP_CHAIN ]; }

while kill -0 "$(cat /tmp/phasem.pid)" 2>/dev/null; do sleep 60; done
echo "PHASEM_RELEASED $(date -u +%H:%M:%S)"
until python -c "import jax, jax.numpy as jnp; print(jnp.add(1,1), jax.devices())"; do
    echo "device unavailable; waiting 60s before next untimed probe"
    sleep 60
done

for S in 4 8 16; do
  stop_requested && { echo STOPPED_AT_X$S; exit 0; }
  run train --scale $S --variant codon_f5 --exclude $EX --qat \
      --steps 2000 --lr 3e-5 --warmup 50 \
      --ckpt-in $CK/x${S}_holdout_f5.npz \
      --ckpt-out $CK/x${S}_holdout_qat_f5.npz
  run train --scale $S --variant codon_f5 --exclude $EX --qat-static \
      --steps 1500 --lr 3e-5 --warmup 50 \
      --ckpt-in $CK/x${S}_holdout_qat_f5.npz \
      --ckpt-out $CK/x${S}_holdout_qat_static_f5.npz
  run eval --scale $S --variant codon_f5 \
      --ckpt $CK/x${S}_holdout_qat_static_f5.npz \
      --dtype int8 --no-save \
      --json $CK/x${S}_holdout_qat_static_f5_int8_eval.json
  run eval --scale $S --variant codon_f5 \
      --ckpt $CK/x${S}_holdout_qat_static_f5.npz \
      --dtype int8 --tta8 --no-save \
      --json $CK/x${S}_holdout_qat_static_f5_int8_tta8_eval.json
done

# x4 shipping candidate: absorb the held-out images in-sample from the
# f5 holdout static (the recipe that produced the incumbent x4_ship2)
stop_requested && { echo STOPPED_BEFORE_SHIP; exit 0; }
run train --scale 4 --variant codon_f5 --qat-static --steps 1500 \
    --lr 3e-5 --warmup 50 \
    --ckpt-in $CK/x4_holdout_qat_static_f5.npz \
    --ckpt-out $CK/x4_ship_f5_qat_static.npz
run eval --scale 4 --variant codon_f5 --ckpt $CK/x4_ship_f5_qat_static.npz \
    --dtype int8 --no-save \
    --json $CK/x4_ship_f5_qat_static_int8_eval.json
run eval --scale 4 --variant codon_f5 --ckpt $CK/x4_ship_f5_qat_static.npz \
    --dtype int8 --tta --no-save \
    --json $CK/x4_ship_f5_qat_static_int8_tta_eval.json
echo PHASEN_DONE
