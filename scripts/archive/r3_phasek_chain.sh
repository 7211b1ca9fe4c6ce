#!/bin/bash
# Round-3 phase K: runs after phase J releases the device.
# 1) cheap TTA8 evals the x8 f5 member is eligible for (full-augment
#    ancestry) that phase J only ran at TTA4;
# 2) the x4 --grad-loss probe: two weights bracketing an order of
#    magnitude, each a full 20k-step member warm from x4_holdout2, solo
#    TTA8 + best-ensemble refresh. Gradient-domain supervision targets
#    the thin-structure scenes (Art) where the per-image holdout gap vs
#    the reference archived outputs is largest.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 10800 python -m codon_tpu.cli "$@"; }
CK=checkpoints
stop_requested() { [ -f /tmp/STOP_CHAIN ]; }

# 0. wait for phase J to release the device (never run two TPU clients)
while kill -0 "$(cat /tmp/phasej.pid)" 2>/dev/null; do sleep 60; done
echo "PHASEJ_RELEASED $(date -u +%H:%M:%S)"
until python -c "import jax, jax.numpy as jnp; print(jnp.add(1,1), jax.devices())"; do
    echo "device unavailable; waiting 60s before next untimed probe"
    sleep 60
done
echo "DEVICE_UP $(date -u +%H:%M:%S)"

# 1. x8 TTA8 evals (f5 + strongest mixes; all full-augment ancestry)
run eval --scale 8 --variant codon_f5 --ckpt $CK/x8_holdout_f5.npz \
    --tta8 --no-save --json $CK/x8_holdout_f5_tta8_eval.json
run eval --scale 8 --ckpt $CK/x8_holdout3.npz,$CK/x8_holdout_f5.npz \
    --variant codon,codon_f5 --tta8 --no-save \
    --json $CK/x8_holdout_ens2f_tta8_eval.json
echo PHASEK_CHEAP_DONE

# 2. x4 grad-loss members
stop_requested && { echo STOPPED_BEFORE_GL; exit 0; }
if [ ! -f $CK/x4_holdout_gl02.npz ]; then
run train --scale 4 --exclude $EX --augment full --grad-loss 0.2 \
    --patch 96 --batch 16 --steps 20000 --warmup 500 --lr 1e-4 --seed 29 \
    --ckpt-in $CK/x4_holdout2.npz \
    --ckpt-out $CK/x4_holdout_gl02.npz
fi
run eval --scale 4 --ckpt $CK/x4_holdout_gl02.npz --tta8 --no-save \
    --json $CK/x4_holdout_gl02_tta8_eval.json

stop_requested && { echo STOPPED_BEFORE_GL1; exit 0; }
if [ ! -f $CK/x4_holdout_gl10.npz ]; then
run train --scale 4 --exclude $EX --augment full --grad-loss 1.0 \
    --patch 96 --batch 16 --steps 20000 --warmup 500 --lr 1e-4 --seed 31 \
    --ckpt-in $CK/x4_holdout2.npz \
    --ckpt-out $CK/x4_holdout_gl10.npz
fi
run eval --scale 4 --ckpt $CK/x4_holdout_gl10.npz --tta8 --no-save \
    --json $CK/x4_holdout_gl10_tta8_eval.json

# 3. ensemble refreshes with the better grad-loss member slotted in
# (5-member = current best 4 + gl02; and gl02 swapped for holdout4)
run eval --scale 4 --ckpt \
$CK/x4_holdout2.npz,$CK/x4_holdout_s7b.npz,$CK/x4_holdout4.npz,$CK/x4_holdout_f5.npz,$CK/x4_holdout_gl02.npz \
    --variant codon,codon,codon,codon_f5,codon --tta8 --no-save \
    --json $CK/x4_holdout_ens5g_tta8_eval.json
run eval --scale 4 --ckpt \
$CK/x4_holdout2.npz,$CK/x4_holdout_s7b.npz,$CK/x4_holdout_gl02.npz,$CK/x4_holdout_f5.npz \
    --variant codon,codon,codon,codon_f5 --tta8 --no-save \
    --json $CK/x4_holdout_ens4g_tta8_eval.json
echo PHASEK_DONE
