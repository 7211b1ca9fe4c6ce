#!/bin/bash
# Round-4 phase P: quality levers. Round 3's grad-loss member (gl10,
# --grad-loss 1.0) set the x4 holdout best solo TTA8 1.547 — replicate it
# at x8/x16, build comparably-strong gl/f5 pair ensembles (phase O showed
# pairs only pay between equally strong members), and train the first
# edge-biased-sampling member (VERDICT r4 item 1's untried lever).
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 10800 python -m codon_tpu.cli "$@"; }
CK=checkpoints
stop_requested() { [ -f /tmp/STOP_CHAIN ]; }

# ADVICE r3: guard on pid-file existence before the kill -0 loop so an
# unstarted predecessor can't fall through to a concurrent TPU client
until [ -f /tmp/phaseo.pid ]; do sleep 30; done
while kill -0 "$(cat /tmp/phaseo.pid)" 2>/dev/null; do sleep 60; done
echo "PHASEO_RELEASED $(date -u +%H:%M:%S)"
# handoff gate: give the interactive pytest+verify sweep up to 45 min of
# the freed host/device (it touches /tmp/R4_GO when done), then proceed
# regardless so the device never idles long
for i in $(seq 90); do [ -f /tmp/R4_GO ] && break; sleep 30; done
echo "GO $(date -u +%H:%M:%S)"
until python -c "import jax, jax.numpy as jnp; print(jnp.add(1,1), jax.devices())"; do
    echo "device unavailable; waiting 60s before next untimed probe"
    sleep 60
done

# 1. cheap x4 evals: gl10 plain/tta4 baselines + gl10-slotted ensembles
run eval --scale 4 --ckpt $CK/x4_holdout_gl10.npz --no-save \
    --json $CK/x4_holdout_gl10_eval.json
run eval --scale 4 --ckpt $CK/x4_holdout_gl10.npz --tta --no-save \
    --json $CK/x4_holdout_gl10_tta_eval.json
run eval --scale 4 --variant codon,codon_f5 \
    --ckpt $CK/x4_holdout_gl10.npz,$CK/x4_holdout_f5.npz \
    --tta8 --no-save --json $CK/x4_holdout_ens2gf_tta8_eval.json
run eval --scale 4 --variant codon,codon,codon,codon_f5 \
    --ckpt $CK/x4_holdout_gl10.npz,$CK/x4_holdout2.npz,$CK/x4_holdout_s7b.npz,$CK/x4_holdout_f5.npz \
    --tta8 --no-save --json $CK/x4_holdout_ens4gl_tta8_eval.json
echo PHASEP_CHEAP_DONE

# 2. gl10 members at x8 and x16 (same recipe that won at x4)
for S in 8 16; do
  stop_requested && { echo STOPPED_AT_GL_X$S; exit 0; }
  if [ ! -f $CK/x${S}_holdout_gl10.npz ]; then
  run train --scale $S --exclude $EX --augment full --grad-loss 1.0 \
      --patch 96 --batch 16 --steps 20000 --warmup 500 --lr 1e-4 --seed 31 \
      --ckpt-in $CK/x${S}_holdout3.npz \
      --ckpt-out $CK/x${S}_holdout_gl10.npz
  fi
  run eval --scale $S --ckpt $CK/x${S}_holdout_gl10.npz --tta8 --no-save \
      --json $CK/x${S}_holdout_gl10_tta8_eval.json
  run eval --scale $S --variant codon,codon_f5 \
      --ckpt $CK/x${S}_holdout_gl10.npz,$CK/x${S}_holdout_f5.npz \
      --tta8 --no-save --json $CK/x${S}_holdout_ens2glf_tta8_eval.json
  run eval --scale $S --variant codon,codon_f5,codon_f5 \
      --ckpt $CK/x${S}_holdout_gl10.npz,$CK/x${S}_holdout_f5.npz,$CK/x${S}_holdout_f5b.npz \
      --tta8 --no-save --json $CK/x${S}_holdout_ens3glff_tta8_eval.json
done

# 3. first edge-biased member at x4 (composes the two new levers:
#    grad-loss supervision + discontinuity-centered sampling)
stop_requested && { echo STOPPED_AT_EB; exit 0; }
if [ ! -f $CK/x4_holdout_eb.npz ]; then
run train --scale 4 --exclude $EX --augment full --grad-loss 1.0 \
    --edge-bias 0.5 \
    --patch 96 --batch 16 --steps 20000 --warmup 500 --lr 1e-4 --seed 37 \
    --ckpt-in $CK/x4_holdout2.npz \
    --ckpt-out $CK/x4_holdout_eb.npz
fi
run eval --scale 4 --ckpt $CK/x4_holdout_eb.npz --tta8 --no-save \
    --json $CK/x4_holdout_eb_tta8_eval.json
run eval --scale 4 --variant codon,codon \
    --ckpt $CK/x4_holdout_gl10.npz,$CK/x4_holdout_eb.npz \
    --tta8 --no-save --json $CK/x4_holdout_ens2ge_tta8_eval.json
echo PHASEP_DONE
