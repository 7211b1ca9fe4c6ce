#!/bin/bash
# Round-5 session-5b chain: per-scale specialization from the
# scale-conditioned joint model (follow-on to the session-5 SC retry).
#
# Hypothesis (VERDICT r4 ask 1 arm b, strongest form): the joint
# mix-scales model is a multi-scale PRETRAINING — the x8/x16 Art
# gradients regularize x4 and vice versa — so short per-scale
# fine-tunes from it may generalize to the held-out thin-structure
# scenes better than the per-scale solos ever did. Each fine-tune
# keeps the codon_sc stem (cond plane frozen at S/16 via
# --scale-cond without --mix-scales) and the eb recipe, then TTA8
# evals against the ebL incumbents.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 10800 python -m codon_tpu.cli "$@"; }
CK=checkpoints
stop_requested() { [ -f /tmp/STOP_CHAIN ]; }
mark() { echo "=== $1 $(date -u +%H:%M:%S)"; }
rm -f /tmp/STOP_CHAIN
echo $$ > /tmp/r5s5b.pid
mark S5B_START

for S in 4 8 16; do
  stop_requested && { echo STOPPED_AT_FT$S; exit 0; }
  if [ ! -f $CK/x${S}_holdout_scft.npz ]; then
  run train --scale $S --scale-cond --variant codon_sc \
      --exclude $EX --augment full --grad-loss 1.0 --edge-bias 0.5 \
      --patch 96 --batch 16 --steps 6000 --warmup 200 --lr 3e-5 \
      --clip-norm 5.0 --ckpt-in $CK/x4_holdout_sc.npz \
      --seed 55 --ckpt-out $CK/x${S}_holdout_scft.npz \
      || { echo SCFT_TRAIN_FAILED_$S; exit 1; }
  fi
  run eval --scale $S --variant codon_sc --scale-cond \
      --ckpt $CK/x${S}_holdout_scft.npz --tta8 --no-save \
      --json $CK/x${S}_holdout_scft_tta8_eval.json
done
mark SCFT_DONE

python scripts/refresh_evidence.py || true
mark S5B_DONE
rm -f /tmp/r5s5b.pid
