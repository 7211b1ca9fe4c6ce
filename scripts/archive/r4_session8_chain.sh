#!/bin/bash
# Round-4 session-8 chain (runs after r4_session7_chain.sh).
# Replicate the x4 structural win at x8: the best x4 float result is a
# PAIR of comparably-strong, recipe-diverse members (ebL + p128L, 0.026
# apart, 1.4076). x8 now has ebL (2.4898) but no patch-128 member. Train
# one from the gl ancestor (maximal recipe diversity vs ebL's edge-bias
# ancestry, mirroring x4's p128L-from-gl10), then pair if comparably
# strong. x16 analog runs only if the x8 pair wins.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 10800 python -m codon_tpu.cli "$@"; }
CK=checkpoints
stop_requested() { [ -f /tmp/STOP_CHAIN ]; }
mark() { echo "=== $1 $(date -u +%H:%M:%S)"; }
mean() { python -c "import json;print(json.load(open('$1'))['mean_rmse'])" 2>/dev/null || echo 1e9; }
lt() { python -c "import sys;sys.exit(0 if float('$1') < float('$2') else 1)"; }

# wait for session 7 (its pid file appears only once 6b exits)
for i in $(seq 1 1000); do [ -f /tmp/r4s7.pid ] && break; sleep 30; done
if [ -f /tmp/r4s7.pid ]; then
  P=$(cat /tmp/r4s7.pid)
  sleep 60
  while kill -0 "$P" 2>/dev/null; do sleep 30; done
fi
rm -f /tmp/STOP_CHAIN
echo $$ > /tmp/r4s8.pid
mark S8_START

# ---- 1. x8 p128 member (12k, patch 128, grad-loss, NO edge-bias,
# from the f5gl ancestor — the recipe-diverse branch point)
stop_requested && { echo STOPPED_AT_P128_X8; exit 0; }
if [ ! -f $CK/x8_holdout_p128.npz ]; then
run train --scale 8 --exclude $EX --variant codon_f5 --augment full \
    --grad-loss 1.0 --patch 128 --batch 16 --steps 12000 --warmup 300 \
    --lr 5e-5 --seed 108 --ckpt-in $CK/x8_holdout_f5gl.npz \
    --ckpt-out $CK/x8_holdout_p128.npz
fi
run eval --scale 8 --variant codon_f5 --ckpt $CK/x8_holdout_p128.npz \
    --tta8 --no-save --json $CK/x8_holdout_p128_tta8_eval.json
mark P128_X8_DONE

# ---- 2. pair with ebL if comparably strong (within 0.08 of 2.4898)
M_P=$(mean $CK/x8_holdout_p128_tta8_eval.json)
if lt "$M_P" "2.57"; then
run eval --scale 8 --variant codon_f5,codon_f5 \
    --ckpt $CK/x8_holdout_ebL.npz,$CK/x8_holdout_p128.npz \
    --tta8 --no-save --json $CK/x8_holdout_ens2elp_tta8_eval.json
else
  echo P128_X8_TOO_WEAK_FOR_PAIR
fi
mark PAIR_X8_DONE

# ---- 3. x16 analog, ONLY if the x8 pair beat the ebL solo
stop_requested && { echo STOPPED_AT_X16; exit 0; }
M_PAIR=$(mean $CK/x8_holdout_ens2elp_tta8_eval.json)
if lt "$M_PAIR" "2.4898"; then
  if [ ! -f $CK/x16_holdout_p128.npz ]; then
  run train --scale 16 --exclude $EX --variant codon_f5 --augment full \
      --grad-loss 1.0 --patch 128 --batch 16 --steps 12000 --warmup 300 \
      --lr 5e-5 --seed 116 --ckpt-in $CK/x16_holdout_f5gl2.npz \
      --ckpt-out $CK/x16_holdout_p128.npz
  fi
  run eval --scale 16 --variant codon_f5 --ckpt $CK/x16_holdout_p128.npz \
      --tta8 --no-save --json $CK/x16_holdout_p128_tta8_eval.json
  M_P16=$(mean $CK/x16_holdout_p128_tta8_eval.json)
  if lt "$M_P16" "3.52"; then
  run eval --scale 16 --variant codon_f5,codon_f5 \
      --ckpt $CK/x16_holdout_ebL.npz,$CK/x16_holdout_p128.npz \
      --tta8 --no-save --json $CK/x16_holdout_ens2elp_tta8_eval.json
  fi
  mark X16_DONE
else
  echo X8_PAIR_NO_WIN_SKIP_X16
fi
echo SESSION8_DONE
