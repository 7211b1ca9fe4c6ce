#!/bin/bash
# Round-4 session-6 chain (after session 5/5b closed verdict items 2+4
# and made eb the cross-scale quality lever). This session:
#   0. x4 pair probe: ebL + p128L (comparably strong 1.410/1.436,
#      maximally diverse recipes) — cheapest shot at a new x4 best and
#      an Art nudge.
#   1. x8 shipping refresh via the PROVEN ship4 recipe (+edge-bias):
#      20k gl+eb full-augment from the static ancestor, qat->static,
#      per-image check_regression gate. Targets the Rocks/Teddy losses.
#   2. x16 shipping refresh: same.
#   3. x8 eb static lineage (holdout int8 refresh from the new best
#      float member).
#   4. x16 eb static lineage.
#   5. x8 ebL extension (+12k on eb; x4 gained 1.494->1.410 at 8k->20k).
#   6. x16 ebL extension.
#   7. x4 ebLb second seed for a comparably-strong 20k pair.
#   8. bench.
# /tmp/STOP_CHAIN stops at the next gate; every job is timeout-bounded.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 10800 python -m codon_tpu.cli "$@"; }
CK=checkpoints
stop_requested() { [ -f /tmp/STOP_CHAIN ]; }
mark() { echo "=== $1 $(date -u +%H:%M:%S)"; }
mean() { python -c "import json;print(json.load(open('$1'))['mean_rmse'])" 2>/dev/null || echo 1e9; }
lt() { python -c "import sys;sys.exit(0 if float('$1') < float('$2') else 1)"; }

rm -f /tmp/STOP_CHAIN
echo $$ > /tmp/r4s6.pid
mark S6_START

# ---- 0. x4 pair probe: ebL + p128L
if [ ! -f $CK/x4_holdout_ens2elp_tta8_eval.json ]; then
run eval --scale 4 --variant codon,codon \
    --ckpt $CK/x4_holdout_ebL.npz,$CK/x4_holdout_p128L.npz \
    --tta8 --no-save --json $CK/x4_holdout_ens2elp_tta8_eval.json
fi
mark PAIR_ELP_DONE

# ---- 1+2. x8/x16 shipping refreshes (all-10 training; gate vs the
# round-3 shipping static's own eval)
for S in 8 16; do
  stop_requested && { echo STOPPED_AT_SHIP_X$S; exit 0; }
  if [ ! -f $CK/x${S}_ship4.npz ]; then
  run train --scale $S --augment full --grad-loss 1.0 --edge-bias 0.5 \
      --patch 96 --batch 16 --steps 20000 --warmup 500 --lr 1e-4 \
      --seed 6$S --ckpt-in $CK/x${S}_qat_static2.npz \
      --ckpt-out $CK/x${S}_ship4.npz
  fi
  if [ ! -f $CK/x${S}_ship4_qat.npz ]; then
  run train --scale $S --qat --steps 2000 --lr 3e-5 --warmup 50 \
      --ckpt-in $CK/x${S}_ship4.npz --ckpt-out $CK/x${S}_ship4_qat.npz
  fi
  if [ ! -f $CK/x${S}_ship4_qat_static.npz ]; then
  run train --scale $S --qat-static --steps 1500 --lr 3e-5 --warmup 50 \
      --ckpt-in $CK/x${S}_ship4_qat.npz \
      --ckpt-out $CK/x${S}_ship4_qat_static.npz
  fi
  run eval --scale $S --ckpt $CK/x${S}_ship4_qat_static.npz --dtype int8 \
      --no-save --json $CK/x${S}_ship4_qat_static_int8_eval.json
  run eval --scale $S --ckpt $CK/x${S}_ship4_qat_static.npz --dtype int8 \
      --tta8 --no-save \
      --json $CK/x${S}_ship4_qat_static_int8_tta8_eval.json
  python scripts/check_regression.py \
      $CK/x${S}_qat_static2_int8_eval.json \
      $CK/x${S}_ship4_qat_static_int8_eval.json \
      && echo SHIP4_X${S}_GATE_PASSED || echo SHIP4_X${S}_GATE_FAILED
  mark SHIP_X${S}_DONE
done

# ---- 3+4. x8/x16 eb static lineages (holdout int8 refresh)
for S in 8 16; do
  stop_requested && { echo STOPPED_AT_EBSTATIC_X$S; exit 0; }
  if [ ! -f $CK/x${S}_holdout_qat_eb.npz ]; then
  run train --scale $S --exclude $EX --variant codon_f5 --qat \
      --steps 2000 --lr 3e-5 --warmup 50 \
      --ckpt-in $CK/x${S}_holdout_eb.npz \
      --ckpt-out $CK/x${S}_holdout_qat_eb.npz
  fi
  if [ ! -f $CK/x${S}_holdout_qat_static_eb.npz ]; then
  run train --scale $S --exclude $EX --variant codon_f5 --qat-static \
      --steps 1500 --lr 3e-5 --warmup 50 \
      --ckpt-in $CK/x${S}_holdout_qat_eb.npz \
      --ckpt-out $CK/x${S}_holdout_qat_static_eb.npz
  fi
  run eval --scale $S --variant codon_f5 \
      --ckpt $CK/x${S}_holdout_qat_static_eb.npz --dtype int8 --no-save \
      --json $CK/x${S}_holdout_qat_static_eb_int8_eval.json
  run eval --scale $S --variant codon_f5 \
      --ckpt $CK/x${S}_holdout_qat_static_eb.npz --dtype int8 --tta8 \
      --no-save --json $CK/x${S}_holdout_qat_static_eb_int8_tta8_eval.json
  mark EBSTATIC_X${S}_DONE
done

# ---- 5+6. x8/x16 ebL extensions (+12k)
for S in 8 16; do
  stop_requested && { echo STOPPED_AT_EBL_X$S; exit 0; }
  if [ ! -f $CK/x${S}_holdout_ebL.npz ]; then
  run train --scale $S --exclude $EX --variant codon_f5 --augment full \
      --grad-loss 1.0 --edge-bias 0.5 --patch 96 --batch 16 \
      --steps 12000 --warmup 300 --lr 5e-5 --seed 7$S \
      --ckpt-in $CK/x${S}_holdout_eb.npz \
      --ckpt-out $CK/x${S}_holdout_ebL.npz
  fi
  run eval --scale $S --variant codon_f5 --ckpt $CK/x${S}_holdout_ebL.npz \
      --tta8 --no-save --json $CK/x${S}_holdout_ebL_tta8_eval.json
  mark EBL_X${S}_DONE
done

# ---- 7. x4 second 20k eb seed for a comparably-strong pair
stop_requested && { echo STOPPED_AT_EBLB; exit 0; }
if [ ! -f $CK/x4_holdout_ebLb.npz ]; then
run train --scale 4 --exclude $EX --augment full --grad-loss 1.0 \
    --edge-bias 0.5 --patch 96 --batch 16 --steps 20000 --warmup 500 \
    --lr 1e-4 --seed 97 --ckpt-in $CK/x4_holdout_gl10.npz \
    --ckpt-out $CK/x4_holdout_ebLb.npz
fi
run eval --scale 4 --ckpt $CK/x4_holdout_ebLb.npz --tta8 --no-save \
    --json $CK/x4_holdout_ebLb_tta8_eval.json
M_B=$(mean $CK/x4_holdout_ebLb_tta8_eval.json)
if lt "$M_B" "1.46"; then
run eval --scale 4 --variant codon,codon \
    --ckpt $CK/x4_holdout_ebL.npz,$CK/x4_holdout_ebLb.npz \
    --tta8 --no-save --json $CK/x4_holdout_ens2ebll_tta8_eval.json
else
  echo EBLB_TOO_WEAK_FOR_PAIR
fi
mark EBLB_DONE

timeout 1800 python bench.py
echo SESSION6_DONE
