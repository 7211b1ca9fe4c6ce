#!/bin/bash
# Round-4 session-6b chain (runs after r4_session6_chain.sh).
# Session-6 finding: the 20k gl+eb retrain from the QAT-static ancestor
# REGRESSES a healthy shipping incumbent (x8 gate fail: plain 2.545 ->
# 2.820). Retry from the FLOAT selftrained ancestor instead (the
# in-sample optimum: x8 2.121 / x16 2.503 float) with the member-run
# hyperparameters (12k, lr 5e-5), for whichever scale's session-6
# refresh failed its gate.
#   1. x8 shipping retry + gate.
#   2. x16 shipping retry + gate (skipped if session-6's x16 passed).
#   3. If an x{8,16} ebL extension beat its eb member, re-run the
#      holdout static lineage from ebL.
#   4. x4 triple ensemble probe if ebLb landed comparably strong.
#   5. bench.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 10800 python -m codon_tpu.cli "$@"; }
CK=checkpoints
stop_requested() { [ -f /tmp/STOP_CHAIN ]; }
mark() { echo "=== $1 $(date -u +%H:%M:%S)"; }
mean() { python -c "import json;print(json.load(open('$1'))['mean_rmse'])" 2>/dev/null || echo 1e9; }
lt() { python -c "import sys;sys.exit(0 if float('$1') < float('$2') else 1)"; }
gate() { python scripts/check_regression.py "$1" "$2"; }

# wait for session 6 (guard on pid file existing first)
if [ -f /tmp/r4s6.pid ]; then
  P=$(cat /tmp/r4s6.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 30; done
fi
rm -f /tmp/STOP_CHAIN
echo $$ > /tmp/r4s6b.pid
mark S6B_START

# ---- 1+2. shipping retries from float selftrained ancestors
for S in 8 16; do
  stop_requested && { echo STOPPED_AT_SHIPRETRY_X$S; exit 0; }
  # skip if session-6's refresh already passed its gate
  if gate $CK/x${S}_qat_static2_int8_eval.json \
          $CK/x${S}_ship4_qat_static_int8_eval.json >/dev/null 2>&1; then
    echo X${S}_SHIP4_ALREADY_PASSED_SKIP_RETRY; continue
  fi
  if [ ! -f $CK/x${S}_ship5.npz ]; then
  run train --scale $S --augment full --grad-loss 1.0 --edge-bias 0.5 \
      --patch 96 --batch 16 --steps 12000 --warmup 300 --lr 5e-5 \
      --seed 8$S --ckpt-in $CK/x${S}_selftrained.npz \
      --ckpt-out $CK/x${S}_ship5.npz
  fi
  if [ ! -f $CK/x${S}_ship5_qat.npz ]; then
  run train --scale $S --qat --steps 2000 --lr 3e-5 --warmup 50 \
      --ckpt-in $CK/x${S}_ship5.npz --ckpt-out $CK/x${S}_ship5_qat.npz
  fi
  if [ ! -f $CK/x${S}_ship5_qat_static.npz ]; then
  run train --scale $S --qat-static --steps 1500 --lr 3e-5 --warmup 50 \
      --ckpt-in $CK/x${S}_ship5_qat.npz \
      --ckpt-out $CK/x${S}_ship5_qat_static.npz
  fi
  run eval --scale $S --ckpt $CK/x${S}_ship5_qat_static.npz --dtype int8 \
      --no-save --json $CK/x${S}_ship5_qat_static_int8_eval.json
  run eval --scale $S --ckpt $CK/x${S}_ship5_qat_static.npz --dtype int8 \
      --tta8 --no-save \
      --json $CK/x${S}_ship5_qat_static_int8_tta8_eval.json
  gate $CK/x${S}_qat_static2_int8_eval.json \
       $CK/x${S}_ship5_qat_static_int8_eval.json \
       && echo SHIP5_X${S}_GATE_PASSED || echo SHIP5_X${S}_GATE_FAILED
  mark SHIPRETRY_X${S}_DONE
done

# ---- 3. conditional: holdout static lineage from ebL where it beat eb
for S in 8 16; do
  stop_requested && { echo STOPPED_AT_EBLSTATIC_X$S; exit 0; }
  [ -f $CK/x${S}_holdout_ebL.npz ] || continue
  M_EBL=$(mean $CK/x${S}_holdout_ebL_tta8_eval.json)
  M_EB=$(mean $CK/x${S}_holdout_eb_tta8_eval.json)
  lt "$M_EBL" "$M_EB" || { echo X${S}_EBL_NOT_BETTER_SKIP; continue; }
  if [ ! -f $CK/x${S}_holdout_qat_ebL.npz ]; then
  run train --scale $S --exclude $EX --variant codon_f5 --qat \
      --steps 2000 --lr 3e-5 --warmup 50 \
      --ckpt-in $CK/x${S}_holdout_ebL.npz \
      --ckpt-out $CK/x${S}_holdout_qat_ebL.npz
  fi
  if [ ! -f $CK/x${S}_holdout_qat_static_ebL.npz ]; then
  run train --scale $S --exclude $EX --variant codon_f5 --qat-static \
      --steps 1500 --lr 3e-5 --warmup 50 \
      --ckpt-in $CK/x${S}_holdout_qat_ebL.npz \
      --ckpt-out $CK/x${S}_holdout_qat_static_ebL.npz
  fi
  run eval --scale $S --variant codon_f5 \
      --ckpt $CK/x${S}_holdout_qat_static_ebL.npz --dtype int8 --no-save \
      --json $CK/x${S}_holdout_qat_static_ebL_int8_eval.json
  run eval --scale $S --variant codon_f5 \
      --ckpt $CK/x${S}_holdout_qat_static_ebL.npz --dtype int8 --tta8 \
      --no-save --json $CK/x${S}_holdout_qat_static_ebL_int8_tta8_eval.json
  mark EBLSTATIC_X${S}_DONE
done

# ---- 4. x4 triple ensemble probe (ebL + p128L + ebLb), only if ebLb
# landed within 0.05 of ebL (comparably-strong rule)
stop_requested && { echo STOPPED_AT_TRIPLE; exit 0; }
if [ -f $CK/x4_holdout_ebLb.npz ]; then
  M_EBLB=$(mean $CK/x4_holdout_ebLb_tta8_eval.json)
  if lt "$M_EBLB" "1.46"; then
  run eval --scale 4 --variant codon,codon,codon \
      --ckpt $CK/x4_holdout_ebL.npz,$CK/x4_holdout_p128L.npz,$CK/x4_holdout_ebLb.npz \
      --tta8 --no-save --json $CK/x4_holdout_ens3ebl_tta8_eval.json
  else
    echo EBLB_TOO_WEAK_FOR_TRIPLE
  fi
fi
mark TRIPLE_DONE

timeout 1800 python bench.py
echo SESSION6B_DONE
