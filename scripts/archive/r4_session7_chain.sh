#!/bin/bash
# Round-4 session-7 chain (runs after r4_session6b_chain.sh).
# Session-6 landed: x8 eb static lineage = new x8 holdout int8 bests
# (plain 3.116 / TTA8 2.681); both x8 and x16 ship4 refreshes failed
# their gates (retries from float ancestors run in 6b). This session:
#   1. x4 ebL static lineage — the best x4 float member (TTA8 1.4096)
#      has no int8 lineage; eb's static kept 98% of its float quality,
#      so ebL-static should beat the standing 1.4634 int8 TTA8 best.
#   2. Conditional: two/three-member plain-int8 static ensembles with
#      ebL-static slotted in (standing plain-ensemble best 1.7191).
#   3. Final bench.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 10800 python -m codon_tpu.cli "$@"; }
CK=checkpoints
stop_requested() { [ -f /tmp/STOP_CHAIN ]; }
mark() { echo "=== $1 $(date -u +%H:%M:%S)"; }
mean() { python -c "import json;print(json.load(open('$1'))['mean_rmse'])" 2>/dev/null || echo 1e9; }
lt() { python -c "import sys;sys.exit(0 if float('$1') < float('$2') else 1)"; }

# wait for session 6, then session 6b (6b writes its pid only once 6
# exits, so poll for the file appearing before waiting on the pid)
if [ -f /tmp/r4s6.pid ]; then
  P=$(cat /tmp/r4s6.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 30; done
fi
for i in $(seq 1 40); do [ -f /tmp/r4s6b.pid ] && break; sleep 15; done
if [ -f /tmp/r4s6b.pid ]; then
  P=$(cat /tmp/r4s6b.pid)
  sleep 60
  while kill -0 "$P" 2>/dev/null; do sleep 30; done
fi
rm -f /tmp/STOP_CHAIN
echo $$ > /tmp/r4s7.pid
mark S7_START

# ---- 1. x4 ebL static lineage
stop_requested && { echo STOPPED_AT_EBL_STATIC; exit 0; }
if [ ! -f $CK/x4_holdout_qat_ebL.npz ]; then
run train --scale 4 --exclude $EX --qat --steps 2000 --lr 3e-5 \
    --warmup 50 --ckpt-in $CK/x4_holdout_ebL.npz \
    --ckpt-out $CK/x4_holdout_qat_ebL.npz
fi
if [ ! -f $CK/x4_holdout_qat_static_ebL.npz ]; then
run train --scale 4 --exclude $EX --qat-static --steps 1500 --lr 3e-5 \
    --warmup 50 --ckpt-in $CK/x4_holdout_qat_ebL.npz \
    --ckpt-out $CK/x4_holdout_qat_static_ebL.npz
fi
run eval --scale 4 --ckpt $CK/x4_holdout_qat_static_ebL.npz --dtype int8 \
    --no-save --json $CK/x4_holdout_qat_static_ebL_int8_eval.json
run eval --scale 4 --ckpt $CK/x4_holdout_qat_static_ebL.npz --dtype int8 \
    --tta8 --no-save \
    --json $CK/x4_holdout_qat_static_ebL_int8_tta8_eval.json
mark EBL_STATIC_DONE

# ---- 2. conditional plain-int8 static ensembles (comparably-strong
# rule: only if ebL-static plain lands within 0.08 of ebp's 1.7308)
stop_requested && { echo STOPPED_AT_ENS; exit 0; }
M_EBL=$(mean $CK/x4_holdout_qat_static_ebL_int8_eval.json)
if lt "$M_EBL" "1.81"; then
run eval --scale 4 --variant codon,codon \
    --ckpt $CK/x4_holdout_qat_static_ebL.npz,$CK/x4_holdout_qat_static_ebp.npz \
    --dtype int8 --no-save \
    --json $CK/x4_holdout_qat_static_ens2le_int8_plain_eval.json
run eval --scale 4 --variant codon,codon,codon \
    --ckpt $CK/x4_holdout_qat_static_ebL.npz,$CK/x4_holdout_qat_static_ebp.npz,$CK/x4_holdout_qat_static_eb.npz \
    --dtype int8 --no-save \
    --json $CK/x4_holdout_qat_static_ens3le_int8_plain_eval.json
# int8 TTA8 pair: ebL-static + eb-static (standing int8 TTA8 best 1.4634)
run eval --scale 4 --variant codon,codon \
    --ckpt $CK/x4_holdout_qat_static_ebL.npz,$CK/x4_holdout_qat_static_eb.npz \
    --dtype int8 --tta8 --no-save \
    --json $CK/x4_holdout_qat_static_ens2le_int8_tta8_eval.json
else
  echo EBL_STATIC_TOO_WEAK_FOR_ENSEMBLES
fi
mark ENS_DONE

timeout 1800 python bench.py
echo SESSION7_DONE
