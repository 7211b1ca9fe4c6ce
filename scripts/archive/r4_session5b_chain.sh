#!/bin/bash
# Round-4 session-5b chain (runs after r4_session5_chain.sh): the arms
# suggested by session-5's own early results.
#   1. ebp: edge-bias fine-tune of the BEST-PLAIN float ancestor
#      (x4_holdout.npz, plain 1.7771) with a pure-l1 objective — the
#      gl lineage hurts the plain path (gl10 plain 1.8295) while
#      edge-bias is the strongest quality lever; this aims it at
#      verdict item 4 (plain int8 < 1.778). If the float plain improves,
#      the proven qat->static tail follows.
#   2. x16 eb arm: edge-bias member at the one scale where the per-image
#      Art gap (-0.53) looks closable with bundled data (ART_CONES.md).
#   3. x8 eb arm: same recipe at x8, seeded from the better of f5gl/f5.
#   4. x4 pair probe: ebL + eb TTA8 ensemble (comparably-strong members).
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

# gate: wait for session 5 (guard on pid file existing first)
if [ -f /tmp/r4s5.pid ]; then
  P=$(cat /tmp/r4s5.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 30; done
fi
rm -f /tmp/STOP_CHAIN
echo $$ > /tmp/r4s5b.pid
mark S5B_START

# ---- 1. ebp: plain-path edge-bias arm (item 4)
stop_requested && { echo STOPPED_AT_EBP; exit 0; }
if [ ! -f $CK/x4_holdout_ebp.npz ]; then
run train --scale 4 --exclude $EX --augment full --edge-bias 0.5 \
    --patch 96 --batch 16 --steps 8000 --warmup 300 --lr 5e-5 --seed 47 \
    --ckpt-in $CK/x4_holdout.npz --ckpt-out $CK/x4_holdout_ebp.npz
fi
run eval --scale 4 --ckpt $CK/x4_holdout_ebp.npz --no-save \
    --json $CK/x4_holdout_ebp_eval.json
run eval --scale 4 --ckpt $CK/x4_holdout_ebp.npz --tta8 --no-save \
    --json $CK/x4_holdout_ebp_tta8_eval.json
M_EBP=$(mean $CK/x4_holdout_ebp_eval.json)
if lt "$M_EBP" "1.79"; then
  run train --scale 4 --exclude $EX --qat --steps 2000 --lr 3e-5 \
      --warmup 50 --ckpt-in $CK/x4_holdout_ebp.npz \
      --ckpt-out $CK/x4_holdout_qat_ebp.npz
  run train --scale 4 --exclude $EX --qat-static --steps 1500 --lr 3e-5 \
      --warmup 50 --ckpt-in $CK/x4_holdout_qat_ebp.npz \
      --ckpt-out $CK/x4_holdout_qat_static_ebp.npz
  run eval --scale 4 --ckpt $CK/x4_holdout_qat_static_ebp.npz \
      --dtype int8 --no-save \
      --json $CK/x4_holdout_qat_static_ebp_int8_eval.json
  run eval --scale 4 --ckpt $CK/x4_holdout_qat_static_ebp.npz \
      --dtype int8 --tta8 --no-save \
      --json $CK/x4_holdout_qat_static_ebp_int8_tta8_eval.json
else
  echo EBP_PLAIN_NO_IMPROVEMENT_SKIP_QAT
fi
mark EBP_DONE

# ---- 2. x16 eb arm (item 1 at the closable scale)
stop_requested && { echo STOPPED_AT_X16EB; exit 0; }
SEED16=$CK/x16_holdout_f5gl.npz
M_GL=$(mean $CK/x16_holdout_f5gl_tta8_eval.json)
if [ -f $CK/x16_holdout_f5gl2.npz ]; then
  M2=$(mean $CK/x16_holdout_f5gl2_tta8_eval.json)
  lt "$M2" "$M_GL" && SEED16=$CK/x16_holdout_f5gl2.npz
fi
if [ ! -f $CK/x16_holdout_eb.npz ]; then
run train --scale 16 --exclude $EX --variant codon_f5 --augment full \
    --grad-loss 1.0 --edge-bias 0.5 --patch 96 --batch 16 --steps 8000 \
    --warmup 300 --lr 5e-5 --seed 53 --ckpt-in "$SEED16" \
    --ckpt-out $CK/x16_holdout_eb.npz
fi
run eval --scale 16 --variant codon_f5 --ckpt $CK/x16_holdout_eb.npz \
    --tta8 --no-save --json $CK/x16_holdout_eb_tta8_eval.json
mark X16EB_DONE

# ---- 3. x8 eb arm
stop_requested && { echo STOPPED_AT_X8EB; exit 0; }
SEED8=$CK/x8_holdout_f5.npz
if [ -f $CK/x8_holdout_f5gl.npz ]; then
  M_GL8=$(mean $CK/x8_holdout_f5gl_tta8_eval.json)
  M_F58=$(mean $CK/x8_holdout_f5_tta8_eval.json)
  lt "$M_GL8" "$M_F58" && SEED8=$CK/x8_holdout_f5gl.npz
fi
if [ ! -f $CK/x8_holdout_eb.npz ]; then
run train --scale 8 --exclude $EX --variant codon_f5 --augment full \
    --grad-loss 1.0 --edge-bias 0.5 --patch 96 --batch 16 --steps 8000 \
    --warmup 300 --lr 5e-5 --seed 54 --ckpt-in "$SEED8" \
    --ckpt-out $CK/x8_holdout_eb.npz
fi
run eval --scale 8 --variant codon_f5 --ckpt $CK/x8_holdout_eb.npz \
    --tta8 --no-save --json $CK/x8_holdout_eb_tta8_eval.json
mark X8EB_DONE

# ---- 4. x4 pair probe: ebL + eb (only if ebL landed and is comparably
# strong — the round-3 ensembling rule)
stop_requested && { echo STOPPED_AT_PAIR; exit 0; }
if [ -f $CK/x4_holdout_ebL.npz ]; then
run eval --scale 4 --variant codon,codon \
    --ckpt $CK/x4_holdout_ebL.npz,$CK/x4_holdout_eb.npz \
    --tta8 --no-save --json $CK/x4_holdout_ens2ebl_tta8_eval.json
fi
mark PAIR_DONE

echo SESSION5B_DONE
