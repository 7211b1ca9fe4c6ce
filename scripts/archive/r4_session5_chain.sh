#!/bin/bash
# Round-4 session-5 chain: relaunch after the VM restart killed session 4
# at step ~10.6k of the ship4 retrain. Session-3's probes landed big:
# eb (edge-bias 0.5) is the new x4 holdout best (TTA8 1.4942 vs gl10
# 1.5470) and x16 f5gl is the new x16 best (3.7264 vs 3.782).
# Order: cheap plain evals -> item-4 arms -> ship4 (item 2) -> ebL
# extension -> eb static lineage -> x8 gl member -> x16 gl extension ->
# static refreshes -> bench. /tmp/STOP_CHAIN stops at the next gate;
# every job is timeout-bounded.
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
echo $$ > /tmp/r4s5.pid
mark S5_START

# ---- 0. cheap plain (no-TTA) float evals of the new members, to decide
# which ancestry feeds the item-4 static attempt (plain-path quality is
# what quantizes through; gl10's weak plain 1.8295 carried through QAT).
if [ ! -f $CK/x4_holdout_eb_eval.json ]; then
run eval --scale 4 --ckpt $CK/x4_holdout_eb.npz --no-save \
    --json $CK/x4_holdout_eb_eval.json
fi
if [ ! -f $CK/x4_holdout_p128_eval.json ]; then
run eval --scale 4 --ckpt $CK/x4_holdout_p128.npz --no-save \
    --json $CK/x4_holdout_p128_eval.json
fi
mark PLAIN_EVALS_DONE

# ---- 1. item 4 arms on the best-quantizing ancestry (qat_b -> 1.805):
# (A) l2-loss static phase (RMSE-aligned exactly where plain int8 quality
# is decided); (B) longer 4k static; (C) plain no-TTA int8 two-member
# ensemble of the best statics.
stop_requested && { echo STOPPED_AT_ITEM4_ARMS; exit 0; }
if [ ! -f $CK/x4_holdout_qat_static_bl2.npz ]; then
run train --scale 4 --exclude $EX --qat-static --loss l2 --steps 1500 \
    --lr 3e-5 --warmup 50 --ckpt-in $CK/x4_holdout_qat_b.npz \
    --ckpt-out $CK/x4_holdout_qat_static_bl2.npz
fi
run eval --scale 4 --ckpt $CK/x4_holdout_qat_static_bl2.npz --dtype int8 \
    --no-save --json $CK/x4_holdout_qat_static_bl2_int8_eval.json
if [ ! -f $CK/x4_holdout_qat_static_b4k.npz ]; then
run train --scale 4 --exclude $EX --qat-static --steps 4000 \
    --lr 3e-5 --warmup 50 --ckpt-in $CK/x4_holdout_qat_b.npz \
    --ckpt-out $CK/x4_holdout_qat_static_b4k.npz
fi
run eval --scale 4 --ckpt $CK/x4_holdout_qat_static_b4k.npz --dtype int8 \
    --no-save --json $CK/x4_holdout_qat_static_b4k_int8_eval.json
run eval --scale 4 --variant codon,codon \
    --ckpt $CK/x4_holdout_qat_static_b.npz,$CK/x4_holdout_qat_static_glnh.npz \
    --dtype int8 --no-save \
    --json $CK/x4_holdout_qat_static_ens2bg_int8_plain_eval.json
mark ITEM4_ARMS_DONE

# ---- 2. item 2: shipping repair via the PROVEN 20k gl recipe (restarted
# from scratch — the interrupted run saved no checkpoint). Gate:
# per-image non-regression vs ship2 per PARITY.md's rule.
stop_requested && { echo STOPPED_AT_SHIP4; exit 0; }
if [ ! -f $CK/x4_ship4.npz ]; then
run train --scale 4 --augment full --grad-loss 1.0 --patch 96 --batch 16 \
    --steps 20000 --warmup 500 --lr 1e-4 --seed 43 \
    --ckpt-in $CK/x4_ship2_qat_static.npz --ckpt-out $CK/x4_ship4.npz
fi
run train --scale 4 --qat --steps 2000 --lr 3e-5 --warmup 50 \
    --ckpt-in $CK/x4_ship4.npz --ckpt-out $CK/x4_ship4_qat.npz
run train --scale 4 --qat-static --steps 1500 --lr 3e-5 --warmup 50 \
    --ckpt-in $CK/x4_ship4_qat.npz --ckpt-out $CK/x4_ship4_qat_static.npz
run eval --scale 4 --ckpt $CK/x4_ship4_qat_static.npz --dtype int8 \
    --no-save --json $CK/x4_ship4_qat_static_int8_eval.json
run eval --scale 4 --ckpt $CK/x4_ship4_qat_static.npz --dtype int8 --tta8 \
    --no-save --json $CK/x4_ship4_qat_static_int8_tta8_eval.json
python scripts/check_regression.py \
    $CK/x4_ship2_qat_static_int8_eval.json \
    $CK/x4_ship4_qat_static_int8_eval.json && echo SHIP4_GATE_PASSED \
    || echo SHIP4_GATE_FAILED
mark SHIP4_DONE

# ---- 3. ebL: full 20k edge-bias member from gl10 (the 8k probe already
# leads; the full-length version mirrors how gl10 itself was made).
stop_requested && { echo STOPPED_AT_EBL; exit 0; }
if [ ! -f $CK/x4_holdout_ebL.npz ]; then
run train --scale 4 --exclude $EX --augment full --grad-loss 1.0 \
    --edge-bias 0.5 --patch 96 --batch 16 --steps 20000 --warmup 500 \
    --lr 1e-4 --seed 41 --ckpt-in $CK/x4_holdout_gl10.npz \
    --ckpt-out $CK/x4_holdout_ebL.npz
fi
run eval --scale 4 --ckpt $CK/x4_holdout_ebL.npz --tta8 --no-save \
    --json $CK/x4_holdout_ebL_tta8_eval.json
run eval --scale 4 --ckpt $CK/x4_holdout_ebL.npz --no-save \
    --json $CK/x4_holdout_ebL_eval.json
mark EBL_DONE

# ---- 4. eb static lineage: qat -> static from the better of eb/ebL.
# Feeds both the int8 TTA path (current best 1.5653) and, if the eb
# plain float is strong, the item-4 plain path.
stop_requested && { echo STOPPED_AT_EBSTATIC; exit 0; }
EBSEED=$CK/x4_holdout_eb.npz
M_EB=$(mean $CK/x4_holdout_eb_tta8_eval.json)
M_EBL=$(mean $CK/x4_holdout_ebL_tta8_eval.json)
lt "$M_EBL" "$M_EB" && EBSEED=$CK/x4_holdout_ebL.npz
if [ ! -f $CK/x4_holdout_qat_eb.npz ]; then
run train --scale 4 --exclude $EX --qat --steps 2000 --lr 3e-5 \
    --warmup 50 --ckpt-in "$EBSEED" --ckpt-out $CK/x4_holdout_qat_eb.npz
fi
run train --scale 4 --exclude $EX --qat-static --steps 1500 --lr 3e-5 \
    --warmup 50 --ckpt-in $CK/x4_holdout_qat_eb.npz \
    --ckpt-out $CK/x4_holdout_qat_static_eb.npz
run eval --scale 4 --ckpt $CK/x4_holdout_qat_static_eb.npz --dtype int8 \
    --no-save --json $CK/x4_holdout_qat_static_eb_int8_eval.json
run eval --scale 4 --ckpt $CK/x4_holdout_qat_static_eb.npz --dtype int8 \
    --tta8 --no-save \
    --json $CK/x4_holdout_qat_static_eb_int8_tta8_eval.json
mark EBSTATIC_DONE

# ---- 5. x8 gl member (mirrors the winning x4/x16 recipe)
stop_requested && { echo STOPPED_AT_X8GL; exit 0; }
if [ ! -f $CK/x8_holdout_f5gl.npz ]; then
run train --scale 8 --exclude $EX --variant codon_f5 --augment full \
    --grad-loss 1.0 --patch 96 --batch 16 --steps 12000 --warmup 300 \
    --lr 5e-5 --seed 31 --ckpt-in $CK/x8_holdout_f5.npz \
    --ckpt-out $CK/x8_holdout_f5gl.npz
fi
run eval --scale 8 --variant codon_f5 --ckpt $CK/x8_holdout_f5gl.npz \
    --tta8 --no-save --json $CK/x8_holdout_f5gl_tta8_eval.json
run eval --scale 8 --variant codon_f5,codon_f5 \
    --ckpt $CK/x8_holdout_f5gl.npz,$CK/x8_holdout_f5b.npz \
    --tta8 --no-save --json $CK/x8_holdout_ens2gl5_tta8_eval.json
mark X8GL_DONE

# ---- 6. x16 gl extension: the 8k arm improved (3.7264 < 3.782), so
# continue another 12k.
stop_requested && { echo STOPPED_AT_X16EXT; exit 0; }
if [ ! -f $CK/x16_holdout_f5gl2.npz ]; then
run train --scale 16 --exclude $EX --variant codon_f5 --augment full \
    --grad-loss 1.0 --patch 96 --batch 16 --steps 12000 --warmup 300 \
    --lr 5e-5 --seed 32 --ckpt-in $CK/x16_holdout_f5gl.npz \
    --ckpt-out $CK/x16_holdout_f5gl2.npz
fi
run eval --scale 16 --variant codon_f5 --ckpt $CK/x16_holdout_f5gl2.npz \
    --tta8 --no-save --json $CK/x16_holdout_f5gl2_tta8_eval.json
mark X16EXT_DONE

# ---- 7. static refreshes from any new x8/x16 gl bests
for S in 8 16; do
  stop_requested && { echo STOPPED_AT_STATIC_X$S; exit 0; }
  M_GL=$(mean $CK/x${S}_holdout_f5gl_tta8_eval.json)
  SEED=$CK/x${S}_holdout_f5gl.npz
  if [ "$S" = 16 ] && [ -f $CK/x16_holdout_f5gl2.npz ]; then
    M2=$(mean $CK/x16_holdout_f5gl2_tta8_eval.json)
    if lt "$M2" "$M_GL"; then M_GL=$M2; SEED=$CK/x16_holdout_f5gl2.npz; fi
  fi
  M_F5=$(mean $CK/x${S}_holdout_f5_tta8_eval.json)
  if ! lt "$M_GL" "$M_F5"; then echo "X${S}_STATIC_SKIP"; continue; fi
  if [ ! -f $CK/x${S}_holdout_qat_gl5.npz ]; then
  run train --scale $S --exclude $EX --variant codon_f5 --qat --steps 2000 \
      --lr 3e-5 --warmup 50 --ckpt-in "$SEED" \
      --ckpt-out $CK/x${S}_holdout_qat_gl5.npz
  fi
  run train --scale $S --exclude $EX --variant codon_f5 --qat-static \
      --steps 1500 --lr 3e-5 --warmup 50 \
      --ckpt-in $CK/x${S}_holdout_qat_gl5.npz \
      --ckpt-out $CK/x${S}_holdout_qat_static_gl5.npz
  run eval --scale $S --variant codon_f5 \
      --ckpt $CK/x${S}_holdout_qat_static_gl5.npz --dtype int8 --no-save \
      --json $CK/x${S}_holdout_qat_static_gl5_int8_eval.json
  run eval --scale $S --variant codon_f5 \
      --ckpt $CK/x${S}_holdout_qat_static_gl5.npz --dtype int8 --tta8 \
      --no-save --json $CK/x${S}_holdout_qat_static_gl5_int8_tta8_eval.json
done
mark STATIC_DONE

timeout 1800 python bench.py
echo SESSION5_DONE
