#!/bin/bash
# Round-4 session-4 chain: runs after session 3. With measured train rates
# (~25 steps/s at patch 96/batch 16, so 20k steps ~ 15-20 min + compile)
# the remaining queue fits easily: gl members at x8 (+x16 extension),
# full-length versions of whichever x4 8k probes improved, static
# refreshes from the new bests, an optional shipping-mean upgrade, bench.
# /tmp/STOP_CHAIN stops at the next gate; every job is timeout-bounded.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 10800 python -m codon_tpu.cli "$@"; }
CK=checkpoints
stop_requested() { [ -f /tmp/STOP_CHAIN ]; }
mark() { echo "=== $1 $(date -u +%H:%M:%S)"; }
mean() { python -c "import json;print(json.load(open('$1'))['mean_rmse'])" 2>/dev/null || echo 1e9; }
# lt A B: 1 if A < B
lt() { python -c "import sys;sys.exit(0 if float('$1') < float('$2') else 1)"; }

# ---- gate: wait for session 3 (guard on pid file existing first)
if [ -f /tmp/r4s3.pid ]; then
  P=$(cat /tmp/r4s3.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 30; done
fi
rm -f /tmp/STOP_CHAIN
echo $$ > /tmp/r4s4.pid
mark S4_START

# ---- 0. item 2 first: shipping repair via the PROVEN 20k gl recipe.
# The session-3 cheap repair (2.5k Art-oversampled QAT-static fine-tune)
# REGRESSED across the board (ship2r mean 2.49 — full-augment shift on a
# flips-only ancestry at short horizon); ship4 instead runs the exact
# recipe that produced gl10 and its clean static: 20k full-augment
# grad-loss float retrain on all 10 from the ship2 float base, then
# qat -> qat-static. Gate: per-image non-regression vs ship2 (the
# checkpoint being replaced) per PARITY.md's rule.
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

# ---- 0b. item 4, two cheap arms on the best-quantizing ancestry (the
# 1.805 plain record came from qat_b -> 1.5k-step static): (A) an
# RMSE-aligned l2-loss static phase — the l2 FLOAT polish was a measured
# negative (plain 1.914 vs gl10 1.830) but the static phase is where
# plain-int8 quality is decided and has only ever used l1; (B) a longer
# (4k-step) static phase from the same ancestor.
stop_requested && { echo STOPPED_AT_ITEM4_ARMS; exit 0; }
run train --scale 4 --exclude $EX --qat-static --loss l2 --steps 1500 \
    --lr 3e-5 --warmup 50 --ckpt-in $CK/x4_holdout_qat_b.npz \
    --ckpt-out $CK/x4_holdout_qat_static_bl2.npz
run eval --scale 4 --ckpt $CK/x4_holdout_qat_static_bl2.npz --dtype int8 \
    --no-save --json $CK/x4_holdout_qat_static_bl2_int8_eval.json
run train --scale 4 --exclude $EX --qat-static --steps 4000 \
    --lr 3e-5 --warmup 50 --ckpt-in $CK/x4_holdout_qat_b.npz \
    --ckpt-out $CK/x4_holdout_qat_static_b4k.npz
run eval --scale 4 --ckpt $CK/x4_holdout_qat_static_b4k.npz --dtype int8 \
    --no-save --json $CK/x4_holdout_qat_static_b4k_int8_eval.json
# (C) plain no-TTA int8 ensemble of the two best static members — the
# only untried no-TTA int8-static config (2x compute, still plain path)
run eval --scale 4 --variant codon,codon \
    --ckpt $CK/x4_holdout_qat_static_b.npz,$CK/x4_holdout_qat_static_glnh.npz \
    --dtype int8 --no-save \
    --json $CK/x4_holdout_qat_static_ens2bg_int8_plain_eval.json
mark ITEM4_ARMS_DONE

# ---- 1. x8 gl member on top of the f5 best (mirrors the winning x4/x16
# recipe: grad-loss fine-tune of the strongest member)
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

# ---- 2. x16 gl extension: continue the 8k arm another 12k if it improved
stop_requested && { echo STOPPED_AT_X16EXT; exit 0; }
M_GL=$(mean $CK/x16_holdout_f5gl_tta8_eval.json)
M_F5=$(mean $CK/x16_holdout_f5_tta8_eval.json)
if [ -f $CK/x16_holdout_f5gl.npz ] && lt "$M_GL" "$M_F5"; then
  if [ ! -f $CK/x16_holdout_f5gl2.npz ]; then
  run train --scale 16 --exclude $EX --variant codon_f5 --augment full \
      --grad-loss 1.0 --patch 96 --batch 16 --steps 12000 --warmup 300 \
      --lr 5e-5 --seed 32 --ckpt-in $CK/x16_holdout_f5gl.npz \
      --ckpt-out $CK/x16_holdout_f5gl2.npz
  fi
  run eval --scale 16 --variant codon_f5 --ckpt $CK/x16_holdout_f5gl2.npz \
      --tta8 --no-save --json $CK/x16_holdout_f5gl2_tta8_eval.json
else
  echo X16GL_NO_IMPROVEMENT_SKIP_EXT
fi
mark X16EXT_DONE

# ---- 3. x4 probe extensions: whichever of eb/p128 improved on gl10 gets
# its full 20k version (fresh from gl10, longer schedule)
stop_requested && { echo STOPPED_AT_X4EXT; exit 0; }
M_GL10=$(mean $CK/x4_holdout_gl10_tta8_eval.json)
for probe in eb p128; do
  M_P=$(mean $CK/x4_holdout_${probe}_tta8_eval.json)
  if lt "$M_P" "$M_GL10"; then
    case $probe in
      eb)   EXTRA="--edge-bias 0.5 --patch 96";;
      p128) EXTRA="--patch 128";;
    esac
    if [ ! -f $CK/x4_holdout_${probe}L.npz ]; then
    run train --scale 4 --exclude $EX --augment full --grad-loss 1.0 \
        $EXTRA --batch 16 --steps 20000 --warmup 500 --lr 1e-4 --seed 41 \
        --ckpt-in $CK/x4_holdout_gl10.npz \
        --ckpt-out $CK/x4_holdout_${probe}L.npz
    fi
    run eval --scale 4 --ckpt $CK/x4_holdout_${probe}L.npz --tta8 --no-save \
        --json $CK/x4_holdout_${probe}L_tta8_eval.json
  else
    echo "X4_${probe}_NO_IMPROVEMENT_SKIP_EXT"
  fi
done
mark X4EXT_DONE

# ---- 4. static refreshes from any new bests (x8/x16 gl members)
for S in 8 16; do
  stop_requested && { echo STOPPED_AT_STATIC_X$S; exit 0; }
  M_GL=$(mean $CK/x${S}_holdout_f5gl_tta8_eval.json)
  [ "$S" = 16 ] && { M2=$(mean $CK/x16_holdout_f5gl2_tta8_eval.json); \
    lt "$M2" "$M_GL" && M_GL=$M2; }
  M_F5=$(mean $CK/x${S}_holdout_f5_tta8_eval.json)
  if ! lt "$M_GL" "$M_F5"; then echo "X${S}_STATIC_SKIP"; continue; fi
  SEED=$CK/x${S}_holdout_f5gl.npz
  [ "$S" = 16 ] && [ -f $CK/x16_holdout_f5gl2.npz ] && \
    lt "$(mean $CK/x16_holdout_f5gl2_tta8_eval.json)" \
       "$(mean $CK/x16_holdout_f5gl_tta8_eval.json)" && \
    SEED=$CK/x16_holdout_f5gl2.npz
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
echo SESSION4_DONE
