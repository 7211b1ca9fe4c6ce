#!/bin/bash
# Round-4 session-2 chain: the phase-P/Q/R queue re-flattened after the VM
# restart killed the original pid-gated sequence. Priority order follows
# VERDICT r4: item 4 (x4 plain int8 < 1.778), item 3 (perf artifacts),
# item 2 (x4 shipping Art repair), item 1 (Art/Cones levers: l2 polish,
# patch-128, edge-bias), then x8/x16 gl members + static refreshes.
# /tmp/STOP_CHAIN stops at the next gate; every job is timeout-bounded.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 10800 python -m codon_tpu.cli "$@"; }
CK=checkpoints
stop_requested() { [ -f /tmp/STOP_CHAIN ]; }
mark() { echo "=== $1 $(date -u +%H:%M:%S)"; }

# ---- 1. cheap x4 evals: gl10 baselines + gl10-slotted ensembles (P1)
mark EVALS_START
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
mark EVALS_DONE

# ---- 2. item 4: x4 holdout int8-static from gl10, both handoff arms (Q1)
stop_requested && { echo STOPPED_AT_HOLDOUT_STATIC; exit 0; }
if [ ! -f $CK/x4_holdout_qat_gl.npz ]; then
run train --scale 4 --exclude $EX --qat --steps 2000 --lr 3e-5 --warmup 50 \
    --ckpt-in $CK/x4_holdout_gl10.npz --ckpt-out $CK/x4_holdout_qat_gl.npz
fi
run train --scale 4 --exclude $EX --qat-static --steps 1500 --lr 3e-5 \
    --warmup 50 --ckpt-in $CK/x4_holdout_qat_gl.npz \
    --ckpt-out $CK/x4_holdout_qat_static_gl.npz
run eval --scale 4 --ckpt $CK/x4_holdout_qat_static_gl.npz --dtype int8 \
    --no-save --json $CK/x4_holdout_qat_static_gl_int8_eval.json
run eval --scale 4 --ckpt $CK/x4_holdout_qat_static_gl.npz --dtype int8 \
    --tta8 --no-save --json $CK/x4_holdout_qat_static_gl_int8_tta8_eval.json
run train --scale 4 --exclude $EX --qat-static --no-handoff --steps 1500 \
    --lr 3e-5 --warmup 50 --ckpt-in $CK/x4_holdout_qat_gl.npz \
    --ckpt-out $CK/x4_holdout_qat_static_glnh.npz
run eval --scale 4 --ckpt $CK/x4_holdout_qat_static_glnh.npz --dtype int8 \
    --no-save --json $CK/x4_holdout_qat_static_glnh_int8_eval.json
mark Q1_DONE

# ---- 3. item 3: perf accounting artifacts (Q3)
stop_requested && { echo STOPPED_AT_PERF; exit 0; }
timeout 3600 python scripts/perf_ablate_int8.py --json $CK/perf_ablate_r4.json
if [ -f $CK/perf_ablate_r4.json ]; then
  CONV=$(python -c "import json;print(round(json.load(open('$CK/perf_ablate_r4.json'))['conv_cells_ms'],1))")
  MEAS=$(python -c "import json;print(round(json.load(open('$CK/perf_ablate_r4.json'))['full_ms'],1))")
  timeout 1800 python scripts/perf_bound_int8.py --json $CK/perf_bound_r4.json \
      --convs-ms "$CONV" --measured-ms "$MEAS"
fi
mark PERF_DONE

# ---- 4. item 1 lever: RMSE-aligned l2 polish of gl10 (R1), + its QAT (R4)
stop_requested && { echo STOPPED_AT_L2; exit 0; }
if [ ! -f $CK/x4_holdout_gl10_l2.npz ]; then
run train --scale 4 --exclude $EX --augment full --loss l2 --grad-loss 1.0 \
    --patch 96 --batch 16 --steps 3000 --warmup 100 --lr 3e-5 --seed 53 \
    --ckpt-in $CK/x4_holdout_gl10.npz --ckpt-out $CK/x4_holdout_gl10_l2.npz
fi
run eval --scale 4 --ckpt $CK/x4_holdout_gl10_l2.npz --tta8 --no-save \
    --json $CK/x4_holdout_gl10_l2_tta8_eval.json
stop_requested && { echo STOPPED_AT_L2_STATIC; exit 0; }
if [ ! -f $CK/x4_holdout_qat_l2.npz ]; then
run train --scale 4 --exclude $EX --qat --steps 2000 --lr 3e-5 --warmup 50 \
    --ckpt-in $CK/x4_holdout_gl10_l2.npz --ckpt-out $CK/x4_holdout_qat_l2.npz
fi
run train --scale 4 --exclude $EX --qat-static --steps 1500 --lr 3e-5 \
    --warmup 50 --ckpt-in $CK/x4_holdout_qat_l2.npz \
    --ckpt-out $CK/x4_holdout_qat_static_l2.npz
run eval --scale 4 --ckpt $CK/x4_holdout_qat_static_l2.npz --dtype int8 \
    --no-save --json $CK/x4_holdout_qat_static_l2_int8_eval.json
mark L2_DONE

# ---- 5. item 2: shipping x4 repair (Q2)
stop_requested && { echo STOPPED_AT_SHIP3; exit 0; }
if [ ! -f $CK/x4_ship3.npz ]; then
run train --scale 4 --augment full --grad-loss 1.0 --patch 96 --batch 16 \
    --steps 20000 --warmup 500 --lr 1e-4 --seed 43 \
    --ckpt-in $CK/x4_ship.npz --ckpt-out $CK/x4_ship3.npz
fi
run eval --scale 4 --ckpt $CK/x4_ship3.npz --no-save \
    --json $CK/x4_ship3_eval.json
run train --scale 4 --qat --steps 2000 --lr 3e-5 --warmup 50 \
    --ckpt-in $CK/x4_ship3.npz --ckpt-out $CK/x4_ship3_qat.npz
run train --scale 4 --qat-static --steps 1500 --lr 3e-5 --warmup 50 \
    --ckpt-in $CK/x4_ship3_qat.npz --ckpt-out $CK/x4_ship3_qat_static.npz
run eval --scale 4 --ckpt $CK/x4_ship3_qat_static.npz --dtype int8 \
    --no-save --json $CK/x4_ship3_qat_static_int8_eval.json
run eval --scale 4 --ckpt $CK/x4_ship3_qat_static.npz --dtype int8 --tta \
    --no-save --json $CK/x4_ship3_qat_static_int8_tta_eval.json
run eval --scale 4 --ckpt $CK/x4_ship3_qat_static.npz --dtype int8 --tta8 \
    --no-save --json $CK/x4_ship3_qat_static_int8_tta8_eval.json
python scripts/check_regression.py \
    $CK/x4_ship_qat_static_int8_eval.json \
    $CK/x4_ship3_qat_static_int8_eval.json && echo SHIP3_GATE_PASSED \
    || echo SHIP3_GATE_FAILED
mark SHIP3_DONE

# ---- 6. item 1 lever: patch-128 member (R2) + new-member ensembles (R3)
stop_requested && { echo STOPPED_AT_P128; exit 0; }
if [ ! -f $CK/x4_holdout_p128.npz ]; then
run train --scale 4 --exclude $EX --augment full --grad-loss 1.0 \
    --patch 128 --batch 16 --steps 12000 --warmup 300 --lr 5e-5 --seed 59 \
    --ckpt-in $CK/x4_holdout_gl10.npz --ckpt-out $CK/x4_holdout_p128.npz
fi
run eval --scale 4 --ckpt $CK/x4_holdout_p128.npz --tta8 --no-save \
    --json $CK/x4_holdout_p128_tta8_eval.json
run eval --scale 4 --variant codon,codon \
    --ckpt $CK/x4_holdout_gl10.npz,$CK/x4_holdout_p128.npz \
    --tta8 --no-save --json $CK/x4_holdout_ens2gp_tta8_eval.json
run eval --scale 4 --variant codon,codon \
    --ckpt $CK/x4_holdout_gl10_l2.npz,$CK/x4_holdout_p128.npz \
    --tta8 --no-save --json $CK/x4_holdout_ens2lp_tta8_eval.json
mark P128_DONE

# ---- 7. item 6 closure: export matrix incl. int8+tta8, smoke loads (Q4)
stop_requested && { echo STOPPED_AT_EXPORT; exit 0; }
timeout 5400 python scripts/export_matrix.py --load-check \
    --out-dir artifacts | tee $CK/export_matrix_r4.jsonl
mark EXPORT_DONE

# ---- 8. item 1 lever: edge-biased member at x4 (P3)
stop_requested && { echo STOPPED_AT_EB; exit 0; }
if [ ! -f $CK/x4_holdout_eb.npz ]; then
run train --scale 4 --exclude $EX --augment full --grad-loss 1.0 \
    --edge-bias 0.5 \
    --patch 96 --batch 16 --steps 20000 --warmup 500 --lr 1e-4 --seed 37 \
    --ckpt-in $CK/x4_holdout2.npz --ckpt-out $CK/x4_holdout_eb.npz
fi
run eval --scale 4 --ckpt $CK/x4_holdout_eb.npz --tta8 --no-save \
    --json $CK/x4_holdout_eb_tta8_eval.json
run eval --scale 4 --variant codon,codon \
    --ckpt $CK/x4_holdout_gl10.npz,$CK/x4_holdout_eb.npz \
    --tta8 --no-save --json $CK/x4_holdout_ens2ge_tta8_eval.json
run eval --scale 4 --variant codon,codon,codon \
    --ckpt $CK/x4_holdout_gl10.npz,$CK/x4_holdout_eb.npz,$CK/x4_holdout_p128.npz \
    --tta8 --no-save --json $CK/x4_holdout_ens3gep_tta8_eval.json
mark EB_DONE

# ---- 9. gl10 members at x8/x16 (P2) + static refresh from best (R5)
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
for S in 8 16; do
  stop_requested && { echo STOPPED_AT_STATIC_X$S; exit 0; }
  BEST=$(python - "$S" <<'PYEOF'
import json, sys
S = sys.argv[1]
cands = [(f"checkpoints/x{S}_holdout_gl10.npz",
          f"checkpoints/x{S}_holdout_gl10_tta8_eval.json"),
         (f"checkpoints/x{S}_holdout_f5.npz",
          f"checkpoints/x{S}_holdout_f5_tta8_eval.json")]
best, bm = None, 1e9
for ck, ev in cands:
    try:
        m = json.load(open(ev))["mean_rmse"]
    except Exception:
        continue
    if m < bm:
        best, bm = ck, m
print(best or "")
PYEOF
)
  [ -z "$BEST" ] && { echo "NO_BEST_X$S"; continue; }
  echo "X${S}_STATIC_SEED=$BEST"
  VAR=codon; case "$BEST" in *_f5.npz) VAR=codon_f5;; esac
  if [ ! -f $CK/x${S}_holdout_qat_g2.npz ]; then
  run train --scale $S --exclude $EX --variant $VAR --qat --steps 2000 \
      --lr 3e-5 --warmup 50 --ckpt-in $BEST \
      --ckpt-out $CK/x${S}_holdout_qat_g2.npz
  fi
  run train --scale $S --exclude $EX --variant $VAR --qat-static \
      --steps 1500 --lr 3e-5 --warmup 50 \
      --ckpt-in $CK/x${S}_holdout_qat_g2.npz \
      --ckpt-out $CK/x${S}_holdout_qat_static_g2.npz
  run eval --scale $S --variant $VAR --ckpt $CK/x${S}_holdout_qat_static_g2.npz \
      --dtype int8 --no-save --json $CK/x${S}_holdout_qat_static_g2_int8_eval.json
  run eval --scale $S --variant $VAR --ckpt $CK/x${S}_holdout_qat_static_g2.npz \
      --dtype int8 --tta8 --no-save \
      --json $CK/x${S}_holdout_qat_static_g2_int8_tta8_eval.json
done
mark TAIL_DONE

timeout 1800 python bench.py
echo SESSION2_DONE
