#!/bin/bash
# Round-4 session-3 chain: re-prioritized remainder of the session-2 queue.
# Session 2 runs items in an order that puts a 20k-step shipping retrain
# (~6h) ahead of the cheap verdict items; within the round's wall clock
# that would leave item 2 (shipping Art repair), item 3 (perf artifacts)
# and item 6 (TTA8 export) unlanded. This chain reorders: perf artifacts,
# CHEAP ship repair (scene-weighted 2.5k-step QAT-static fine-tune from
# ship2 instead of the 20k retrain), export matrix, then the l2 arm
# (items 1+4), soup probes (item 4), and a time-boxed p128 member.
# /tmp/STOP_CHAIN stops at the next gate; every job is timeout-bounded.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 10800 python -m codon_tpu.cli "$@"; }
CK=checkpoints
stop_requested() { [ -f /tmp/STOP_CHAIN ]; }
mark() { echo "=== $1 $(date -u +%H:%M:%S)"; }

# ---- gate: wait for the session-2 chain to exit (ADVICE: guard on the
# pid file existing before kill -0, so we never run two TPU clients)
if [ -f /tmp/r4s2.pid ]; then
  P=$(cat /tmp/r4s2.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 30; done
fi
rm -f /tmp/STOP_CHAIN
echo $$ > /tmp/r4s3.pid
mark S3_START

# ---- 1. item 3: perf accounting artifacts (from session-2 step 3)
timeout 3600 python scripts/perf_ablate_int8.py --json $CK/perf_ablate_r4.json
if [ -f $CK/perf_ablate_r4.json ]; then
  CONV=$(python -c "import json;print(round(json.load(open('$CK/perf_ablate_r4.json'))['conv_cells_ms'],1))")
  MEAS=$(python -c "import json;print(round(json.load(open('$CK/perf_ablate_r4.json'))['full_ms'],1))")
  timeout 1800 python scripts/perf_bound_int8.py --json $CK/perf_bound_r4.json \
      --convs-ms "$CONV" --measured-ms "$MEAS"
fi
mark PERF_DONE

# ---- 2. item 2: cheap shipping Art repair — Art-oversampled QAT-static
# fine-tune of ship2 (Art was absent from every ship2 ancestor; putting it
# in-sample is what the 20k retrain would do, at 1/8 the steps)
stop_requested && { echo STOPPED_AT_SHIPR; exit 0; }
if [ ! -f $CK/x4_ship2r_qat_static.npz ]; then
run train --scale 4 --qat-static --scene-weight Art=3 --steps 2500 \
    --lr 3e-5 --warmup 50 --ckpt-in $CK/x4_ship2_qat_static.npz \
    --ckpt-out $CK/x4_ship2r_qat_static.npz
fi
run eval --scale 4 --ckpt $CK/x4_ship2r_qat_static.npz --dtype int8 \
    --no-save --json $CK/x4_ship2r_qat_static_int8_eval.json
run eval --scale 4 --ckpt $CK/x4_ship2r_qat_static.npz --dtype int8 --tta \
    --no-save --json $CK/x4_ship2r_qat_static_int8_tta_eval.json
run eval --scale 4 --ckpt $CK/x4_ship2r_qat_static.npz --dtype int8 --tta8 \
    --no-save --json $CK/x4_ship2r_qat_static_int8_tta8_eval.json
python scripts/check_regression.py \
    $CK/x4_ship2_qat_static_int8_eval.json \
    $CK/x4_ship2r_qat_static_int8_eval.json && echo SHIPR_GATE_PASSED \
    || echo SHIPR_GATE_FAILED
mark SHIPR_DONE

# ---- 3. item 6 closure: export matrix incl. int8+tta8, smoke loads
stop_requested && { echo STOPPED_AT_EXPORT; exit 0; }
timeout 5400 python scripts/export_matrix.py --load-check \
    --out-dir artifacts | tee $CK/export_matrix_r4.jsonl
mark EXPORT_DONE

# ---- 4. items 1+4: RMSE-aligned l2 polish of gl10, + its QAT-static
stop_requested && { echo STOPPED_AT_L2; exit 0; }
if [ ! -f $CK/x4_holdout_gl10_l2.npz ]; then
run train --scale 4 --exclude $EX --augment full --loss l2 --grad-loss 1.0 \
    --patch 96 --batch 16 --steps 3000 --warmup 100 --lr 3e-5 --seed 53 \
    --ckpt-in $CK/x4_holdout_gl10.npz --ckpt-out $CK/x4_holdout_gl10_l2.npz
fi
run eval --scale 4 --ckpt $CK/x4_holdout_gl10_l2.npz --no-save \
    --json $CK/x4_holdout_gl10_l2_eval.json
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
run eval --scale 4 --ckpt $CK/x4_holdout_qat_static_l2.npz --dtype int8 \
    --tta8 --no-save --json $CK/x4_holdout_qat_static_l2_int8_tta8_eval.json
mark L2_DONE

# ---- 5. item 4: same-basin soup probes (zero-serving-cost plain lever)
stop_requested && { echo STOPPED_AT_SOUP; exit 0; }
python scripts/soup.py $CK/x4_holdout_soup_gl2.npz \
    $CK/x4_holdout_gl10.npz $CK/x4_holdout_gl10_l2.npz
run eval --scale 4 --ckpt $CK/x4_holdout_soup_gl2.npz --no-save \
    --json $CK/x4_holdout_soup_gl2_eval.json
run eval --scale 4 --ckpt $CK/x4_holdout_soup_gl2.npz --tta8 --no-save \
    --json $CK/x4_holdout_soup_gl2_tta8_eval.json
# gl10 is a 20k fine-tune FROM holdout2 — same basin by construction
python scripts/soup.py $CK/x4_holdout_soup_gh.npz \
    $CK/x4_holdout_gl10.npz $CK/x4_holdout2.npz
run eval --scale 4 --ckpt $CK/x4_holdout_soup_gh.npz --no-save \
    --json $CK/x4_holdout_soup_gh_eval.json
# if either soup beats the best plain float (1.777), take the better one
# through QAT-static for the item-4 plain-int8 attempt
BESTSOUP=$(python - <<'PYEOF'
import json
best, bm = "", 1.777
for ck, ev in [("checkpoints/x4_holdout_soup_gl2.npz",
                "checkpoints/x4_holdout_soup_gl2_eval.json"),
               ("checkpoints/x4_holdout_soup_gh.npz",
                "checkpoints/x4_holdout_soup_gh_eval.json")]:
    try:
        m = json.load(open(ev))["mean_rmse"]
    except Exception:
        continue
    if m < bm:
        best, bm = ck, m
print(best)
PYEOF
)
if [ -n "$BESTSOUP" ]; then
  echo "SOUP_STATIC_SEED=$BESTSOUP"
  run train --scale 4 --exclude $EX --qat --steps 2000 --lr 3e-5 \
      --warmup 50 --ckpt-in "$BESTSOUP" \
      --ckpt-out $CK/x4_holdout_qat_soup.npz
  run train --scale 4 --exclude $EX --qat-static --steps 1500 --lr 3e-5 \
      --warmup 50 --ckpt-in $CK/x4_holdout_qat_soup.npz \
      --ckpt-out $CK/x4_holdout_qat_static_soup.npz
  run eval --scale 4 --ckpt $CK/x4_holdout_qat_static_soup.npz --dtype int8 \
      --no-save --json $CK/x4_holdout_qat_static_soup_int8_eval.json
else
  echo SOUP_NO_PLAIN_WIN
fi
mark SOUP_DONE

# ---- 5b. item 1: the x16 Art/Cones attempt — gl fine-tune of the x16 f5
# best member. x16 holdout f5 TTA8 is at 7/10 wins with Art -0.55,
# Cones -0.40, Rocks -0.18 the only losses; grad-loss is the strongest
# single quality lever found (x4: 1.62 -> 1.55 solo) and is untried at
# x16. 8k steps time-boxed so the datapoint lands inside the round.
stop_requested && { echo STOPPED_AT_X16GL; exit 0; }
if [ ! -f $CK/x16_holdout_f5gl.npz ]; then
run train --scale 16 --exclude $EX --variant codon_f5 --augment full \
    --grad-loss 1.0 --patch 96 --batch 16 --steps 8000 --warmup 300 \
    --lr 5e-5 --seed 31 --ckpt-in $CK/x16_holdout_f5.npz \
    --ckpt-out $CK/x16_holdout_f5gl.npz
fi
run eval --scale 16 --variant codon_f5 --ckpt $CK/x16_holdout_f5gl.npz \
    --tta8 --no-save --json $CK/x16_holdout_f5gl_tta8_eval.json
run eval --scale 16 --variant codon_f5,codon_f5 \
    --ckpt $CK/x16_holdout_f5gl.npz,$CK/x16_holdout_f5.npz \
    --tta8 --no-save --json $CK/x16_holdout_ens2gl5_tta8_eval.json
mark X16GL_DONE

# ---- 6. item 1 lever: patch-128 member, time-boxed to 8k steps so the
# datapoint completes inside the round
stop_requested && { echo STOPPED_AT_P128; exit 0; }
if [ ! -f $CK/x4_holdout_p128.npz ]; then
run train --scale 4 --exclude $EX --augment full --grad-loss 1.0 \
    --patch 128 --batch 16 --steps 8000 --warmup 300 --lr 5e-5 --seed 59 \
    --ckpt-in $CK/x4_holdout_gl10.npz --ckpt-out $CK/x4_holdout_p128.npz
fi
run eval --scale 4 --ckpt $CK/x4_holdout_p128.npz --tta8 --no-save \
    --json $CK/x4_holdout_p128_tta8_eval.json
run eval --scale 4 --variant codon,codon \
    --ckpt $CK/x4_holdout_gl10.npz,$CK/x4_holdout_p128.npz \
    --tta8 --no-save --json $CK/x4_holdout_ens2gp_tta8_eval.json
mark P128_DONE

# ---- 7. item 1 lever: edge-biased member, time-boxed to 8k steps
stop_requested && { echo STOPPED_AT_EB; exit 0; }
if [ ! -f $CK/x4_holdout_eb.npz ]; then
run train --scale 4 --exclude $EX --augment full --grad-loss 1.0 \
    --edge-bias 0.5 \
    --patch 96 --batch 16 --steps 8000 --warmup 300 --lr 5e-5 --seed 37 \
    --ckpt-in $CK/x4_holdout_gl10.npz --ckpt-out $CK/x4_holdout_eb.npz
fi
run eval --scale 4 --ckpt $CK/x4_holdout_eb.npz --tta8 --no-save \
    --json $CK/x4_holdout_eb_tta8_eval.json
run eval --scale 4 --variant codon,codon \
    --ckpt $CK/x4_holdout_gl10.npz,$CK/x4_holdout_eb.npz \
    --tta8 --no-save --json $CK/x4_holdout_ens2ge_tta8_eval.json
mark EB_DONE

timeout 1800 python bench.py
echo SESSION3_DONE
