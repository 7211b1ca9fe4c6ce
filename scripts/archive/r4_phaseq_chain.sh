#!/bin/bash
# Round-4 phase Q: deployment targets.
#  1. x4 holdout PLAIN int8-static < 1.778 (VERDICT item 4) — QAT chain
#     from the gl10 member (holdout best), both handoff and --no-handoff
#     arms (no-handoff measured better on edge-heavy x4 scenes).
#  2. x4 shipping int8 repair (VERDICT item 2): 20k all-10 grad-loss
#     refresh from the Art-preserving x4_ship ancestor, QAT chain, gated
#     by scripts/check_regression.py against the predecessor (Art 2.255).
#  3. Perf-bound accounting as committed JSON artifacts (VERDICT item 3).
#  4. Export matrix incl. the int8+TTA8 flagship artifact, smoke-loaded
#     on the TPU (VERDICT item 6).
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 10800 python -m codon_tpu.cli "$@"; }
CK=checkpoints
stop_requested() { [ -f /tmp/STOP_CHAIN ]; }

until [ -f /tmp/phasep.pid ]; do sleep 30; done
while kill -0 "$(cat /tmp/phasep.pid)" 2>/dev/null; do sleep 60; done
echo "PHASEP_RELEASED $(date -u +%H:%M:%S)"
until python -c "import jax, jax.numpy as jnp; print(jnp.add(1,1), jax.devices())"; do
    echo "device unavailable; waiting 60s before next untimed probe"
    sleep 60
done

# 1. x4 holdout int8-static from gl10
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
# no-handoff arm (pure conv-site grid; better RMSE on edge-heavy x4)
run train --scale 4 --exclude $EX --qat-static --no-handoff --steps 1500 \
    --lr 3e-5 --warmup 50 --ckpt-in $CK/x4_holdout_qat_gl.npz \
    --ckpt-out $CK/x4_holdout_qat_static_glnh.npz
run eval --scale 4 --ckpt $CK/x4_holdout_qat_static_glnh.npz --dtype int8 \
    --no-save --json $CK/x4_holdout_qat_static_glnh_int8_eval.json

# 2. shipping x4 repair: grad-loss refresh from the Art-preserving ship
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
# per-image non-regression gate vs the Art-preserving predecessor
python scripts/check_regression.py \
    $CK/x4_ship_qat_static_int8_eval.json \
    $CK/x4_ship3_qat_static_int8_eval.json && echo SHIP3_GATE_PASSED \
    || echo SHIP3_GATE_FAILED

# 3. perf accounting artifacts (VERDICT item 3)
stop_requested && { echo STOPPED_AT_PERF; exit 0; }
timeout 3600 python scripts/perf_ablate_int8.py --json $CK/perf_ablate_r4.json
if [ -f $CK/perf_ablate_r4.json ]; then
  CONV=$(python -c "import json;print(round(json.load(open('$CK/perf_ablate_r4.json'))['conv_cells_ms'],1))")
  MEAS=$(python -c "import json;print(round(json.load(open('$CK/perf_ablate_r4.json'))['full_ms'],1))")
  timeout 1800 python scripts/perf_bound_int8.py --json $CK/perf_bound_r4.json \
      --convs-ms "$CONV" --measured-ms "$MEAS"
fi

# 4. export matrix (incl. int8+tta8 x4) with on-TPU smoke loads
stop_requested && { echo STOPPED_AT_EXPORT; exit 0; }
timeout 5400 python scripts/export_matrix.py --load-check \
    --out-dir artifacts | tee $CK/export_matrix_r4.jsonl

# 5. bench sanity refresh
timeout 1800 python bench.py
echo PHASEQ_DONE
