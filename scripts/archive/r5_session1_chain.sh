#!/bin/bash
# Round-5 session-1 chain (runs after r4_session7_chain.sh; replaces the
# killed r4_session8 queue slot).
#
# VERDICT r4 priorities:
#   2. int8 per-site roofline artifact + grouped-lowering number + the
#      new bench rows (b1 latency, bf16 point, fenced cross-check).
#   1. Art/Cones from the DATA axis — two arms:
#      (a) collage fine-tunes of the ebL bests at x4 and x16
#          (--collage 0.3: cross-scene pastes with seam-consistent
#          degradation), holdout split unchanged;
#      (c) x4 self-distillation: pseudo-label the held-out inputs with
#          the best TTA8 ensemble (ebL+p128L), fine-tune ebL on the
#          mixed GT(7)+pseudo(3) dir, score vs GT.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 10800 python -m codon_tpu.cli "$@"; }
CK=checkpoints
stop_requested() { [ -f /tmp/STOP_CHAIN ]; }
mark() { echo "=== $1 $(date -u +%H:%M:%S)"; }

# wait for session 7 (its pid file appears only once 6b exits)
for i in $(seq 1 1000); do [ -f /tmp/r4s7.pid ] && break; sleep 30; done
if [ -f /tmp/r4s7.pid ]; then
  P=$(cat /tmp/r4s7.pid)
  sleep 60
  while kill -0 "$P" 2>/dev/null; do sleep 30; done
fi
rm -f /tmp/STOP_CHAIN
echo $$ > /tmp/r5s1.pid
mark S1_START

# ---- 1. perf block: per-site roofline + grouped lowering + bench rows
stop_requested && { echo STOPPED_AT_PERF; exit 0; }
if [ ! -f $CK/perf_roofline_r5.json ]; then
  timeout 3600 python scripts/perf_roofline_int8.py \
      --json $CK/perf_roofline_r5.json
fi
if [ ! -f $CK/bench_r5_probe.json ]; then
  timeout 1800 python bench.py | tee $CK/bench_r5_probe.json
fi
mark PERF_DONE

# ---- 2a. collage arm, x4: 8k eb-recipe fine-tune of ebL with pastes
stop_requested && { echo STOPPED_AT_CGX4; exit 0; }
if [ ! -f $CK/x4_holdout_ebLcg.npz ]; then
run train --scale 4 --exclude $EX --augment full --grad-loss 1.0 \
    --edge-bias 0.5 --collage 0.3 --patch 96 --batch 16 --steps 8000 \
    --warmup 200 --lr 5e-5 --seed 51 --ckpt-in $CK/x4_holdout_ebL.npz \
    --ckpt-out $CK/x4_holdout_ebLcg.npz
fi
run eval --scale 4 --ckpt $CK/x4_holdout_ebLcg.npz --tta8 --no-save \
    --json $CK/x4_holdout_ebLcg_tta8_eval.json
mark CGX4_DONE

# ---- 2b. collage arm, x16 (largest Art gap): same recipe on the f5 ebL
stop_requested && { echo STOPPED_AT_CGX16; exit 0; }
if [ ! -f $CK/x16_holdout_ebLcg.npz ]; then
run train --scale 16 --exclude $EX --variant codon_f5 --augment full \
    --grad-loss 1.0 --edge-bias 0.5 --collage 0.3 --patch 96 --batch 16 \
    --steps 8000 --warmup 200 --lr 5e-5 --seed 52 \
    --ckpt-in $CK/x16_holdout_ebL.npz \
    --ckpt-out $CK/x16_holdout_ebLcg.npz
fi
run eval --scale 16 --variant codon_f5 --ckpt $CK/x16_holdout_ebLcg.npz \
    --tta8 --no-save --json $CK/x16_holdout_ebLcg_tta8_eval.json
mark CGX16_DONE

# ---- 3. self-distill arm, x4: pseudo-label holdout inputs with the
# best ensemble, fine-tune ebL on the mixed dir, score vs GT
stop_requested && { echo STOPPED_AT_SD; exit 0; }
if [ ! -d /tmp/x4_pseudo ]; then
run eval --scale 4 --variant codon,codon \
    --ckpt $CK/x4_holdout_ebL.npz,$CK/x4_holdout_p128L.npz \
    --tta8 --out /tmp/x4_pseudo \
    --json $CK/x4_holdout_ens2elp_tta8_eval2.json
fi
python scripts/make_selfdistill_data.py --scale 4 \
    --pseudo-dir /tmp/x4_pseudo --holdout $EX --out /tmp/x4_sd_data
if [ ! -f $CK/x4_holdout_sd.npz ]; then
run train --scale 4 --data-dir /tmp/x4_sd_data --augment full \
    --grad-loss 1.0 --edge-bias 0.5 --patch 96 --batch 16 --steps 4000 \
    --warmup 100 --lr 5e-5 --seed 53 --ckpt-in $CK/x4_holdout_ebL.npz \
    --ckpt-out $CK/x4_holdout_sd.npz
fi
run eval --scale 4 --ckpt $CK/x4_holdout_sd.npz --tta8 --no-save \
    --json $CK/x4_holdout_sd_tta8_eval.json
mark SD_DONE

# ---- 4. refresh the evidence tables from whatever landed
python scripts/refresh_evidence.py || true
mark S1_DONE
rm -f /tmp/r5s1.pid
