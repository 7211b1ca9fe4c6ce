#!/bin/bash
# Round-5 session-2 chain (runs after r5_session1_chain.sh).
# Data-axis arm (b): ONE scale-conditioned model (codon_sc) trained
# jointly on all three scales' shipped degradations with the holdout
# split — the disambiguation unconditioned --mix-scales lacked when it
# regressed (ROUND3.md) — plus conditional follow-ups of session 1's
# collage/self-distill arms at the other scales.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 10800 python -m codon_tpu.cli "$@"; }
CK=checkpoints
stop_requested() { [ -f /tmp/STOP_CHAIN ]; }
mark() { echo "=== $1 $(date -u +%H:%M:%S)"; }
mean() { python -c "import json;print(json.load(open('$1'))['mean_rmse'])" 2>/dev/null || echo 1e9; }
art() { python -c "
import json
d=json.load(open('$1'))
print([p['rmse'] for p in d['per_image'] if p['name']=='Art'][0])" 2>/dev/null || echo 1e9; }
lt() { python -c "import sys;sys.exit(0 if float('$1') < float('$2') else 1)"; }

# wait for session 1
for i in $(seq 1 1000); do [ -f /tmp/r5s1.pid ] && break; sleep 30; done
if [ -f /tmp/r5s1.pid ]; then
  P=$(cat /tmp/r5s1.pid)
  sleep 60
  while kill -0 "$P" 2>/dev/null; do sleep 30; done
fi
rm -f /tmp/STOP_CHAIN
echo $$ > /tmp/r5s2.pid
mark S2_START

# ---- 1. scale-conditioned joint holdout training (from scratch: the
# 2-channel stem has no compatible ancestor)
stop_requested && { echo STOPPED_AT_SC; exit 0; }
if [ ! -f $CK/x4_holdout_sc.npz ]; then
run train --scale 4 --mix-scales --scale-cond --variant codon_sc \
    --exclude $EX --augment full --grad-loss 1.0 --edge-bias 0.5 \
    --patch 96 --batch 16 --steps 24000 --warmup 500 --lr 1e-4 \
    --seed 55 --ckpt-out $CK/x4_holdout_sc.npz
fi
for S in 4 8 16; do
  run eval --scale $S --variant codon_sc --scale-cond \
      --ckpt $CK/x4_holdout_sc.npz --tta8 --no-save \
      --json $CK/x${S}_holdout_sc_tta8_eval.json
done
mark SC_DONE

# ---- 2. conditional: x16 collage follow-up ran in s1; extend the x4
# collage arm to a 20k full retrain from gl10 if the 8k fine-tune moved
# Art at all (>= 0.05 below the eb member's 3.368)
A_CG=$(art $CK/x4_holdout_ebLcg_tta8_eval.json)
if lt "$A_CG" "3.32"; then
  stop_requested && { echo STOPPED_AT_CGL; exit 0; }
  if [ ! -f $CK/x4_holdout_cgL.npz ]; then
  run train --scale 4 --exclude $EX --augment full --grad-loss 1.0 \
      --edge-bias 0.5 --collage 0.3 --patch 96 --batch 16 \
      --steps 20000 --warmup 500 --lr 1e-4 --seed 56 \
      --ckpt-in $CK/x4_holdout_gl10.npz --ckpt-out $CK/x4_holdout_cgL.npz
  fi
  run eval --scale 4 --ckpt $CK/x4_holdout_cgL.npz --tta8 --no-save \
      --json $CK/x4_holdout_cgL_tta8_eval.json
else
  echo CG_X4_ART_IN_BAND "$A_CG"
fi
mark CGL_DONE

# ---- 3. conditional: x16 self-distill if the x4 arm moved Art
A_SD=$(art $CK/x4_holdout_sd_tta8_eval.json)
if lt "$A_SD" "3.32"; then
  stop_requested && { echo STOPPED_AT_SD16; exit 0; }
  if [ ! -d /tmp/x16_pseudo ]; then
  run eval --scale 16 --variant codon_f5 \
      --ckpt $CK/x16_holdout_ebL.npz --tta8 --out /tmp/x16_pseudo \
      --json $CK/x16_holdout_ebL_tta8_eval2.json
  fi
  python scripts/make_selfdistill_data.py --scale 16 \
      --pseudo-dir /tmp/x16_pseudo --holdout $EX --out /tmp/x16_sd_data
  if [ ! -f $CK/x16_holdout_sd.npz ]; then
  run train --scale 16 --data-dir /tmp/x16_sd_data --variant codon_f5 \
      --augment full --grad-loss 1.0 --edge-bias 0.5 --patch 96 \
      --batch 16 --steps 4000 --warmup 100 --lr 5e-5 --seed 57 \
      --ckpt-in $CK/x16_holdout_ebL.npz --ckpt-out $CK/x16_holdout_sd.npz
  fi
  run eval --scale 16 --variant codon_f5 --ckpt $CK/x16_holdout_sd.npz \
      --tta8 --no-save --json $CK/x16_holdout_sd_tta8_eval.json
else
  echo SD_X4_ART_IN_BAND "$A_SD"
fi
mark SD16_DONE

python scripts/refresh_evidence.py || true
mark S2_DONE
rm -f /tmp/r5s2.pid
