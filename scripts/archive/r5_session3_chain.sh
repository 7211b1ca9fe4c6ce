#!/bin/bash
# Round-5 session-3 chain. The host restarted before session-1 phase 3
# (x4 self-distill) and all of session 2 ran, so the VERDICT ask-1
# data-axis arms (b) and (c) have no results yet; only collage (a) is
# archived (NEGATIVE at x4 and x16, checkpoints/x{4,16}_holdout_ebLcg_*).
# This chain runs the remaining arms:
#   1. (c) self-distill x4: pseudo-label the held-out inputs with the
#      best TTA8 ensemble (ebL+p128L), fine-tune ebL on mixed
#      GT(7)+pseudo(3), score vs GT.
#   2. (c') self-distill x16 and x8 (codon_f5 ebL lineage) — cheap, and
#      x16 is the scale ART_CONES.md calls most closable.
#   3. (b) scale-conditioned joint holdout training (codon_sc,
#      mix-scales + scale-cond), evaled at all three scales.
#   4. refresh evidence tables + a fresh bench probe.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 10800 python -m codon_tpu.cli "$@"; }
CK=checkpoints
stop_requested() { [ -f /tmp/STOP_CHAIN ]; }
mark() { echo "=== $1 $(date -u +%H:%M:%S)"; }
rm -f /tmp/STOP_CHAIN
echo $$ > /tmp/r5s3.pid
mark S3_START

# ---- 1. self-distill x4 (codon, ebL ancestor)
stop_requested && { echo STOPPED_AT_SD4; exit 0; }
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
mark SD4_DONE

# ---- 2. self-distill x16 then x8 (codon_f5, ebL ancestors)
for S in 16 8; do
  stop_requested && { echo STOPPED_AT_SD$S; exit 0; }
  if [ ! -d /tmp/x${S}_pseudo ]; then
  run eval --scale $S --variant codon_f5 \
      --ckpt $CK/x${S}_holdout_ebL.npz --tta8 --out /tmp/x${S}_pseudo \
      --json $CK/x${S}_holdout_ebL_tta8_eval2.json
  fi
  python scripts/make_selfdistill_data.py --scale $S \
      --pseudo-dir /tmp/x${S}_pseudo --holdout $EX --out /tmp/x${S}_sd_data
  if [ ! -f $CK/x${S}_holdout_sd.npz ]; then
  run train --scale $S --data-dir /tmp/x${S}_sd_data --variant codon_f5 \
      --augment full --grad-loss 1.0 --edge-bias 0.5 --patch 96 \
      --batch 16 --steps 4000 --warmup 100 --lr 5e-5 --seed 57 \
      --ckpt-in $CK/x${S}_holdout_ebL.npz \
      --ckpt-out $CK/x${S}_holdout_sd.npz
  fi
  run eval --scale $S --variant codon_f5 --ckpt $CK/x${S}_holdout_sd.npz \
      --tta8 --no-save --json $CK/x${S}_holdout_sd_tta8_eval.json
  mark SD${S}_DONE
done

# ---- 3. scale-conditioned joint holdout training (from scratch: the
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

# ---- 4. evidence + fresh bench probe
python scripts/refresh_evidence.py || true
timeout 1200 python bench.py > /tmp/bench_r5s3.out 2>/tmp/bench_r5s3.err || true
tail -1 /tmp/bench_r5s3.out > $CK/bench_r5s3_probe.json || true
mark S3_DONE
rm -f /tmp/r5s3.pid
