#!/bin/bash
# Round-5 session-4 chain: the session-3 chain was stopped (STOP_CHAIN
# appeared at the prior session's end) after the self-distill arms and
# before phase 3. This chain runs the remaining pieces verbatim:
#   1. (b) scale-conditioned joint holdout training (codon_sc,
#      mix-scales + scale-cond), evaled at all three scales.
#   2. refresh evidence tables + a fresh bench probe.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 10800 python -m codon_tpu.cli "$@"; }
CK=checkpoints
stop_requested() { [ -f /tmp/STOP_CHAIN ]; }
mark() { echo "=== $1 $(date -u +%H:%M:%S)"; }
rm -f /tmp/STOP_CHAIN
echo $$ > /tmp/r5s4.pid
mark S4_START

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
  stop_requested && { echo STOPPED_AT_SC_EVAL$S; exit 0; }
  run eval --scale $S --variant codon_sc --scale-cond \
      --ckpt $CK/x4_holdout_sc.npz --tta8 --no-save \
      --json $CK/x${S}_holdout_sc_tta8_eval.json
done
mark SC_DONE

# ---- 2. evidence + fresh bench probe
python scripts/refresh_evidence.py || true
timeout 1200 python bench.py > /tmp/bench_r5s4.out 2>/tmp/bench_r5s4.err || true
tail -1 /tmp/bench_r5s4.out > $CK/bench_r5s4_probe.json || true
mark S4_DONE
rm -f /tmp/r5s4.pid
