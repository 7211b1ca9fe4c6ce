#!/bin/bash
# Round-5 session-5 chain: RETRY of the scale-conditioned data-axis arm.
#
# The session-4 from-scratch run collapsed into total ReLU death at step
# ~7k (grad_norm exactly 0.0 thereafter; archived as
# checkpoints/*_sc_collapsed*). This retry applies the three fixes that
# landed with the post-mortem: warm start from the x8 ebL solo via the
# function-preserving stem widening, --clip-norm against the step-1
# spike (751 unclipped), and the CollapseDetector aborts loudly if it
# dies again. Recipe otherwise mirrors the session-4 arm (mix-scales +
# scale-cond joint holdout training), with fine-tune lr 5e-5 instead of
# the from-scratch 1e-4.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 10800 python -m codon_tpu.cli "$@"; }
CK=checkpoints
stop_requested() { [ -f /tmp/STOP_CHAIN ]; }
mark() { echo "=== $1 $(date -u +%H:%M:%S)"; }
rm -f /tmp/STOP_CHAIN
echo $$ > /tmp/r5s5.pid
mark S5_START

# ---- SC retry (warm start + clip)
stop_requested && { echo STOPPED_AT_SC; exit 0; }
if [ ! -f $CK/x4_holdout_sc.npz ]; then
run train --scale 4 --mix-scales --scale-cond --variant codon_sc \
    --exclude $EX --augment full --grad-loss 1.0 --edge-bias 0.5 \
    --patch 96 --batch 16 --steps 24000 --warmup 500 --lr 5e-5 \
    --clip-norm 5.0 --ckpt-in $CK/x8_holdout_ebL.npz \
    --seed 55 --ckpt-out $CK/x4_holdout_sc.npz \
    || { echo SC_RETRY_TRAIN_FAILED; exit 1; }
fi
for S in 4 8 16; do
  stop_requested && { echo STOPPED_AT_SC_EVAL$S; exit 0; }
  run eval --scale $S --variant codon_sc --scale-cond \
      --ckpt $CK/x4_holdout_sc.npz --tta8 --no-save \
      --json $CK/x${S}_holdout_sc_tta8_eval.json
done
mark SC_EVAL_DONE

# ---- conditioning sensitivity (must be nonzero this time)
timeout 1800 python scripts/sc_cond_probe.py --json $CK/sc_cond_probe.json
mark PROBE_DONE

python scripts/refresh_evidence.py || true
mark S5_DONE
rm -f /tmp/r5s5.pid
