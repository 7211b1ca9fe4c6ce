#!/bin/bash
# Round-4 phase R: the Art/Cones per-image frontier (VERDICT r4 item 1)
# with the two untried levers, then int8-static refreshes from the best
# gl-generation members.
#  1. l2 polish: every member so far trained --loss l1; the judged metric
#     is RMSE (l2), and Art's RMSE is dominated by large discontinuity
#     errors that l1 underweights. Short RMSE-aligned polish from gl10.
#  2. patch-128 member: all members trained patch 96; Art's thin
#     structures (brush handles spanning >100 px) never fit in one patch.
#  3. pair/quad ensembles slotting the new members (phase O showed pairs
#     pay only between comparably-strong members).
#  4. x8/x16 QAT->static refresh from the better of {gl10, f5} solo, so
#     the shipping-int8 generation tracks the float generation.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 10800 python -m codon_tpu.cli "$@"; }
CK=checkpoints
stop_requested() { [ -f /tmp/STOP_CHAIN ]; }

until [ -f /tmp/phaseq.pid ]; do sleep 30; done
while kill -0 "$(cat /tmp/phaseq.pid)" 2>/dev/null; do sleep 60; done
echo "PHASEQ_RELEASED $(date -u +%H:%M:%S)"
until python -c "import jax, jax.numpy as jnp; print(jnp.add(1,1), jax.devices())"; do
    echo "device unavailable; waiting 60s before next untimed probe"
    sleep 60
done

# 1. RMSE-aligned l2 polish of the x4 best solo (cheap probe)
stop_requested && { echo STOPPED_AT_L2; exit 0; }
if [ ! -f $CK/x4_holdout_gl10_l2.npz ]; then
run train --scale 4 --exclude $EX --augment full --loss l2 --grad-loss 1.0 \
    --patch 96 --batch 16 --steps 3000 --warmup 100 --lr 3e-5 --seed 53 \
    --ckpt-in $CK/x4_holdout_gl10.npz --ckpt-out $CK/x4_holdout_gl10_l2.npz
fi
run eval --scale 4 --ckpt $CK/x4_holdout_gl10_l2.npz --tta8 --no-save \
    --json $CK/x4_holdout_gl10_l2_tta8_eval.json

# 2. patch-128 member (long-structure context), continued from gl10
stop_requested && { echo STOPPED_AT_P128; exit 0; }
if [ ! -f $CK/x4_holdout_p128.npz ]; then
run train --scale 4 --exclude $EX --augment full --grad-loss 1.0 \
    --patch 128 --batch 16 --steps 12000 --warmup 300 --lr 5e-5 --seed 59 \
    --ckpt-in $CK/x4_holdout_gl10.npz --ckpt-out $CK/x4_holdout_p128.npz
fi
run eval --scale 4 --ckpt $CK/x4_holdout_p128.npz --tta8 --no-save \
    --json $CK/x4_holdout_p128_tta8_eval.json

# 3. new-member ensembles (gl-generation members only: comparable strength)
stop_requested && { echo STOPPED_AT_ENS; exit 0; }
if [ -f $CK/x4_holdout_eb.npz ]; then
run eval --scale 4 --variant codon,codon,codon \
    --ckpt $CK/x4_holdout_gl10.npz,$CK/x4_holdout_eb.npz,$CK/x4_holdout_p128.npz \
    --tta8 --no-save --json $CK/x4_holdout_ens3gep_tta8_eval.json
fi
run eval --scale 4 --variant codon,codon \
    --ckpt $CK/x4_holdout_gl10.npz,$CK/x4_holdout_p128.npz \
    --tta8 --no-save --json $CK/x4_holdout_ens2gp_tta8_eval.json
run eval --scale 4 --variant codon,codon \
    --ckpt $CK/x4_holdout_gl10_l2.npz,$CK/x4_holdout_p128.npz \
    --tta8 --no-save --json $CK/x4_holdout_ens2lp_tta8_eval.json

# 4. one more shot at x4 plain int8 < 1.778 (VERDICT item 4): QAT chain
#    from the l2-polished member (an RMSE-aligned seed quantizes toward
#    the judged metric)
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

# 5. x8/x16 int8-static refresh from the better of {gl10, f5} solo TTA8
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
echo PHASER_DONE
