#!/bin/bash
# Round-3 holdout QAT chain, take 2 (after the roundtrip-STE NaN fix):
# re-run the static phase at every scale from the existing dynamic-QAT
# warm starts — now calibrating the full 18-site grid (incl. the int8
# gate/stem handoffs) — then int8 evals (plain + TTA). x4 is redone too
# so its checkpoint carries the handoff sites (the original x4 static
# predates them). Then the SHIPPING (all-10-image) statics for bench.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 3600 python -m codon_tpu.cli "$@"; }

for S in 4 8 16; do
  run train --scale $S --exclude $EX --qat-static --steps 1500 --lr 3e-5 \
      --warmup 50 --ckpt-in checkpoints/x${S}_holdout_qat.npz \
      --ckpt-out checkpoints/x${S}_holdout_qat_static.npz
  run eval --scale $S --ckpt checkpoints/x${S}_holdout_qat_static.npz \
      --dtype int8 --no-save \
      --json checkpoints/x${S}_holdout_qat_static_int8_eval.json
  run eval --scale $S --ckpt checkpoints/x${S}_holdout_qat_static.npz \
      --dtype int8 --tta --no-save \
      --json checkpoints/x${S}_holdout_qat_static_int8_tta_eval.json
done

# shipping statics (all 10 images, like round-2's x*_qat_static) with the
# 18-site grid -> the bench/headline path gains the handoff
for S in 4 8 16; do
  run train --scale $S --qat-static --steps 1500 --lr 3e-5 --warmup 50 \
      --ckpt-in checkpoints/x${S}_qat.npz \
      --ckpt-out checkpoints/x${S}_qat_static2.npz
  run eval --scale $S --ckpt checkpoints/x${S}_qat_static2.npz \
      --dtype int8 --no-save \
      --json checkpoints/x${S}_qat_static2_int8_eval.json
done
echo CHAIN2_DONE
