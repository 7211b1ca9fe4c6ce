#!/bin/bash
# Round-3 phase M: eval-time fusion-count sweep. The fusion loop reuses
# one weight set, so any checkpoint runs at any fusion count; the f5
# members (trained at 5 iterations) set the round's quality bests at
# every scale. Sweep f4/f6/f7 on those members, and probe whether the
# knob also lifts a plain 3-fuse-trained member (x4_holdout2) — all
# pure eval, no training.
set -x
cd /root/repo
run() { timeout 10800 python -m codon_tpu.cli "$@"; }
CK=checkpoints

while kill -0 "$(cat /tmp/phasel.pid)" 2>/dev/null; do sleep 60; done
echo "PHASEL_RELEASED $(date -u +%H:%M:%S)"
until python -c "import jax, jax.numpy as jnp; print(jnp.add(1,1), jax.devices())"; do
    echo "device unavailable; waiting 60s before next untimed probe"
    sleep 60
done

# f5-trained members at neighboring fusion counts
for n in 4 6 7; do
  run eval --scale 4 --variant codon_f$n --ckpt $CK/x4_holdout_f5.npz \
      --tta8 --no-save --json $CK/x4_holdout_f5_as_f${n}_tta8_eval.json
done
for n in 4 6 7; do
  run eval --scale 8 --variant codon_f$n --ckpt $CK/x8_holdout_f5.npz \
      --tta8 --no-save --json $CK/x8_holdout_f5_as_f${n}_tta8_eval.json
done
for n in 4 6 7; do
  run eval --scale 16 --variant codon_f$n --ckpt $CK/x16_holdout_f5.npz \
      --tta8 --no-save --json $CK/x16_holdout_f5_as_f${n}_tta8_eval.json
done

# does the knob lift a plain 3-fuse-trained member?
for n in 4 5; do
  run eval --scale 4 --variant codon_f$n --ckpt $CK/x4_holdout2.npz \
      --tta8 --no-save --json $CK/x4_holdout2_as_f${n}_tta8_eval.json
done
echo PHASEM_DONE
