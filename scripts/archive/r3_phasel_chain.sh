#!/bin/bash
# Round-3 phase L: opportunistic perf probe after phase K releases the
# device — re-sweep the shipping int8-static batch size (b32/48/64) now
# that the gate/stem handoff changed the per-image HBM traffic profile.
set -x
cd /root/repo
while kill -0 "$(cat /tmp/phasek.pid)" 2>/dev/null; do sleep 60; done
echo "PHASEK_RELEASED $(date -u +%H:%M:%S)"
until python -c "import jax, jax.numpy as jnp; print(jnp.add(1,1), jax.devices())"; do
    echo "device unavailable; waiting 60s before next untimed probe"
    sleep 60
done
timeout 3600 python scripts/perf_batch_probe.py
echo PHASEL_DONE
