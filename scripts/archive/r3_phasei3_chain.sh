#!/bin/bash
# Round-3 phase I3: single ordered queue for the TPU once it recovers
# from the stale-session/outage window (see ROUND3.md incident note).
# The device is single-client, so everything that needs it rides ONE
# chain: verify drive, lost f5 evals, x8/x16 f5 members, the --ema
# feature probe, and a bench refresh.
set -x
cd /root/repo
EX="Art,Cones,Teddy"
run() { timeout 10800 python -m codon_tpu.cli "$@"; }
CK=checkpoints

# 0. wait for the device with an UNTIMED client: it blocks harmlessly in
# backend init until the stale claim expires, then becomes the holder,
# runs one op, and exits cleanly. (A timeout-killed probe risks dying
# mid-grant and minting a fresh stale claim — the failure mode that
# caused this outage.) If the client itself dies (e.g. UNAVAILABLE after
# the server's ~25-min RPC timeout), loop and wait again.
until python -c "
import jax, jax.numpy as jnp
print(jnp.add(1, 1), jax.devices())"; do
    echo "device still unavailable; waiting 60s before next untimed probe"
    sleep 60
done

# 1. verify drive: flagship forward on the real chip (evidence for the
# working-tree changes; see .claude/skills/verify)
timeout 1200 python -u - > /tmp/verify_r3_drive.log 2>&1 <<'EOF'
import numpy as np, cv2, time, jax
from codon_tpu.models.codon_net import CodonConfig, codon_forward, init_codon_params
from codon_tpu.core.params import BF16
from codon_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
print("backend:", jax.default_backend(), flush=True)
ref = "/root/reference/CODON_X4"
d = cv2.imread(f"{ref}/input_depth/Art.png", 0).astype(np.float32)[None,:,:,None]/255
c = cv2.imread(f"{ref}/input_color/Art.png", 0).astype(np.float32)[None,:,:,None]/255
cfg = CodonConfig(dtypes=BF16)
params = init_codon_params(jax.random.PRNGKey(0), cfg)
fwd = jax.jit(lambda p,a,b: codon_forward(p,a,b,cfg=cfg))
out = np.asarray(fwd(params, d, c))
t0=time.time(); out = np.asarray(fwd(params, d, c)); dt=time.time()-t0
print(out.shape, out.dtype, "nan:", np.isnan(out).any(), f"{dt*1e3:.0f}ms",
      flush=True)
print("VERIFY_DRIVE_OK", flush=True)
EOF

# 2. x4 f5 solo tta8 (lost to the incident)
run eval --scale 4 --variant codon_f5 --ckpt $CK/x4_holdout_f5.npz \
    --tta8 --no-save --json $CK/x4_holdout_f5_tta8_eval.json

# 3. x8 f5 diversity member (warm from strongest x8 3-fuse seed)
if [ ! -f $CK/x8_holdout_f5.npz ]; then
run train --scale 8 --variant codon_f5 --exclude $EX --augment full \
    --patch 96 --batch 16 --steps 20000 --warmup 500 --lr 1e-4 --seed 19 \
    --ckpt-in $CK/x8_holdout3.npz \
    --ckpt-out $CK/x8_holdout_f5.npz
fi
run eval --scale 8 --variant codon_f5 --ckpt $CK/x8_holdout_f5.npz \
    --tta --no-save --json $CK/x8_holdout_f5_tta_eval.json
run eval --scale 8 --ckpt \
$CK/x8_holdout.npz,$CK/x8_holdout2.npz,$CK/x8_holdout3.npz,$CK/x8_holdout_f5.npz \
    --variant codon,codon,codon,codon_f5 --tta --no-save \
    --json $CK/x8_holdout_ens4f_tta_eval.json
run eval --scale 8 --ckpt $CK/x8_holdout3.npz,$CK/x8_holdout_f5.npz \
    --variant codon,codon_f5 --tta --no-save \
    --json $CK/x8_holdout_ens2f_tta_eval.json

# 4. x16 f5 diversity member (warm from strongest x16 seed)
if [ ! -f $CK/x16_holdout_f5.npz ]; then
run train --scale 16 --variant codon_f5 --exclude $EX --augment full \
    --patch 96 --batch 16 --steps 20000 --warmup 500 --lr 1e-4 --seed 19 \
    --ckpt-in $CK/x16_holdout3.npz \
    --ckpt-out $CK/x16_holdout_f5.npz
fi
run eval --scale 16 --variant codon_f5 --ckpt $CK/x16_holdout_f5.npz \
    --tta8 --no-save --json $CK/x16_holdout_f5_tta8_eval.json
run eval --scale 16 --ckpt $CK/x16_holdout3.npz,$CK/x16_holdout_f5.npz \
    --variant codon,codon_f5 --tta8 --no-save \
    --json $CK/x16_holdout_ens2f_tta8_eval.json

# 5. --ema probe on real hardware: fresh x4 holdout member with a Polyak
# stream; evaluate raw vs EMA weights head-to-head (tta8, full-augment
# ancestry)
run train --scale 4 --exclude $EX --augment full \
    --patch 96 --batch 16 --steps 20000 --warmup 500 --lr 1e-4 --seed 23 \
    --ema 0.999 --ckpt-in $CK/x4_holdout2.npz \
    --ckpt-out $CK/x4_holdout5e.npz
run eval --scale 4 --ckpt $CK/x4_holdout5e.npz --tta8 --no-save \
    --json $CK/x4_holdout5e_tta8_eval.json
run eval --scale 4 --ckpt $CK/x4_holdout5e_ema.npz --tta8 --no-save \
    --json $CK/x4_holdout5e_ema_tta8_eval.json

# 6. headline bench refresh on the freed chip
timeout 1800 python bench.py > /tmp/bench_r3_refresh.json 2>/tmp/bench_r3_refresh.err
cat /tmp/bench_r3_refresh.json
echo PHASEI3_DONE
