"""codon_tpu — a TPU-native JAX/XLA/Pallas framework for RGB-guided depth super-resolution.

A ground-up rebuild of the capabilities of the CODON reference release
(619862306/CODON, IJCV 2022): the CODONNet cross-domain-attention network family,
its ablation zoo, eval metrics (masked RMSE / Gaussian SSIM), PNG data pipeline,
checkpointing, and a multi-device parallel runtime (batch data-parallel and
spatially-tiled inference with exact cross-tile attention statistics).

Layout
------
core/        dtype policy, parameter init, the ops-backend abstraction
kernels/     Pallas TPU kernels (fused CAC attention gates)
models/      CODONNet + the config-driven ablation-variant registry
data/        PNG IO + batched host->device pipeline
metrics/     masked RMSE and ssim_exact (scipy-parity Gaussian SSIM)
checkpoint/  torch .pth converter + native orbax/npz save/load
parallel/    device mesh helpers, sharded ops (halo conv, psum pools), tiling
train/       optax training step with DP/spatial sharding
utils/       tee logger, timing helpers
"""

__version__ = "0.1.0"
