from codon_tpu.metrics.rmse import masked_rmse, masked_rmse_jnp
from codon_tpu.metrics.ssim import ssim_exact, ssim_exact_jnp, ssim_block
