from codon_tpu.core.ops import XlaOps, Ops
from codon_tpu.core.params import conv_kernel_init, linear_init, DTypePolicy
