from codon_tpu.models.codon_net import (
    CodonConfig,
    init_codon_params,
    codon_forward,
    cac_channel_gate,
    cac_spatial_gate,
)
