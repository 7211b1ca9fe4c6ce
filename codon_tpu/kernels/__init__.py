from codon_tpu.kernels.cac import cac_stage_pallas, cac_stats, spatial_logits
