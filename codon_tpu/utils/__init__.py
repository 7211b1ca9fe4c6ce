from codon_tpu.utils.logging import Logger, mkdir_if_missing
