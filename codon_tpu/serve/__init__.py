from codon_tpu.serve.export import export_forward, load_exported
