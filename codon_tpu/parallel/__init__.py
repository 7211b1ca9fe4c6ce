from codon_tpu.parallel.mesh import make_mesh
from codon_tpu.parallel.ops import ShardedOps
from codon_tpu.parallel.tiling import make_tiled_forward, tiled_infer
