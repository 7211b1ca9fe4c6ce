from codon_tpu.parallel.mesh import make_mesh
from codon_tpu.parallel.ops import ShardedOps
from codon_tpu.parallel.tiling import (make_sharded_forward,
                                       make_tiled_forward, tiled_infer)
from codon_tpu.parallel.stitch import tile_stitch_infer
