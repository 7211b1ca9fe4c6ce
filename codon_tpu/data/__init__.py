from codon_tpu.data.io import (imread_gray, imwrite_gray, discover_pairs,
                               Sample)
from codon_tpu.data.pipeline import batched_loader, Batch
