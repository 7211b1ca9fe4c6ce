from codon_tpu.checkpoint.torch_convert import (
    torch_state_dict_to_params,
    params_to_torch_state_dict,
    load_pth,
)
from codon_tpu.checkpoint.native import save_npz, load_npz
from codon_tpu.checkpoint.orbax_io import (
    CheckpointManager,
    save_orbax,
    load_orbax,
)
