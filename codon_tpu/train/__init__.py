from codon_tpu.train.trainer import TrainConfig, make_train_step, TrainState
from codon_tpu.train.data import PatchSampler, synthesize_lr
