"""Shim for the missing `attention.CBAM` module (base_net_withoutBN.py:13).

Interpretation (SURVEY.md §2.1 #8, mirrored by codon_tpu.models.attention):
CBAM = ChannelGate (r=16, avg+max) then SpatialGate (k=5), gated output,
no residual. Built ON the reference's own ResCBAM gates so the torch side
stays authentic where the reference provides code.
"""
import torch.nn as nn

from attention.ResCBAM import ChannelGate, SpatialGate


class CBAM(nn.Module):
    def __init__(self, gate_channels, reduction_ratio=16,
                 pool_types=("avg", "max"), no_spatial=False):
        super().__init__()
        self.ChannelGate = ChannelGate(gate_channels, reduction_ratio,
                                       list(pool_types))
        self.no_spatial = no_spatial
        if not no_spatial:
            self.SpatialGate = SpatialGate()

    def forward(self, x):
        out = self.ChannelGate(x)
        if not self.no_spatial:
            out = self.SpatialGate(out)
        return out
