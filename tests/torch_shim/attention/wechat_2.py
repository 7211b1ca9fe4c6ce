"""Shim for the missing `attention.wechat_2` module (base_net_withoutBN.py:17).

Interpretation (SURVEY.md §2.1 #8): CA = full-width channel gate returning
the SCALE; SA = spatial gate returning the SCALE (k=5). Reuses the
reference's pooled-MLP machinery via ResCBAM's classes where possible.
"""
import torch
import torch.nn as nn
import torch.nn.functional as F

from attention.ResCBAM import ChannelPool


class ChannelGate(nn.Module):  # aka CA
    def __init__(self, gate_channels, reduction_ratio=16,
                 pool_types=("avg", "max")):
        super().__init__()
        self.mlp = nn.Sequential(
            nn.Flatten(),
            nn.Linear(gate_channels, gate_channels // reduction_ratio),
            nn.ReLU(),
            nn.Linear(gate_channels // reduction_ratio, gate_channels),
        )
        self.pool_types = list(pool_types)

    def forward(self, x):
        att = None
        for pool_type in self.pool_types:
            if pool_type == "avg":
                pooled = F.avg_pool2d(x, (x.size(2), x.size(3)))
            else:
                pooled = F.max_pool2d(x, (x.size(2), x.size(3)))
            raw = self.mlp(pooled)
            att = raw if att is None else att + raw
        return torch.sigmoid(att).unsqueeze(2).unsqueeze(3)


class SpatialGate(nn.Module):  # aka SA
    def __init__(self):
        super().__init__()
        self.compress = ChannelPool()
        self.spatial = nn.Sequential()
        self.spatial.conv = nn.Conv2d(2, 1, 5, stride=1, padding=2,
                                      bias=False)

    def forward(self, x):
        return torch.sigmoid(self.spatial.conv(self.compress(x)))
