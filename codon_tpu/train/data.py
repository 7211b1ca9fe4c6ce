"""Training-pair synthesis and patch sampling.

The reference provides eval data only. Training pairs are synthesized the
way the CODON task defines them: the LR depth input is the ground-truth
depth downsampled by the scale factor and bicubic-upsampled back to full
resolution (the x4/x8/x16 names describe this degradation — SURVEY.md §1),
with the grayscale color image as guidance.
"""
from __future__ import annotations

import dataclasses
from typing import Iterator, List

import numpy as np


def synthesize_lr(label: np.ndarray, scale: int) -> np.ndarray:
    """GT depth (H, W) uint8 -> bicubic down-up degraded depth, uint8."""
    import cv2
    h, w = label.shape
    lr = cv2.resize(label, (max(1, w // scale), max(1, h // scale)),
                    interpolation=cv2.INTER_CUBIC)
    up = cv2.resize(lr, (w, h), interpolation=cv2.INTER_CUBIC)
    return up


@dataclasses.dataclass
class PatchSampler:
    """Random (depth, color, label) patch batches from image pairs.

    `degraded`: the actual LR-upsampled depth inputs when available (the
    reference datasets ship them as input_depth/ — matching the true
    degradation beats re-synthesizing it); otherwise bicubic down-up
    synthesis from the labels.
    """

    labels: List[np.ndarray]          # uint8 GT depth images
    colors: List[np.ndarray]          # uint8 grayscale guidance
    scale: int = 4
    patch: int = 64
    batch: int = 16
    seed: int = 0
    augment: bool = True
    degraded: List[np.ndarray] = None

    def __post_init__(self):
        assert len(self.labels) == len(self.colors)
        self._rng = np.random.RandomState(self.seed)
        if self.degraded is not None:
            assert len(self.degraded) == len(self.labels)
            self._degraded = self.degraded
        else:
            self._degraded = [synthesize_lr(l, self.scale)
                              for l in self.labels]

    def __iter__(self) -> Iterator[dict]:
        while True:
            yield self.sample()

    def sample(self) -> dict:
        B, P = self.batch, self.patch
        depth = np.empty((B, P, P, 1), np.float32)
        color = np.empty((B, P, P, 1), np.float32)
        label = np.empty((B, P, P, 1), np.float32)
        for b in range(B):
            i = self._rng.randint(len(self.labels))
            lab, col, deg = self.labels[i], self.colors[i], self._degraded[i]
            h, w = lab.shape
            y = self._rng.randint(max(1, h - P + 1))
            x = self._rng.randint(max(1, w - P + 1))
            lp = lab[y:y + P, x:x + P]
            cp = col[y:y + P, x:x + P]
            dp = deg[y:y + P, x:x + P]
            if self.augment:
                if self._rng.rand() < 0.5:
                    lp, cp, dp = lp[:, ::-1], cp[:, ::-1], dp[:, ::-1]
                if self._rng.rand() < 0.5:
                    lp, cp, dp = lp[::-1], cp[::-1], dp[::-1]
            depth[b, ..., 0] = dp / 255.0
            color[b, ..., 0] = cp / 255.0
            label[b, ..., 0] = lp / 255.0
        return {"depth": depth, "color": color, "label": label,
                "mask": np.ones((B, P, P, 1), np.float32)}
