"""PNG IO and dataset discovery.

The reference dataset layout per scale directory (e.g. CODON_X4/):
  input_depth/  bicubic-upsampled LR depth, already at HR size (model input)
  input_color/  RGB guidance read as grayscale (model input)
  input_label/  ground-truth depth (eval target)
  output/       the authors' archived results (golden parity targets)

The eval driver iterates the color dir like the reference does
(/root/reference/CODON_X4/test.py:109) so depth-only extras are skipped.
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np


def imread_gray(path: str) -> np.ndarray:
    """uint8 (H, W) grayscale read (cv2 flag 0 semantics)."""
    import cv2
    img = cv2.imread(path, 0)
    if img is None:
        raise FileNotFoundError(path)
    return img


def imwrite_gray(path: str, img: np.ndarray) -> None:
    import cv2
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if not cv2.imwrite(path, img):
        raise IOError(f"failed to write {path}")


@dataclasses.dataclass
class Sample:
    name: str
    depth: np.ndarray            # uint8 (H, W)
    color: np.ndarray            # uint8 (H, W)
    label: Optional[np.ndarray]  # uint8 (H, W) or None


def discover_pairs(scale_dir: str) -> List[str]:
    """Sorted image names (no extension) present in input_color/."""
    cdir = os.path.join(scale_dir, "input_color")
    return sorted(os.path.splitext(f)[0] for f in os.listdir(cdir)
                  if f.lower().endswith(".png"))


def load_sample(scale_dir: str, name: str, with_label: bool = True) -> Sample:
    depth = imread_gray(os.path.join(scale_dir, "input_depth", name + ".png"))
    color = imread_gray(os.path.join(scale_dir, "input_color", name + ".png"))
    label = None
    if with_label:
        lp = os.path.join(scale_dir, "input_label", name + ".png")
        if os.path.exists(lp):
            label = imread_gray(lp)
    return Sample(name, depth, color, label)
