"""Batched, prefetching host->device input pipeline.

Replaces the reference's per-image synchronous loop
(/root/reference/CODON_X4/test.py:109-137: one cv2.imread + H2D copy + D2H
sync per image, batch=1) with:

  * shape-bucketed batching: images padded to a shared padded shape with a
    validity mask (model-side masking keeps results per-image exact);
  * pad-to-multiple so XLA sees few distinct shapes (few recompiles);
  * background-thread decode + device_put prefetch (double buffering) —
    JAX dispatch is async, so compute overlaps the next batch's transfer.
"""
from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Iterator, List, Optional, Sequence

import numpy as np
import jax

from codon_tpu.data.io import Sample, load_sample


@dataclasses.dataclass
class Batch:
    names: List[str]
    depth: jax.Array              # (B, H, W, 1) float32 in [0, 1]
    color: jax.Array              # (B, H, W, 1)
    mask: Optional[jax.Array]     # (B, H, W, 1) or None if uniform shape
    sizes: List[tuple]            # original (h, w) per image
    labels: List[Optional[np.ndarray]]  # uint8 host arrays
    label_dev: Optional[jax.Array] = None  # (B, H, W, 1) [0,255] padded


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def make_batch(samples: Sequence[Sample], pad_multiple: int = 32,
               device=None, target_batch: int = 0,
               fixed_hw: Optional[tuple] = None) -> Batch:
    real = len(samples)
    if target_batch > real:
        # pad the batch dim by repeating the last sample (keeps one jit
        # shape per bucket); Batch.names only lists real entries so
        # consumers skip the fillers.
        samples = list(samples) + [samples[-1]] * (target_batch - real)
    hs = [s.depth.shape[0] for s in samples]
    ws = [s.depth.shape[1] for s in samples]
    if fixed_hw is not None:
        H, W = fixed_hw
    else:
        H = _round_up(max(hs), pad_multiple)
        W = _round_up(max(ws), pad_multiple)
    B = len(samples)
    depth = np.zeros((B, H, W, 1), np.float32)
    color = np.zeros((B, H, W, 1), np.float32)
    mask = np.zeros((B, H, W, 1), np.float32)
    have_labels = all(s.label is not None for s in samples)
    label = np.zeros((B, H, W, 1), np.float32) if have_labels else None
    uniform = all(h == hs[0] and w == ws[0] for h, w in zip(hs, ws)) \
        and hs[0] == H and ws[0] == W
    for i, s in enumerate(samples):
        h, w = s.depth.shape
        depth[i, :h, :w, 0] = s.depth.astype(np.float32) / 255.0
        color[i, :h, :w, 0] = s.color.astype(np.float32) / 255.0
        mask[i, :h, :w, 0] = 1.0
        if have_labels:
            lh, lw = s.label.shape
            if (lh, lw) != (h, w):
                # a silently clipped label would leave mask=1 over rows
                # with label 0.0 — the on-device SSIM would score padding
                raise ValueError(
                    f"{s.name}: label {lh}x{lw} != depth {h}x{w} — "
                    f"mismatched pair")
            label[i, :h, :w, 0] = s.label.astype(np.float32)
    put = (lambda a: jax.device_put(a, device)) if device else jax.device_put
    return Batch(
        names=[s.name for s in samples[:real]],
        depth=put(depth), color=put(color),
        mask=None if uniform else put(mask),
        sizes=list(zip(hs, ws)),
        labels=[s.label for s in samples],
        label_dev=put(label) if have_labels else None,
    )


def png_size(path: str) -> tuple:
    """(h, w) from the PNG IHDR header — 24 bytes, no decode."""
    import struct
    with open(path, "rb") as f:
        head = f.read(24)
    if head[:8] != b"\x89PNG\r\n\x1a\n" or head[12:16] != b"IHDR":
        raise ValueError(f"not a PNG: {path}")
    w, h = struct.unpack(">II", head[16:24])
    return h, w


def bucket_names_by_shape(scale_dir: str, names: Sequence[str],
                          pad_multiple: int) -> List[str]:
    """Reorder names so images sharing a padded shape are adjacent —
    minimizes distinct jit shapes (one XLA compile per bucket)."""
    import os
    keyed = []
    for n in names:
        h, w = png_size(os.path.join(scale_dir, "input_depth", n + ".png"))
        keyed.append(((_round_up(h, pad_multiple),
                       _round_up(w, pad_multiple)), n))
    keyed.sort(key=lambda kv: (kv[0], kv[1]))
    return [n for _, n in keyed]


def batched_loader(scale_dir: str, names: Sequence[str], batch_size: int = 1,
                   pad_multiple: int = 32, prefetch: int = 2,
                   with_label: bool = True, device=None,
                   bucket: bool = True,
                   pad_to_max: bool = True) -> Iterator[Batch]:
    """Yield device-resident Batches; decode+transfer runs in a worker thread
    `prefetch` batches ahead of compute.

    Shape policy (recompiles are the enemy — each distinct jit shape costs a
    full XLA compile):
      * pad_to_max (default): every batch padded to ONE dataset-wide shape —
        exactly one compile; masking keeps results per-image exact. Right
        call when sizes cluster (Middlebury: all within ~12% of max).
      * bucket: group by per-image padded shape — one compile per bucket;
        better when sizes vary wildly.
    """
    fixed_hw = None
    if pad_to_max:
        import os as _os
        hw = [png_size(_os.path.join(scale_dir, "input_depth", n + ".png"))
              for n in names]
        fixed_hw = (_round_up(max(h for h, _ in hw), pad_multiple),
                    _round_up(max(w for _, w in hw), pad_multiple))
        chunks = [list(names[i:i + batch_size])
                  for i in range(0, len(names), batch_size)]
    elif bucket:
        names = bucket_names_by_shape(scale_dir, names, pad_multiple)
        chunks = []
        run: List[str] = []
        run_key = None
        import os as _os
        for n in names:
            h, w = png_size(_os.path.join(scale_dir, "input_depth",
                                          n + ".png"))
            key = (_round_up(h, pad_multiple), _round_up(w, pad_multiple))
            if key != run_key or len(run) == batch_size:
                if run:
                    chunks.append(run)
                run, run_key = [], key
            run.append(n)
        if run:
            chunks.append(run)
    else:
        chunks = [list(names[i:i + batch_size])
                  for i in range(0, len(names), batch_size)]
    q: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch))
    _SENTINEL = object()
    stop = threading.Event()

    def _put(item) -> bool:
        # timed put: if the consumer abandons the generator, the worker
        # observes `stop` instead of blocking forever on a full queue
        # (which would pin `prefetch` device-resident batches for the
        # process lifetime)
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for chunk in chunks:
                if stop.is_set():
                    return
                samples = [load_sample(scale_dir, n, with_label)
                           for n in chunk]
                if not _put(make_batch(samples, pad_multiple, device,
                                       target_batch=batch_size,
                                       fixed_hw=fixed_hw)):
                    return
            _put(_SENTINEL)
        except BaseException as e:  # surface decode errors to the consumer
            _put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while True:  # unblock a worker mid-put
            try:
                q.get_nowait()
            except queue.Empty:
                break
