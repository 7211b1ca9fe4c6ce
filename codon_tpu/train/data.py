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

    Batch i is a pure function of (seed, i): each sample_at(step) call
    derives its RNG from SeedSequence((seed, step)), so the stream needs no
    mutable cursor — an orbax-resumed run reproduces the uninterrupted
    run's batches bitwise (tested), and the prefetch thread can't skew it.
    """

    labels: List[np.ndarray]          # uint8 GT depth images
    colors: List[np.ndarray]          # uint8 grayscale guidance
    scale: int = 4
    patch: int = 64
    batch: int = 16
    seed: int = 0
    # "full": flips + rot90 + photometric jitter on the guidance +
    #         joint depth/label affine (range-preserving) + multi-scale
    #         pyramid sampling — the generalization recipe for tiny
    #         training sets;
    # "flips": geometric flips only (the round-1 recipe); "none"/False: off
    augment: str = "full"
    degraded: List[np.ndarray] = None
    # multi-scale pyramid (augment="full" only): each source image is also
    # kept at these downscaled sizes, with the degradation RE-SYNTHESIZED
    # from the downscaled label so input/label stay self-consistent.
    # OPT-IN (default off): measured on the x4 holdout task it REGRESSED
    # generalization (TTA mean 1.707 -> 1.866; the re-synthesized bicubic
    # degradation differs from the shipped input_depth degradation, so a
    # third of training pairs see a mismatched input distribution).
    pyramid: tuple = ()
    # probability that a patch is CENTERED (with jitter) on a depth-
    # discontinuity pixel (|grad label| above its 90th percentile) instead
    # of uniformly placed: thin-structure scenes (Art's brushes, Cones'
    # lattice) are exactly what uniform sampling under-serves on 7-image
    # training sets, and masked RMSE concentrates its error there
    edge_bias: float = 0.0
    # optional per-image sampling weights (oversampling — e.g. upweight a
    # scene a shipping fine-tune must not regress); None = uniform
    scene_weights: List[float] = None
    # probability that a sampled patch gets a DEPTH-COLLAGE paste: a crop
    # from another scene's (label, color) is pasted as a rectangle, and
    # the degraded input is REPAIRED in a band around the paste seam by
    # re-synthesizing the bicubic degradation of the composite label
    # there (away from the seam each side keeps its shipped degradation —
    # the pyramid experiment showed whole-image re-synthesis mismatches
    # the shipped input_depth distribution). The paste seam is a synthetic
    # depth discontinuity WITH an aligned guidance edge — the structure
    # class (thin foreground objects over distant backgrounds: Art's
    # brushes, Cones' lattice) that 7-scene training sets under-serve
    # (ART_CONES.md; VERDICT r4 next-round item 1, data axis)
    collage: float = 0.0
    # per-pair conditioning scalar (scale-conditioned joint training):
    # when set, the depth batch gains a second constant channel carrying
    # cond[i] for whichever pair each patch was cut from — pairs pooled
    # from several scale dirs (cli --mix-scales) then train ONE model
    # that knows which degradation it is refining
    cond: List[float] = None

    def __post_init__(self):
        import cv2
        assert len(self.labels) == len(self.colors)
        small = [i for i, l in enumerate(self.labels)
                 if min(l.shape) < self.patch]
        if small:
            # a base image narrower than the patch would broadcast-crash
            # inside sample() with an opaque shape error
            shapes = [self.labels[i].shape for i in small[:3]]
            raise ValueError(
                f"{len(small)} source image(s) smaller than patch="
                f"{self.patch} (e.g. {shapes}); shrink --patch or drop "
                f"them")
        self._step = 0   # cursor for the convenience sample() wrapper
        if self.cond is not None and len(self.cond) != len(self.labels):
            raise ValueError(f"cond has {len(self.cond)} entries for "
                             f"{len(self.labels)} images")
        if self.scene_weights is not None:
            if len(self.scene_weights) != len(self.labels):
                raise ValueError(
                    f"scene_weights has {len(self.scene_weights)} entries "
                    f"for {len(self.labels)} images")
            w = np.asarray(self.scene_weights, np.float64)
            if (w < 0).any() or w.sum() <= 0:
                raise ValueError("scene_weights must be >=0 with a "
                                 "positive sum")
            self._scene_p = w / w.sum()
        else:
            self._scene_p = None
        if self.degraded is not None:
            assert len(self.degraded) == len(self.labels)
            base_degraded = self.degraded
        else:
            base_degraded = [synthesize_lr(l, self.scale)
                             for l in self.labels]
        # levels[k] = (labels, colors, degraded) at pyramid scale k
        self._levels = [(self.labels, self.colors, base_degraded)]
        scales = (self.pyramid if self.augment == "full" else (1.0,))
        for s in scales:
            if s >= 1.0:
                continue
            labs, cols, degs = [], [], []
            for lab, col in zip(self.labels, self.colors):
                h, w = lab.shape
                nh, nw = max(self.patch, int(h * s)), max(self.patch,
                                                          int(w * s))
                lab_s = cv2.resize(lab, (nw, nh),
                                   interpolation=cv2.INTER_AREA)
                col_s = cv2.resize(col, (nw, nh),
                                   interpolation=cv2.INTER_AREA)
                labs.append(lab_s)
                cols.append(col_s)
                degs.append(synthesize_lr(lab_s, self.scale))
            self._levels.append((labs, cols, degs))
        # edge-pixel coordinate lists per (level, image), precomputed once
        self._edge_yx = None
        if self.edge_bias:
            if not 0.0 < self.edge_bias <= 1.0:
                raise ValueError(f"edge_bias must be in (0, 1], got "
                                 f"{self.edge_bias}")
            self._edge_yx = []
            for labs, _, _ in self._levels:
                per = []
                for lab in labs:
                    gy, gx = np.gradient(lab.astype(np.float32))
                    gm = np.abs(gy) + np.abs(gx)
                    # max() guard: a constant-depth image has percentile 0
                    # and would mark EVERY pixel an edge
                    thr = max(float(np.percentile(gm, 90.0)), 1e-3)
                    per.append(np.nonzero(gm >= thr))
                self._edge_yx.append(per)

    def __iter__(self) -> Iterator[dict]:
        while True:
            yield self.sample()

    def prefetch(self, depth: int = 2,
                 start_step: int = 0) -> "PrefetchSampler":
        """Background-thread sampling: overlaps host-side patch assembly
        (the measured train-loop bottleneck on a 1-core host) with device
        compute. `depth` batches are staged ahead, starting the stream at
        `start_step` (orbax resume hands the restored step in, so the
        resumed stream continues the uninterrupted one exactly)."""
        return PrefetchSampler(self, depth, start_step)

    def sample(self) -> dict:
        b = self.sample_at(self._step)
        self._step += 1
        return b

    def sample_at(self, step: int) -> dict:
        """The batch for `step` — pure in (seed, step), see class doc."""
        rng = np.random.RandomState(
            np.random.SeedSequence((self.seed, step)).generate_state(8))
        B, P = self.batch, self.patch
        dch = 1 if self.cond is None else 2
        depth = np.empty((B, P, P, dch), np.float32)
        color = np.empty((B, P, P, 1), np.float32)
        label = np.empty((B, P, P, 1), np.float32)
        for b in range(B):
            i = (rng.randint(len(self.labels)) if self._scene_p is None
                 else int(rng.choice(len(self.labels), p=self._scene_p)))
            li = rng.randint(len(self._levels))
            lv = self._levels[li]
            lab, col, deg = lv[0][i], lv[1][i], lv[2][i]
            h, w = lab.shape
            y, x = self._corner(rng, li, i, h, w)
            lp = lab[y:y + P, x:x + P].astype(np.float32) / 255.0
            cp = col[y:y + P, x:x + P].astype(np.float32) / 255.0
            dp = deg[y:y + P, x:x + P].astype(np.float32) / 255.0
            if self.collage and rng.rand() < self.collage:
                lp, cp, dp = self._collage(rng, lp, cp, dp)
            aug = self.augment if isinstance(self.augment, str) else (
                "flips" if self.augment else "none")
            if aug != "none":
                if rng.rand() < 0.5:
                    lp, cp, dp = lp[:, ::-1], cp[:, ::-1], dp[:, ::-1]
                if rng.rand() < 0.5:
                    lp, cp, dp = lp[::-1], cp[::-1], dp[::-1]
            if aug == "full":
                if rng.rand() < 0.5:   # rot90 (square patches)
                    lp, cp, dp = lp.T, cp.T, dp.T
                # photometric jitter on the GUIDANCE only: the color image
                # contributes structure, not absolute intensity — unseen
                # scenes have unseen exposure/contrast
                g = rng.uniform(0.7, 1.4)
                a = rng.uniform(0.8, 1.2)
                o = rng.uniform(-0.1, 0.1)
                cp = np.clip(a * cp ** g + o, 0.0, 1.0)
                # joint range-preserving affine on depth input AND label:
                # depth values are scale-arbitrary, the refinement task is
                # affine-equivariant ([0,1] -> [b, s+b] subset of [0,1])
                s = rng.uniform(0.5, 1.0)
                t = rng.uniform(0.0, 1.0 - s)
                lp = s * lp + t
                dp = s * dp + t
            depth[b, ..., 0] = dp
            if self.cond is not None:
                depth[b, ..., 1] = self.cond[i]
            color[b, ..., 0] = cp
            label[b, ..., 0] = lp
        return {"depth": depth, "color": color, "label": label,
                "mask": np.ones((B, P, P, 1), np.float32)}

    def _collage(self, rng, lp, cp, dp):
        """Depth-collage paste (see the `collage` field doc).

        Pastes a rectangle of another scene's (label, guidance) into the
        patch, then repairs the degraded input in a band of 2*scale px
        around the seam with the re-synthesized degradation of the
        COMPOSITE label — the seam gets the bicubic blur a real degraded
        input would have there, while pixels away from it keep their
        shipped degradation. Donor crops are edge-biased like patch
        corners when edge_bias is on (thin structures are the point).
        """
        P = self.patch
        # CutMix-style rectangle: 15-45% of the patch area
        area = rng.uniform(0.15, 0.45) * P * P
        ar = np.exp(rng.uniform(np.log(0.5), np.log(2.0)))
        rh = int(np.clip(np.sqrt(area * ar), 4, P))
        rw = int(np.clip(np.sqrt(area / ar), 4, P))
        ty = rng.randint(P - rh + 1)
        tx = rng.randint(P - rw + 1)

        # donor: any scene at pyramid level 0, crop edge-biased when
        # the sampler is (donor seams should cut THROUGH structure)
        j = rng.randint(len(self.labels))
        labs, cols, _ = self._levels[0]
        dl, dc = labs[j], cols[j]
        dh, dw = dl.shape
        sy, sx = self._corner(rng, 0, j, dh, dw)
        sy = min(sy, dh - rh)
        sx = min(sx, dw - rw)

        lp = lp.copy()
        cp = cp.copy()
        lp[ty:ty + rh, tx:tx + rw] = (
            dl[sy:sy + rh, sx:sx + rw].astype(np.float32) / 255.0)
        cp[ty:ty + rh, tx:tx + rw] = (
            dc[sy:sy + rh, sx:sx + rw].astype(np.float32) / 255.0)

        # paste the donor's own shipped/base degradation inside the
        # rectangle, then repair the seam band from the composite label
        deg_j = self._levels[0][2][j]
        dp = dp.copy()
        dp[ty:ty + rh, tx:tx + rw] = (
            deg_j[sy:sy + rh, sx:sx + rw].astype(np.float32) / 255.0)
        lab8 = np.clip(np.rint(lp * 255.0), 0, 255).astype(np.uint8)
        resyn = synthesize_lr(lab8, self.scale).astype(np.float32) / 255.0
        band = 2 * self.scale
        seam = np.zeros((P, P), bool)
        y0, y1 = max(0, ty - band), min(P, ty + rh + band)
        x0, x1 = max(0, tx - band), min(P, tx + rw + band)
        seam[y0:y1, x0:x1] = True
        iy0, iy1 = ty + band, ty + rh - band
        ix0, ix1 = tx + band, tx + rw - band
        if iy1 > iy0 and ix1 > ix0:
            seam[iy0:iy1, ix0:ix1] = False   # rectangle interior keeps
        dp[seam] = resyn[seam]               # its shipped degradation
        return lp, cp, dp

    def _corner(self, rng, level: int, img: int, h: int, w: int):
        """Top-left patch corner: uniform, or (with prob edge_bias) jittered
        around a random depth-edge pixel of this image."""
        P = self.patch
        if self._edge_yx is not None and rng.rand() < self.edge_bias:
            ys, xs = self._edge_yx[level][img]
            if len(ys):
                k = rng.randint(len(ys))
                jy = rng.randint(-(P // 4), P // 4 + 1)
                jx = rng.randint(-(P // 4), P // 4 + 1)
                y = int(np.clip(ys[k] - P // 2 + jy, 0, max(0, h - P)))
                x = int(np.clip(xs[k] - P // 2 + jx, 0, max(0, w - P)))
                return y, x
        return (rng.randint(max(1, h - P + 1)),
                rng.randint(max(1, w - P + 1)))


class _WorkerError:
    """Sentinel carrying an exception out of the prefetch worker thread."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class PrefetchSampler:
    """Thread-backed sampler: .sample() pops a pre-assembled batch.

    Drives the underlying sampler by explicit step index (sample_at), so
    the delivered stream is start_step, start_step+1, ... regardless of
    thread scheduling or queue depth.
    """

    def __init__(self, sampler: PatchSampler, depth: int = 2,
                 start_step: int = 0):
        import queue
        import threading
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()

        def worker():
            step = start_step
            while not self._stop.is_set():
                try:
                    b = sampler.sample_at(step)
                    step += 1
                except BaseException as e:  # surface in sample(), don't
                    b = _WorkerError(e)     # die silently (daemon thread)
                while not self._stop.is_set():
                    try:
                        self._q.put(b, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if isinstance(b, _WorkerError):
                    return

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def sample(self) -> dict:
        if getattr(self, "_failed", None) is not None:
            # sticky: the worker exited after its error — a second
            # sample() would otherwise block forever on the dead queue
            raise RuntimeError(
                "PrefetchSampler worker thread failed") from self._failed
        item = self._q.get()
        if isinstance(item, _WorkerError):
            self._failed = item.exc
            raise RuntimeError(
                "PrefetchSampler worker thread failed") from item.exc
        return item

    def close(self) -> None:
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
