"""Host-side dataset: annotation parsing, decode, staging, batching.

Parity targets:
- annotation-line format ``path x1,y1,x2,y2,cls ...``
  (``dataset/yolo_dataset.py:44-58``, ``tools/gen_annotation.py:18-36``)
- the sampling policy of ``YoloDataset2`` (``dataset/yolo_dataset_git.py``):
  mosaic with prob ``mosaic_prob`` during the first
  ``special_aug_ratio`` of epochs (``:54``), mixup with ``mixup_prob``
  after mosaic (``:60``), deterministic letterbox for val,
- the collate contract: images + per-image labels
  ``[cls, cx, cy, w, h]`` normalized (``:405-415``; the batch-index
  column becomes an explicit batch dimension here).

TPU re-design: the host ONLY decodes JPEGs and letterboxes them onto
fixed staging canvases; every randomized augmentation runs on device
(``ops/augment.py``). The loader emits fixed-shape numpy batches:
  tiles (B,4,S,S,3) u8, metas (B,4,5), boxes (B,4,MB,5), masks (B,4,MB),
  mosaic/mixup flags (B,)
and a background thread keeps one batch ahead (device prefetch replacing
``InfiniteDataLoader``; ``dataset/infinite_dataLoader.py:4-36``).
"""
from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..ops.preprocess import StagingMeta, stage_image

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


@dataclass
class Annotation:
    path: str
    boxes: np.ndarray  # (n, 5) [x1, y1, x2, y2, cls] px


def parse_annotation_lines(lines: Sequence[str]) -> List[Annotation]:
    """``img.jpg x1,y1,x2,y2,cls ...`` -> records (yolo_dataset.py:44-58)."""
    out = []
    for line in lines:
        parts = line.split()
        if not parts:
            continue
        boxes = np.array([[int(v) for v in b.split(",")] for b in parts[1:]],
                         np.float32).reshape(-1, 5)
        out.append(Annotation(path=parts[0], boxes=boxes))
    return out


def load_annotation_file(path: str) -> List[Annotation]:
    with open(path, encoding="utf-8") as f:
        return parse_annotation_lines(f.readlines())


def _read_rgb(path: str) -> np.ndarray:
    """Decode to RGB uint8 (the training pipeline is RGB; the reference
    trains RGB via PIL but predicts BGR via cv2.imread — a flagged
    inconsistency we fix by using RGB everywhere)."""
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class YoloDataset:
    """Index-file dataset emitting device-ready staged batches."""

    def __init__(
        self,
        annotations: Sequence[Annotation],
        image_size: int = 640,
        max_boxes: int = 128,
        mosaic: bool = True,
        mixup: bool = True,
        mosaic_prob: float = 0.5,
        mixup_prob: float = 0.5,
        epoch_length: int = 100,
        special_aug_ratio: float = 0.7,   # yolo_dataset_git.py:54
        train: bool = True,
        seed: int = 0,
        use_native: bool = None,
        cache_images: bool = False,
    ):
        self.annotations = list(annotations)
        self.size = image_size
        self.max_boxes = max_boxes
        self.mosaic = mosaic
        self.mixup = mixup
        self.mosaic_prob = mosaic_prob
        self.mixup_prob = mixup_prob
        self.epoch_length = epoch_length
        self.special_aug_ratio = special_aug_ratio
        self.train = train
        self.seed = seed
        self.rng = np.random.RandomState(seed)
        self.epoch_now = 0
        self._cache: dict = {}
        if use_native is None:
            from . import native_loader
            use_native = native_loader.available()
        self.use_native = use_native
        # optional in-RAM cache of staged canvases (decode+resize once);
        # ~S*S*3 bytes per image — only for datasets that fit in memory
        self.cache_images = cache_images

    def __len__(self):
        return len(self.annotations)

    def reseed(self, epoch: int):
        """Deterministic per-epoch rng: the shuffle order and the
        mosaic/mixup tile plans depend only on (seed, epoch), so a
        resumed run replays the SAME remaining-epoch sequence an
        uninterrupted run produces (round-4 resume-semantics fix;
        Trainer.run calls this at every epoch start)."""
        self.epoch_now = epoch
        self.rng = np.random.RandomState([self.seed & 0x7FFFFFFF, epoch])

    # -- single staged sample ---------------------------------------------
    def _staged(self, idx: int):
        if self.cache_images and idx in self._cache:
            canvas, meta_v = self._cache[idx]
            ann = self.annotations[idx]
            boxes = np.zeros((self.max_boxes, 5), np.float32)
            mask = np.zeros((self.max_boxes,), bool)
            n = min(len(ann.boxes), self.max_boxes)
            if n:
                boxes[:n] = ann.boxes[:n]
                mask[:n] = True
            return canvas, meta_v, boxes, mask
        ann = self.annotations[idx]
        img = _read_rgb(ann.path)
        canvas, meta = stage_image(img, self.size)
        boxes = np.zeros((self.max_boxes, 5), np.float32)
        mask = np.zeros((self.max_boxes,), bool)
        n = min(len(ann.boxes), self.max_boxes)
        if n:
            boxes[:n] = ann.boxes[:n]
            mask[:n] = True
        meta_v = np.array([meta.iw, meta.ih, meta.scale, meta.ox, meta.oy],
                          np.float32)
        if self.cache_images:
            self._cache[idx] = (canvas, meta_v)
        return canvas, meta_v, boxes, mask

    def sample(self, idx: int):
        """One sample -> (tiles (4,S,S,3), metas (4,5), boxes, masks,
        mosaic_flag, mixup_flag)."""
        S, MB = self.size, self.max_boxes
        tiles = np.zeros((4, S, S, 3), np.uint8)
        metas = np.zeros((4, 5), np.float32)
        metas[:, :3] = 1.0  # harmless defaults for unused tiles
        boxes = np.zeros((4, MB, 5), np.float32)
        masks = np.zeros((4, MB), bool)

        idxs, use_mosaic, use_mixup = self._tile_plan(idx)
        for t, j in enumerate(idxs):
            tiles[t], metas[t], boxes[t], masks[t] = self._staged(j)
        return tiles, metas, boxes, masks, use_mosaic, use_mixup

    def _tile_plan(self, idx: int):
        """Decide mosaic/mixup + which annotation feeds each tile slot."""
        use_mosaic = bool(
            self.train and self.mosaic and self.rng.rand() < self.mosaic_prob
            and self.epoch_now < self.epoch_length * self.special_aug_ratio)
        use_mixup = bool(self.train and use_mosaic and self.mixup
                         and self.rng.rand() < self.mixup_prob)
        idxs = [idx]
        if use_mosaic:
            extra = self.rng.randint(0, len(self.annotations), 3).tolist()
            idxs = extra + [idx]
            self.rng.shuffle(idxs)
        return idxs, use_mosaic, use_mixup

    @property
    def n_tiles(self) -> int:
        """4 tile slots when mosaic can fire this phase, else 1 (less
        host->device traffic; ops/augment handles both statically)."""
        mosaic_possible = (self.train and self.mosaic
                           and self.epoch_now < self.epoch_length
                           * self.special_aug_ratio)
        return 4 if mosaic_possible else 1

    def batch(self, indices: Sequence[int]):
        nt = self.n_tiles
        if self.use_native:
            out = self._batch_native(indices)
        else:
            outs = [self.sample(i) for i in indices]
            out = (np.stack([o[0] for o in outs]),
                   np.stack([o[1] for o in outs]),
                   np.stack([o[2] for o in outs]),
                   np.stack([o[3] for o in outs]),
                   np.array([o[4] for o in outs], bool),
                   np.array([o[5] for o in outs], bool))
        if nt == 1:
            tiles, metas, boxes, masks, mosaic, mixup = out
            out = (tiles[:, :1], metas[:, :1], boxes[:, :1], masks[:, :1],
                   np.zeros_like(mosaic), np.zeros_like(mixup))
        return out

    def _batch_native(self, indices: Sequence[int]):
        """Batched staging through the C++ thread-pool library."""
        from .native_loader import stage_batch_native
        B, S, MB = len(indices), self.size, self.max_boxes
        plans = [self._tile_plan(i) for i in indices]
        slots = []   # (sample_pos, tile_pos, annotation_index)
        for b, (idxs, _, _) in enumerate(plans):
            for t, j in enumerate(idxs):
                slots.append((b, t, j))
        cached = {j: self._cache[j] for _, _, j in slots
                  if self.cache_images and j in self._cache}
        need = [k for k, (_, _, j) in enumerate(slots) if j not in cached]
        paths = [self.annotations[slots[k][2]].path for k in need]
        if paths:
            n_tiles, n_metas, ok_n = stage_batch_native(paths, S, 128)
        flat_tiles = {}
        flat_metas = {}
        ok = {}
        for pos, k in enumerate(need):
            flat_tiles[k] = n_tiles[pos]
            flat_metas[k] = n_metas[pos]
            ok[k] = bool(ok_n[pos])
            if self.cache_images and ok[k]:
                self._cache[slots[k][2]] = (n_tiles[pos], n_metas[pos])
        for k, (_, _, j) in enumerate(slots):
            if j in cached:
                flat_tiles[k], flat_metas[k] = cached[j]
                ok[k] = True

        tiles = np.zeros((B, 4, S, S, 3), np.uint8)
        metas = np.zeros((B, 4, 5), np.float32)
        metas[:, :, :3] = 1.0
        boxes = np.zeros((B, 4, MB, 5), np.float32)
        masks = np.zeros((B, 4, MB), bool)
        for k, (b, t, j) in enumerate(slots):
            if not ok[k]:  # decode failure (e.g. non-JPEG) -> cv2 fallback
                tiles[b, t], metas[b, t], boxes[b, t], masks[b, t] = \
                    self._staged(j)
                continue
            tiles[b, t] = flat_tiles[k]
            metas[b, t] = flat_metas[k]
            ann = self.annotations[j]
            n = min(len(ann.boxes), MB)
            if n:
                boxes[b, t, :n] = ann.boxes[:n]
                masks[b, t, :n] = True
        mosaic = np.array([p[1] for p in plans], bool)
        mixup = np.array([p[2] for p in plans], bool)
        return tiles, metas, boxes, masks, mosaic, mixup

    # -- device-cache mode ---------------------------------------------------
    def staged_pool(self):
        """Stage EVERY image once -> (tiles (N,S,S,3) u8, metas (N,5),
        boxes (N,MB,5), masks (N,MB)) for `ops.augment.
        augment_batch_from_pool`. Staging is deterministic per image, so
        the pool is valid for the whole run; device_put it once and feed
        steps with `batch_plan` index batches (the only per-step
        host->device traffic). HBM cost: N*S*S*3 bytes (+ boxes) — the
        caller gates on dataset size (`device_cache` plan key)."""
        N, S, MB = len(self.annotations), self.size, self.max_boxes
        tiles = np.zeros((N, S, S, 3), np.uint8)
        metas = np.zeros((N, 5), np.float32)
        boxes = np.zeros((N, MB, 5), np.float32)
        masks = np.zeros((N, MB), bool)
        # stage through the SAME path `batch` uses (native C++ when
        # available, cv2 otherwise): the two resizers differ in rounding,
        # and the pool must be bit-identical to host-assembled batches.
        done = np.zeros((N,), bool)
        if self.use_native:
            from .native_loader import stage_batch_native
            paths = [a.path for a in self.annotations]
            n_tiles, n_metas, ok_n = stage_batch_native(paths, S, 128)
            for j in range(N):
                if ok_n[j]:
                    tiles[j], metas[j] = n_tiles[j], n_metas[j]
                    if self.cache_images:
                        self._cache.setdefault(j, (n_tiles[j], n_metas[j]))
                    done[j] = True
        for j in range(N):
            if not done[j]:
                tiles[j], metas[j], _, _ = self._staged(j)
            ann = self.annotations[j]
            n = min(len(ann.boxes), MB)
            if n:
                boxes[j, :n] = ann.boxes[:n]
                masks[j, :n] = True
        return tiles, metas, boxes, masks

    def batch_plan(self, indices: Sequence[int]):
        """Index-only analogue of `batch`: (tile_idx (B, n_tiles) int32,
        mosaic (B,), mixup (B,)). Draws the SAME per-sample rng stream as
        `batch` (`_tile_plan`), so a run is reproducible across modes.
        Non-mosaic samples repeat their index into every tile slot; only
        slot 0 feeds the single-image path and the mosaic branch result
        is discarded by the flag select in `augment_batch`."""
        B = len(indices)
        nt = self.n_tiles
        tile_idx = np.zeros((B, 4), np.int32)
        mosaic = np.zeros((B,), bool)
        mixup = np.zeros((B,), bool)
        for b, i in enumerate(indices):
            idxs, um, ux = self._tile_plan(i)
            tile_idx[b] = idxs if um else [i, i, i, i]
            mosaic[b], mixup[b] = um, ux
        if nt == 1:
            return tile_idx[:, :1], np.zeros_like(mosaic), np.zeros_like(mixup)
        return tile_idx, mosaic, mixup

    # -- epoch iteration ---------------------------------------------------
    def _epoch_order(self, batch_size: int, shuffle: bool, drop_last: bool):
        n = len(self.annotations)
        order = self.rng.permutation(n) if shuffle else np.arange(n)
        stop = n - (n % batch_size) if drop_last else n
        for s in range(0, stop, batch_size):
            idx = order[s:s + batch_size]
            if len(idx) < batch_size:  # pad final partial batch by wrapping
                idx = np.concatenate([idx, order[:batch_size - len(idx)]])
            yield idx

    def epoch_batches(self, batch_size: int, shuffle: bool = True,
                      drop_last: bool = True):
        for idx in self._epoch_order(batch_size, shuffle, drop_last):
            yield self.batch(idx)
        self.epoch_now += 1

    def epoch_plans(self, batch_size: int, shuffle: bool = True,
                    drop_last: bool = True):
        """Device-cache epoch iterator: yields `batch_plan` tuples with
        the same rng stream/shuffle semantics as `epoch_batches`."""
        for idx in self._epoch_order(batch_size, shuffle, drop_last):
            yield self.batch_plan(idx)
        self.epoch_now += 1


class InfiniteLoader:
    """Endless batch iterator that re-shuffles per epoch without restarting
    workers — the role of InfiniteDataLoader/RepeatSampler
    (dataset/infinite_dataLoader.py:4-36). ``take(n)`` yields n batches.
    """

    def __init__(self, dataset: "YoloDataset", batch_size: int,
                 shuffle: bool = True, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        while True:
            yield from self.dataset.epoch_batches(self.batch_size,
                                                  self.shuffle, self.drop_last)

    def take(self, n: int):
        it = iter(self)
        for _ in range(n):
            yield next(it)


class PrefetchLoader:
    """Background-thread prefetch (replaces InfiniteDataLoader workers)."""

    def __init__(self, gen_fn, depth: int = 2):
        self.gen_fn = gen_fn
        self.depth = depth

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        DONE = object()

        def worker():
            try:
                for item in self.gen_fn():
                    q.put(item)
            finally:
                q.put(DONE)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is DONE:
                break
            yield item
