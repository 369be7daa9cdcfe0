"""Vimeo-90K triplet pipeline — re-design of ``datasets/Vimeo_90K_interp.py``,
``datasets/listdatasets.py`` and ``balancedsampler.py``.

Reference behaviour preserved:
- split files ``tri_trainlist.txt`` / ``tri_testlist.txt`` (the reference uses
  the renamed copies ``sep_trainlist.txt`` / ``sep_testlist.txt``), dropping
  the last line (Vimeo_90K_interp.py:20-24);
- per-sample augmentation (listdatasets.py:8-49): random temporal order swap
  (im1<->im3), random crop to 256x448 (no-op at native size), random
  left-right and up-down flips;
- the reference's loader applies augmentation to the validation split too; we
  default ``augment=False`` for eval but expose the flag;
- ``RandomBalancedSampler`` (balancedsampler.py:4-31): an infinite iterator
  over reshuffled permutations, epoch length decoupled from dataset size.

Returned batches are NHWC float32 in [0,1]: dict(x0=im1, x1=im3, y=im2).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


def read_triplet_list(root: str, split_file: str) -> List[str]:
    path = os.path.join(root, split_file)
    with open(path) as f:
        lines = [ln.strip() for ln in f.read().split("\n")]
    # reference drops the final (empty) entry (Vimeo_90K_interp.py:21-24)
    lines = lines[:-1]
    return [ln for ln in lines if ln]


def vimeo90k_splits(root: str,
                    train_list: str = "tri_trainlist.txt",
                    test_list: str = "tri_testlist.txt",
                    shuffle_seed: Optional[int] = 0):
    """-> (train_paths, test_paths). The reference shuffles the train list
    once at load (Vimeo_90K_interp.py:25-27)."""
    for cand in (train_list, "sep_trainlist.txt"):
        if os.path.exists(os.path.join(root, cand)):
            train_list = cand
            break
    for cand in (test_list, "sep_testlist.txt"):
        if os.path.exists(os.path.join(root, cand)):
            test_list = cand
            break
    train = read_triplet_list(root, train_list)
    test = read_triplet_list(root, test_list)
    if shuffle_seed is not None:
        np.random.RandomState(shuffle_seed).shuffle(train)
    return train, test


def _imread(path: str) -> np.ndarray:
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def load_triplet(root: str, rel: str, augment: bool,
                 rng: np.random.RandomState,
                 crop_hw: Tuple[int, int] = (256, 448)):
    """One (x0, x1, y) sample with the reference augmentations."""
    seq = os.path.join(root, "sequences", rel)
    names = ["im1.png", "im2.png", "im3.png"]
    if augment and rng.randint(0, 2):
        names = ["im3.png", "im2.png", "im1.png"]   # temporal swap
    first, mid, last = (_imread(os.path.join(seq, n)) for n in names)

    ch, cw = crop_hw
    h, w = first.shape[:2]
    oy = rng.randint(0, h - ch + 1) if h > ch else 0
    ox = rng.randint(0, w - cw + 1) if w > cw else 0
    first, mid, last = (im[oy:oy + ch, ox:ox + cw] for im in (first, mid, last))

    if augment:
        if rng.randint(0, 2):
            first, mid, last = (np.fliplr(im) for im in (first, mid, last))
        if rng.randint(0, 2):
            first, mid, last = (np.flipud(im) for im in (first, mid, last))

    to_f32 = lambda im: np.ascontiguousarray(im, dtype=np.float32) / 255.0
    return to_f32(first), to_f32(last), to_f32(mid)


class BalancedSampler:
    """Infinite reshuffled-permutation index stream (balancedsampler.py:4-31)."""

    def __init__(self, n: int, seed: int = 0):
        self.n = n
        self.rng = np.random.RandomState(seed)
        self._perm = self.rng.permutation(n)
        self._pos = 0

    def __iter__(self):
        return self

    def __next__(self) -> int:
        if self._pos >= self.n:
            self._perm = self.rng.permutation(self.n)
            self._pos = 0
        idx = int(self._perm[self._pos])
        self._pos += 1
        return idx


class Vimeo90KDataset:
    """Batched triplet loader with optional background prefetch threads
    (the TPU-side replacement for DataLoader(num_workers=8, pin_memory)
    at train.py:71-77)."""

    def __init__(self, root: str, paths: Sequence[str], batch_size: int,
                 augment: bool = True, seed: int = 0,
                 crop_hw: Tuple[int, int] = (256, 448)):
        self.root = root
        self.paths = list(paths)
        self.batch_size = batch_size
        self.augment = augment
        self.crop_hw = crop_hw
        self.rng = np.random.RandomState(seed)
        self.sampler = BalancedSampler(len(self.paths), seed)

    def __len__(self):
        return len(self.paths)

    def steps_per_epoch(self):
        return len(self.paths) // self.batch_size

    def _make_batch(self, idxs):
        from vfidkr_tpu.data import native as nat
        if nat.native_available():
            # decode to uint8, then crop/flip/normalise/assemble in C++
            im1s, im2s, im3s = [], [], []
            for i in idxs:
                seq = os.path.join(self.root, "sequences", self.paths[i])
                im1s.append(_imread(os.path.join(seq, "im1.png")))
                im2s.append(_imread(os.path.join(seq, "im2.png")))
                im3s.append(_imread(os.path.join(seq, "im3.png")))
            im1 = np.stack(im1s)
            h, w = im1.shape[1:3]
            aug = nat.make_aug_records(self.rng, len(im1s), h, w,
                                       self.crop_hw, self.augment)
            return nat.augment_triplet_batch(im1, np.stack(im2s),
                                             np.stack(im3s), aug, self.crop_hw)
        x0s, x1s, ys = [], [], []
        for i in idxs:
            x0, x1, y = load_triplet(self.root, self.paths[i], self.augment,
                                     self.rng, self.crop_hw)
            x0s.append(x0)
            x1s.append(x1)
            ys.append(y)
        return {"x0": np.stack(x0s), "x1": np.stack(x1s), "y": np.stack(ys)}

    def batches(self, num_batches: Optional[int] = None,
                sequential: bool = False) -> Iterator[dict]:
        produced = 0
        seq_pos = 0
        while num_batches is None or produced < num_batches:
            if sequential:
                if seq_pos + self.batch_size > len(self.paths):
                    return
                idxs = range(seq_pos, seq_pos + self.batch_size)
                seq_pos += self.batch_size
            else:
                idxs = [next(self.sampler) for _ in range(self.batch_size)]
            yield self._make_batch(idxs)
            produced += 1


def prefetch(iterator: Iterator, size: int = 2) -> Iterator:
    """Host-side background prefetch (double buffering by default).
    Producer exceptions are re-raised in the consumer, not swallowed."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for item in iterator:
                q.put(item)
            q.put(sentinel)
        except BaseException as e:  # noqa: BLE001 — forwarded to consumer
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
