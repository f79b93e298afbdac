"""Host-side batch loader.

Replaces ``torch.utils.data.DataLoader`` + ``WeightedRandomSampler`` +
``DistributedSampler`` usage in the reference (``train_speech_commands.py``,
``DiffWave_Unconditional/dataset.py:74,190``):

* weighted / shuffled / sequential sampling;
* background prefetch thread (double buffering toward the device);
* per-host sharding for multi-host data parallelism (the DistributedSampler
  role — each JAX process takes a disjoint stripe);
* the QKWS random-duration collate (uniform 0.747-2.747 s per batch,
  ref ``dataset.py:172-181``).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np


def default_collate(items):
    """Stack dict-of-arrays items into a dict of batched arrays."""
    out = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals
    return out


def rand_audio_length_collate(min_sec: float = 0.747, max_sec: float = 2.747,
                              sample_rate: int = 16000,
                              rng: Optional[np.random.Generator] = None):
    """Per-batch random duration: crop-or-pad every sample to one uniform
    length (ref ``DiffWave_Unconditional/dataset.py:172-181``)."""
    rng = rng or np.random.default_rng(0)

    def collate(items):
        length = int(rng.uniform(min_sec, max_sec) * sample_rate)
        fixed = []
        for it in items:
            s = it["samples"]
            if len(s) >= length:
                start = int(rng.integers(0, len(s) - length + 1))
                s = s[start: start + length]
            else:
                s = np.pad(s, (0, length - len(s)))
            fixed.append({**it, "samples": s.astype(np.float32)})
        return default_collate(fixed)

    return collate


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 32,
        shuffle: bool = False,
        weights: Optional[np.ndarray] = None,
        drop_last: bool = False,
        collate_fn: Callable = default_collate,
        seed: int = 0,
        num_shards: int = 1,
        shard_index: int = 0,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.weights = None if weights is None else np.asarray(
            weights, dtype=np.float64)
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.rng = np.random.default_rng(seed)
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = prefetch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.weights is not None:
            p = self.weights / self.weights.sum()
            idx = self.rng.choice(n, size=n, replace=True, p=p)
        elif self.shuffle:
            idx = self.rng.permutation(n)
        else:
            idx = np.arange(n)
        return idx[self.shard_index:: self.num_shards]

    def __len__(self):
        n = len(self._indices())
        return n // self.batch_size if self.drop_last \
            else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        idx = self._indices()
        n_batches = len(idx) // self.batch_size if self.drop_last \
            else -(-len(idx) // self.batch_size)

        def produce(q):
            try:
                for b in range(n_batches):
                    sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
                    items = [self.dataset[int(i)] for i in sel]
                    q.put(self.collate_fn(items))
            finally:
                q.put(None)

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=produce, args=(q,), daemon=True)
        t.start()
        while True:
            batch = q.get()
            if batch is None:
                break
            yield batch


class BucketedDataLoader:
    """Variable-length batching via a small set of static-shape buckets.

    The reference handles variable-length KWS audio by mutating the
    purifier's ``audio_shape`` per batch (``kws_adaptive_attack_eval.py:178``)
    — a new graph per distinct length. On TPU every distinct shape is a
    separate XLA compile, so this loader instead rounds each utterance up
    to the smallest of ``n_buckets`` static lengths (zero-padded, true
    length reported in ``batch["length"]``): the whole eval compiles at
    most ``n_buckets`` programs regardless of how many lengths the data
    contains.

    Bucket edges are length quantiles rounded up to ``align`` samples
    (lane-friendly). Items in one batch always share one bucket.
    """

    def __init__(self, dataset, batch_size: int = 32,
                 lengths: Optional[np.ndarray] = None, n_buckets: int = 4,
                 align: int = 128, shuffle: bool = False, seed: int = 0,
                 sample_key: str = "samples"):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.sample_key = sample_key
        if lengths is None:
            lengths = np.asarray(
                [len(dataset[i][sample_key]) for i in range(len(dataset))])
        self.lengths = np.asarray(lengths)

        qs = np.quantile(self.lengths, np.linspace(0, 1, n_buckets + 1)[1:])
        edges = np.unique((np.ceil(qs / align) * align).astype(int))
        self.buckets = edges  # ascending static lengths; last covers max
        self.bucket_of = np.searchsorted(edges, self.lengths)
        self.bucket_of = np.minimum(self.bucket_of, len(edges) - 1)

    def __len__(self):
        return int(sum(-(-int((self.bucket_of == b).sum()) // self.batch_size)
                       for b in range(len(self.buckets))))

    def __iter__(self) -> Iterator[dict]:
        batches = []
        for b, blen in enumerate(self.buckets):
            idx = np.nonzero(self.bucket_of == b)[0]
            if self.shuffle:
                idx = self.rng.permutation(idx)
            for s in range(0, len(idx), self.batch_size):
                batches.append((int(blen), idx[s: s + self.batch_size]))
        if self.shuffle:
            order = self.rng.permutation(len(batches))
            batches = [batches[i] for i in order]
        for blen, sel in batches:
            items = []
            for i in sel:
                it = dict(self.dataset[int(i)])
                s = np.asarray(it[self.sample_key], dtype=np.float32)
                it["length"] = min(len(s), blen)
                s = s[:blen]
                if len(s) < blen:
                    s = np.pad(s, (0, blen - len(s)))
                it[self.sample_key] = s
                items.append(it)
            yield default_collate(items)


def infinite(loader: DataLoader) -> Iterator[dict]:
    """Endless generator over a loader (ref ``load_sc09_data:96-99``)."""
    while True:
        yield from loader
