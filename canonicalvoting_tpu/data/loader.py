"""Background-prefetch data loader.

Replaces torch DataLoader(num_workers=10) (reference train_joint.py:211).
Two worker modes:

  * "process" (default for num_workers >= 2, like the reference's process
    workers): a persistent forkserver pool runs ``__getitem__`` AND
    ``collate_fn`` for whole batches in worker processes — PLY parsing,
    label math, quantization and pyramid/dense-id building are GIL-bound
    numpy/Python (collate measured ~10x the item cost), so both must fan
    out to hit training ingest rates. The pool is created once and reused
    across epochs. forkserver (not fork) because the pool is created after
    JAX initializes its runtime threads and fork-with-threads is unsafe;
    unpicklable dataset/collate closures fall back to fork.
  * "thread": a thread pool over items with collate in the producer thread
    — enough for precomputed/ListDataset items and used in tests.

A producer thread prefetches finished batches ahead of the training step,
overlapping host work with device compute. Worker processes never touch JAX.
"""

from __future__ import annotations

import atexit
import multiprocessing
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Sequence

import numpy as np

_WORKER_DS = None
_WORKER_COLLATE = None


def _pool_init(ds, collate):
    global _WORKER_DS, _WORKER_COLLATE
    _WORKER_DS = ds
    _WORKER_COLLATE = collate


def _pool_collate_batch(chunk):
    return _WORKER_COLLATE([_WORKER_DS[int(i)] for i in chunk])


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Callable,
        shuffle: bool = True,
        num_workers: int = 4,
        drop_last: bool = False,
        prefetch: int = 2,
        seed: int = 0,
        workers_mode: str = "auto",
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.num_workers = max(num_workers, 1)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.rng = np.random.RandomState(seed)
        if workers_mode == "auto":
            workers_mode = "process" if self.num_workers >= 2 else "thread"
        self.workers_mode = workers_mode
        self._pool = None

    def _ensure_pool(self):
        if self._pool is None:
            # forkserver: fork() from a threaded parent is unsafe (training
            # always creates the pool after JAX has spun up its runtime
            # threads; CPython 3.12+ warns and the child can deadlock in a
            # lock a JAX thread held at fork time). The forkserver process
            # is single-threaded, so its forks are clean; initargs travel
            # by pickle. Fall back to plain fork only when the dataset or
            # collate closure is unpicklable (tests with local lambdas).
            import pickle

            try:
                pickle.dumps((self.dataset, self.collate_fn))
                ctx = multiprocessing.get_context("forkserver")
            except Exception:
                ctx = multiprocessing.get_context("fork")
            self._pool = ctx.Pool(
                self.num_workers, initializer=_pool_init,
                initargs=(self.dataset, self.collate_fn),
            )
            atexit.register(self.close)
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None

    def __del__(self):
        self.close()

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        for s in range(0, len(idx), self.batch_size):
            chunk = idx[s: s + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield chunk

    def __iter__(self) -> Iterator:
        # whole BATCHES (items + collate) are fanned out across worker
        # processes through one ordered imap — collate (pyramid / dense-id
        # building) is the dominant host cost and must parallelize too, not
        # just __getitem__; the producer thread only forwards finished
        # batch dicts (a few MB each through the fork pipe)
        batches = list(self._batches())

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            tp = None
            try:
                if self.workers_mode == "process":
                    pool = self._ensure_pool()
                    batch_iter = pool.imap(
                        _pool_collate_batch,
                        [[int(i) for i in c] for c in batches], chunksize=1,
                    )
                else:
                    tp = ThreadPoolExecutor(max_workers=self.num_workers)
                    flat = [int(i) for chunk in batches for i in chunk]
                    item_iter = tp.map(self.dataset.__getitem__, flat)

                    def gen():
                        for chunk in batches:
                            yield self.collate_fn(
                                [next(item_iter) for _ in range(len(chunk))]
                            )

                    batch_iter = gen()
                for batch in batch_iter:
                    q.put(batch)
            except BaseException as e:  # noqa: BLE001
                # propagate to the consumer: a swallowed worker exception
                # otherwise surfaces as a bare StopIteration on the first
                # next() — the actual error hidden in a daemon thread
                q.put(("__loader_error__", e))
            finally:
                if tp is not None:
                    tp.shutdown(wait=False)
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, tuple) and len(item) == 2 \
                    and item[0] == "__loader_error__":
                raise item[1]
            yield item


class ListDataset:
    """Wrap a list of precomputed items as a dataset."""

    def __init__(self, items: Sequence):
        self.items = list(items)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]
