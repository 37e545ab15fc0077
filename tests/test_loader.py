"""DataLoader worker-mode tests: process fan-out correctness + modes."""

import os
import time

import numpy as np

from canonicalvoting_tpu.data.loader import DataLoader, ListDataset


class _PidDataset:
    """Returns (index, worker pid) — identifies which process ran the work."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        # ~50ms per item: with 24 items one worker alone would need >1.2s,
        # giving slow-starting siblings time to pick up tasks — on a loaded
        # machine, microsecond items let a single fast worker drain the
        # whole queue before the rest of the pool finishes spawning
        time.sleep(0.05)
        a = np.random.RandomState(i).rand(64, 64)
        s = float((a @ a).sum())
        return (int(i), os.getpid(), s)


def _collate(items):
    return items


def test_process_loader_yields_all_items_from_worker_processes():
    ds = _PidDataset(24)
    loader = DataLoader(ds, batch_size=4, collate_fn=_collate, shuffle=False,
                        num_workers=4, workers_mode="process")
    seen = []
    pids = set()
    for batch in loader:
        for i, pid, s in batch:
            seen.append(i)
            pids.add(pid)
    loader.close()
    assert seen == list(range(24))
    # the items were produced OUTSIDE this process
    assert os.getpid() not in pids
    assert len(pids) >= 2


def test_process_loader_reuses_pool_across_epochs():
    ds = _PidDataset(8)
    loader = DataLoader(ds, batch_size=4, collate_fn=_collate, shuffle=False,
                        num_workers=2, workers_mode="process")
    pids1 = {pid for b in loader for _, pid, _ in b}
    pids2 = {pid for b in loader for _, pid, _ in b}
    loader.close()
    # persistent pool: epoch 2 introduces NO new worker processes (a
    # respawning pool would). Equality is too strong — with more workers
    # than in-flight batches, a loaded machine can schedule epoch 2's
    # batches onto a subset of the epoch-1 workers.
    assert pids2 <= pids1, f"workers respawned: {pids2 - pids1}"
    assert os.getpid() not in pids1


def test_thread_loader_matches(rng):
    items = [(i, rng.rand(8)) for i in range(10)]
    ds = ListDataset(items)
    loader = DataLoader(ds, batch_size=3, collate_fn=_collate, shuffle=False,
                        num_workers=1, workers_mode="thread", drop_last=False)
    got = [i for b in loader for i, _ in b]
    assert got == list(range(10))
    assert len(loader) == 4


def test_auto_mode_selection():
    ds = ListDataset([1, 2, 3])
    a = DataLoader(ds, 1, _collate, num_workers=4)
    b = DataLoader(ds, 1, _collate, num_workers=1)
    assert a.workers_mode == "process"
    assert b.workers_mode == "thread"
    a.close()
