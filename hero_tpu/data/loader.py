"""Task scheduling + host→device prefetch.

- :class:`MetaLoader` — the reference's weighted multi-task scheduler
  (``data/loader.py:19-59``) with its cross-rank broadcast replaced by a
  common seeded RNG: every host draws the same task sequence with zero
  collectives (SURVEY.md §5.8).
- :class:`PrefetchLoader` — the reference overlaps H2D copies on a CUDA
  side stream (``data/loader.py:62-144``); here a background thread builds
  the next fixed-shape numpy batch and ``jax.device_put``s it (async on
  TPU), so input assembly and transfer hide behind the running step.
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

import numpy as np


class BatchSampler:
    """Infinite shuffled index batches over a dataset, rank-sharded."""

    def __init__(self, n_items: int, batch_size: int, seed: int = 0,
                 rank: int = 0, world_size: int = 1,
                 drop_last: bool = True):
        self.n = n_items
        self.bs = batch_size
        self.seed = seed
        self.rank = rank
        self.world = world_size
        self.drop_last = drop_last

    def epoch_batches(self, epoch: int) -> List[List[int]]:
        rng = random.Random(self.seed * 1_000_003 + epoch)
        full = list(range(self.n))
        rng.shuffle(full)
        idx = full[self.rank::self.world]
        if not idx and self.n:
            # non-empty dataset but this rank's shard is empty
            # (n_items < world_size): wrap-assign from the full shuffled
            # list so every rank still trains — an empty epoch would make
            # __iter__ spin forever without ever raising
            idx = [full[self.rank % self.n]]
        if 0 < len(idx) < self.bs:
            # fewer items than one fixed-shape batch (e.g. a small
            # second-bucket shard, or the wrap-assign above): top up with
            # OTHER ranks' items from the same shuffled epoch before
            # repeating — a batch made of copies of one example is
            # degenerate for the in-batch-negative losses (every negative
            # identical to the positive).  Rank-rotate the fill so ranks
            # don't all train the identical batch; shard disjointness is
            # deliberately traded away only on these tiny shards.
            own = set(idx)
            extra = [i for i in full if i not in own]
            if extra:
                rot = self.rank % len(extra)
                extra = extra[rot:] + extra[:rot]
            idx = (idx + extra)[:self.bs]
            if len(idx) < self.bs:  # dataset smaller than one batch
                idx = (idx * -(-self.bs // len(idx)))[:self.bs]
        batches = [idx[i:i + self.bs]
                   for i in range(0, len(idx) - self.bs + 1, self.bs)]
        tail = idx[len(batches) * self.bs:]
        if tail and not self.drop_last:
            # fixed-shape contract: the tail batch is wrap-filled to full
            # size rather than emitted ragged
            batches.append((tail + idx)[:self.bs])
        return batches

    def __iter__(self) -> Iterator[Tuple[int, List[int]]]:
        if self.n == 0:
            raise ValueError("BatchSampler over an empty dataset")
        epoch = 0
        while True:
            for b in self.epoch_batches(epoch):
                yield epoch, b
            epoch += 1


class MetaLoader:
    """Weighted random task choice per step, identical on every host.

    ``loaders``: {task_name: (iterator, ratio)} — matching the reference's
    repeat-by-ratio name list (``data/loader.py:29-41``).
    """

    def __init__(self, loaders: Dict[str, Tuple[Iterator, int]],
                 accum_steps: int = 1, seed: int = 0):
        assert loaders
        self.name2iter = {}
        self.sampling_pools: List[str] = []
        for name, (it, ratio) in loaders.items():
            self.name2iter[name] = it
            self.sampling_pools.extend([name] * ratio)
        self.accum_steps = accum_steps
        self.rng = random.Random(seed)
        self.step = 0
        self._task = self.sampling_pools[0]

    def fast_forward(self, n_micro_batches: int) -> None:
        """Resume support: replay the first ``n_micro_batches`` task draws
        (same seeded RNG → identical sequence) and skip the corresponding
        batches in every task iterator WITHOUT building them, so a resumed
        run continues the exact task/batch schedule instead of replaying it
        from the start.  Call before iterating."""
        assert self.step == 0, "fast_forward must precede iteration"
        counts: Dict[str, int] = {}
        for s in range(n_micro_batches):
            if s % self.accum_steps == 0:
                self._task = self.rng.choice(self.sampling_pools)
            counts[self._task] = counts.get(self._task, 0) + 1
        self.step = n_micro_batches
        for name, c in counts.items():
            it = self.name2iter[name]
            if hasattr(it, "skip"):
                it.skip(c)
            else:
                for _ in range(c):
                    next(it)

    def __iter__(self):
        while True:
            if self.step % self.accum_steps == 0:
                self._task = self.rng.choice(self.sampling_pools)
            self.step += 1
            batch = next(self.name2iter[self._task])
            yield self._task, batch


class PrefetchLoader:
    """Wrap an iterator of (tag, numpy-batch) with background assembly and
    device placement."""

    def __init__(self, it: Iterator, device_put: Optional[Callable] = None,
                 depth: int = 2):
        self.it = it
        self.depth = depth
        if device_put is None:
            import jax
            def device_put(batch):
                return {k: (jax.device_put(v)
                            if isinstance(v, np.ndarray) else v)
                        for k, v in batch.items()}
        self.device_put = device_put

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        stop = object()
        err: List[BaseException] = []

        def worker():
            # an exception in the wrapped iterator (batch assembly) must
            # crash the consumer, not end iteration cleanly: a prefetch
            # thread that dies mid-run would otherwise make the train loop
            # exit normally and report a crashed run as "training done"
            try:
                for tag, batch in self.it:
                    q.put((tag, self.device_put(batch)))
            except BaseException as e:  # re-raised on the main thread
                err.append(e)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                if err:
                    raise RuntimeError(
                        "prefetch worker failed mid-iteration") from err[0]
                return
            yield item


class DatasetIterator:
    """Infinite (epoch-aware) batch iterator over a task dataset, with
    cheap ``skip`` for schedule-exact resume (index batches are advanced
    without touching the dataset)."""

    def __init__(self, dataset, batch_builder: Callable, batch_size: int,
                 seed: int = 0, rank: int = 0, world_size: int = 1):
        self.dataset = dataset
        self.batch_builder = batch_builder
        self._sampler_it = iter(BatchSampler(len(dataset), batch_size,
                                             seed=seed, rank=rank,
                                             world_size=world_size))

    def skip(self, n: int) -> None:
        for _ in range(n):
            next(self._sampler_it)

    def __iter__(self):
        return self

    def __next__(self):
        epoch, indices = next(self._sampler_it)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)
        return self.batch_builder(self.dataset, indices)


def dataset_iterator(dataset, batch_builder: Callable, batch_size: int,
                     seed: int = 0, rank: int = 0, world_size: int = 1):
    """Infinite (epoch-aware) batch iterator over a task dataset."""
    return DatasetIterator(dataset, batch_builder, batch_size, seed=seed,
                           rank=rank, world_size=world_size)
