"""Batching + host→device prefetch.

Replaces `create_dataloader`/`DistIterSampler` (data/__init__.py:7-28,
data/data_sampler.py:12-66): one process feeds the whole mesh; the global
batch is assembled on host and `jax.device_put` with a batch-dim
NamedSharding splits it across devices — the single-program equivalent of the
reference's per-rank `batch_size // world_size` split (data/__init__.py:16-17).

A prefetch thread overlaps host decode with device compute; item fetches fan
out over a thread pool (cv2/PIL release the GIL while decoding).
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


class Loader:
    def __init__(self, dataset, batch_size, shuffle=True, seed=0,
                 prefetch=2, sharding=None, ratio=1, num_workers=4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.sharding = sharding
        # epoch-enlargement factor (DistIterSampler ratio, train.py:57 uses 200)
        self.ratio = ratio
        self.num_workers = num_workers

    def _make_batch(self, idxs, pool=None):
        if self.sharding is not None:
            import jax
            if jax.process_count() > 1:
                # multi-host: fetch only this process's contiguous row block
                # of the global batch (per-rank batch_size // world_size,
                # data/__init__.py:16-17); put_global assembles the global
                # array from the per-process chunks.
                from ..parallel import local_batch_slice
                lo, hi = local_batch_slice(len(idxs))
                idxs = idxs[lo:hi]
        if pool is not None:
            items = list(pool.map(self.dataset.__getitem__, idxs))
        else:
            items = [self.dataset[i] for i in idxs]
        if isinstance(items[0], dict):
            batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
        elif isinstance(items[0], tuple):
            batch = tuple(np.stack(parts) for parts in zip(*items))
        else:
            batch = np.stack(items)
        if self.sharding is not None:
            from ..parallel import put_global
            import jax
            batch = jax.tree_util.tree_map(
                lambda x: put_global(x, self.sharding), batch)
        return batch

    def __iter__(self):
        n = len(self.dataset) * self.ratio
        order = np.arange(n) % len(self.dataset)
        if self.shuffle:
            self.rng.shuffle(order)
        q = queue.Queue(maxsize=self.prefetch)
        n_batches = n // self.batch_size

        def worker():
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    for b in range(n_batches):
                        idxs = order[b * self.batch_size:
                                     (b + 1) * self.batch_size]
                        q.put(self._make_batch(idxs, pool))
            except RuntimeError:
                # interpreter shutdown while prefetching (consumer stopped
                # early / process exiting): drop the remaining batches quietly
                pass
            q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item

    def __len__(self):
        return len(self.dataset) * self.ratio // self.batch_size
