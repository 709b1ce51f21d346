"""grain-based input pipeline (optional alternative to PrefetchLoader).

Wraps any of this package's map-style datasets (ScanNetDataset,
SyntheticScenes — anything with __len__/__getitem__ returning the sample
dict) in a `grain.python.DataLoader`:

* deterministic global shuffling via `IndexSampler` (seeded, per-epoch);
* **multi-host sharding built in**: `ShardOptions(shard_index=process,
  shard_count=num_processes)` gives each host its slice of the global
  index stream — the piece the reference never had;
* worker processes for CPU-parallel decode (complementary to the C++
  native loader's in-process threads — pick one or stack them);
* checkpointable iterators (grain's PyGrainCheckpointHandler) so the input
  stream resumes exactly where training stopped.

Use `make_grain_loader(...)` and iterate; yields collated numpy batches
with the same contract as `pipeline.collate`.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def make_grain_loader(
    dataset,
    batch_size: int,
    seed: int = 0,
    shuffle: bool = True,
    num_epochs: Optional[int] = None,
    num_workers: int = 0,
    shard_index: int = 0,
    shard_count: int = 1,
    drop_remainder: bool = True,
):
    """Build a grain DataLoader over a map-style dataset.

    num_workers=0 runs in-process (right when the dataset already uses the
    native C++ decode threads); > 0 forks grain worker processes.
    """
    import grain.python as gp

    class _Source(gp.RandomAccessDataSource):
        def __len__(self):
            return len(dataset)

        def __getitem__(self, idx):
            sample = dataset[int(idx)]
            return {k: np.asarray(v) for k, v in sample.items() if k != "index"}

    sampler = gp.IndexSampler(
        num_records=len(dataset),
        shuffle=shuffle,
        seed=seed,
        num_epochs=num_epochs,
        shard_options=gp.ShardOptions(
            shard_index=shard_index, shard_count=shard_count, drop_remainder=True
        ),
    )

    loader = gp.DataLoader(
        data_source=_Source(),
        sampler=sampler,
        operations=[gp.Batch(batch_size=batch_size, drop_remainder=drop_remainder)],
        worker_count=num_workers,
    )
    return loader
