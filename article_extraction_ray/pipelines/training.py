"""Training-side consumption: deterministic shuffled epochs and
per-trainer streaming shards.

The end of a training-data pipeline is not a table but a stream of
shuffled batches feeding N trainer processes.  Two helpers cover that
contract Ray-Data-first:

- :func:`iter_training_batches` — per-epoch deterministic shuffle
  without a global ``random_shuffle`` (which is an all-to-all over the
  full corpus): block order is permuted with a per-epoch seed and a
  bounded local shuffle buffer decorrelates rows inside the stream —
  the standard two-level shuffle (shard-order × within-buffer) used by
  large-scale loaders; cost is O(buffer) memory, zero extra shuffles.
- :func:`training_splits` — ``streaming_split`` shards for N trainers:
  disjoint, equal, backpressured iterators that pull blocks on demand
  (the object store holds blocks once; trainers don't copy the corpus).

Determinism: same (seed, epoch) → same batch sequence, so a resumed
run can fast-forward to a step by replaying the iterator count.
"""

from __future__ import annotations

from collections.abc import Iterator


def iter_training_batches(
    ds,
    *,
    batch_size: int = 256,
    seed: int = 0,
    epochs: int = 1,
    shuffle_buffer: int = 10_000,
    batch_format: str = "pyarrow",
) -> Iterator:
    """Yield shuffled batches for ``epochs`` passes over ``ds``.

    Each epoch re-permutes block order with ``seed + epoch`` and re-draws
    the local shuffle buffer with the same seed — deterministic,
    resumable, and never materializes more than the buffer.
    """
    for epoch in range(epochs):
        epoch_ds = ds.randomize_block_order(seed=seed + epoch)
        yield from epoch_ds.iter_batches(
            batch_size=batch_size,
            batch_format=batch_format,
            local_shuffle_buffer_size=shuffle_buffer,
            local_shuffle_seed=seed + epoch,
        )


def training_splits(ds, n: int, *, equal: bool = True, locality_hints=None):
    """N disjoint streaming iterators over ``ds`` (one per trainer).

    Thin wrapper over ``Dataset.streaming_split`` so pipelines import
    one consumption surface; ``equal=True`` balances row counts (the
    last blocks are split), ``locality_hints`` takes the trainer actors
    for node-local block placement on a real cluster.
    """
    return ds.streaming_split(n, equal=equal, locality_hints=locality_hints)
