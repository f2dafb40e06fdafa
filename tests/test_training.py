"""Training consumption: deterministic epochs, full coverage, shards."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def ds(ray_session):
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame({"x": np.arange(5_000), "y": np.arange(5_000) % 7})
    ).repartition(16)


def _epoch_order(ds, seed, epoch_count=1):
    from article_extraction_ray.pipelines.training import iter_training_batches

    orders = []
    cur: list[int] = []
    n_total = 0
    for batch in iter_training_batches(
        ds, batch_size=128, seed=seed, epochs=epoch_count, shuffle_buffer=1_000
    ):
        xs = batch["x"].to_pylist()
        cur.extend(xs)
        n_total += len(xs)
        if len(cur) >= 5_000:
            orders.append(cur[:5_000])
            cur = cur[5_000:]
    return orders, n_total


def test_each_epoch_covers_every_row_once(ds):
    orders, n_total = _epoch_order(ds, seed=3, epoch_count=2)
    assert n_total == 10_000
    for epoch_rows in orders:
        assert sorted(epoch_rows) == list(range(5_000))


def test_deterministic_given_seed(ds):
    a, _ = _epoch_order(ds, seed=11)
    b, _ = _epoch_order(ds, seed=11)
    assert a == b


def test_epochs_and_seeds_differ(ds):
    a, _ = _epoch_order(ds, seed=1)
    b, _ = _epoch_order(ds, seed=2)
    assert a != b  # astronomically unlikely to collide
    two, _ = _epoch_order(ds, seed=5, epoch_count=2)
    assert two[0] != two[1]


def test_order_is_actually_shuffled(ds):
    orders, _ = _epoch_order(ds, seed=7)
    assert orders[0] != list(range(5_000))


def test_streaming_splits_disjoint_and_complete(ds):
    from article_extraction_ray.pipelines.training import training_splits

    import threading

    its = training_splits(ds, 2, equal=True)
    seen: list[list[int]] = [[], []]

    # streaming_split iterators must be consumed concurrently (they
    # coordinate through a barrier) — one thread per trainer, as in
    # real use
    def consume(i):
        for batch in its[i].iter_batches(batch_size=512, batch_format="pyarrow"):
            seen[i].extend(batch["x"].to_pylist())

    threads = [threading.Thread(target=consume, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not (set(seen[0]) & set(seen[1]))
    assert sorted(seen[0] + seen[1]) == list(range(5_000))
    assert abs(len(seen[0]) - len(seen[1])) <= 1  # equal=True balance
