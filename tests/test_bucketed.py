"""Hash-bucketed layout: write determinism, spec verification, aligned join."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def tmp_base(tmp_path):
    return str(tmp_path)


def _ds(df, parts=4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parts)


def _frames(seed=3):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({"k": np.arange(500, dtype=np.int64), "a": rng.normal(size=500)})
    right = pd.DataFrame(
        {"k": rng.integers(0, 500, 1500).astype(np.int64), "b": rng.integers(0, 9, 1500)}
    )
    return left, right


class TestBucketedLayout:
    def test_roundtrip_and_join_matches_pandas(self, ray_session, tmp_base):
        from article_extraction_ray.sources.bucketed import bucketed_join, write_bucketed

        left, right = _frames()
        s1 = write_bucketed(_ds(left), f"{tmp_base}/l", "k", 8)
        s2 = write_bucketed(_ds(right, 7), f"{tmp_base}/r", "k", 8)
        assert s1["rows"] == 500 and s2["rows"] == 1500
        out = (
            bucketed_join(f"{tmp_base}/l", f"{tmp_base}/r", "k")
            .to_pandas()
            .sort_values(["k", "b"])
            .reset_index(drop=True)
        )
        expect = (
            left.merge(right, on="k").sort_values(["k", "b"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            out[["k", "a", "b"]], expect[["k", "a", "b"]], check_like=True
        )

    def test_layout_independent_of_blocks(self, ray_session, tmp_base):
        import pyarrow.parquet as pq

        from article_extraction_ray.sources.bucketed import write_bucketed

        left, _ = _frames()
        write_bucketed(_ds(left, 2), f"{tmp_base}/x", "k", 4)
        write_bucketed(_ds(left.sample(frac=1, random_state=1), 9), f"{tmp_base}/y", "k", 4)
        for b in range(4):
            tx = pq.read_table(f"{tmp_base}/x/bucket={b}/part-0.parquet").to_pandas()
            ty = pq.read_table(f"{tmp_base}/y/bucket={b}/part-0.parquet").to_pandas()
            pd.testing.assert_frame_equal(tx, ty)

    def test_misaligned_specs_raise(self, ray_session, tmp_base):
        from article_extraction_ray.sources.bucketed import bucketed_join, write_bucketed

        left, right = _frames()
        write_bucketed(_ds(left), f"{tmp_base}/l", "k", 8)
        write_bucketed(_ds(right), f"{tmp_base}/r", "k", 16)
        with pytest.raises(ValueError, match="not aligned"):
            bucketed_join(f"{tmp_base}/l", f"{tmp_base}/r", "k")

    def test_missing_bucket_inner_skips(self, ray_session, tmp_base):
        from article_extraction_ray.sources.bucketed import (
            bucket_of,
            bucketed_join,
            write_bucketed,
        )

        left, right = _frames()
        # restrict the right side to keys hashing into bucket 0 only
        mask = bucket_of(right["k"].to_numpy(), 8) == 0
        write_bucketed(_ds(left), f"{tmp_base}/l", "k", 8)
        write_bucketed(_ds(right[mask]), f"{tmp_base}/r", "k", 8)
        out = bucketed_join(f"{tmp_base}/l", f"{tmp_base}/r", "k").to_pandas()
        expect = left.merge(right[mask], on="k")
        assert len(out) == len(expect)
