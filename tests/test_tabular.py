"""Tabular operator unit tests: seeded split parity, hash split
determinism, partial-aggregate correctness."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from article_extraction_ray.pipelines.tabular import (
    SPLIT_THRESHOLDS,
    hash_split_batch,
    seeded_split,
)


class TestSeededSplit:
    """Exact pandas-parity semantics (reference T3,
    /root/reference/tables/other/split.py:20-47)."""

    def test_ratio_slicing_and_determinism(self):
        df = pd.DataFrame({"id": range(100)})
        s1 = seeded_split(df, 0.8, 0.1, 0.1)
        s2 = seeded_split(df, 0.8, 0.1, 0.1)
        assert len(s1["train"]) == 80
        assert len(s1["test"]) == 10
        assert len(s1["dev"]) == 10
        for k in s1:
            assert s1[k]["id"].tolist() == s2[k]["id"].tolist()

    def test_remainder_goes_to_dev(self):
        df = pd.DataFrame({"id": range(7)})
        s = seeded_split(df, 0.5, 0.3, 0.2)
        # floor(7*0.5)=3 train, floor(7*0.3)=2 test, rest (2) dev
        assert (len(s["train"]), len(s["test"]), len(s["dev"])) == (3, 2, 2)

    def test_partition_not_overlap(self):
        df = pd.DataFrame({"id": range(50)})
        s = seeded_split(df, 0.6, 0.2, 0.2)
        ids = sorted(pd.concat(s.values())["id"].tolist())
        assert ids == list(range(50))

    def test_invalid_ratios(self):
        df = pd.DataFrame({"id": range(5)})
        with pytest.raises(ValueError):
            seeded_split(df, 0.5, 0.2, 0.2)
        with pytest.raises(ValueError):
            seeded_split(df, -0.1, 0.9, 0.2)

    def test_matches_reference_pandas_semantics(self):
        # the reference shuffles with df.sample(frac=1, random_state=42)
        # then slices; reproduce independently and compare
        df = pd.DataFrame({"id": range(30)})
        expected = df.sample(frac=1.0, random_state=42).reset_index(drop=True)
        s = seeded_split(df, 0.5, 0.25, 0.25)
        got = pd.concat([s["train"], s["test"], s["dev"]]).reset_index(drop=True)
        assert got["id"].tolist() == expected["id"].tolist()


class TestHashSplit:
    def test_deterministic_and_complete(self):
        batch = pa.table({"k": list(range(1000))})
        a = hash_split_batch(batch, "k")["split"].to_pylist()
        b = hash_split_batch(batch, "k")["split"].to_pylist()
        assert a == b
        assert set(a) <= {"train", "test", "dev"}

    def test_ratio_approximation(self):
        batch = pa.table({"k": list(range(20000))})
        s = pd.Series(hash_split_batch(batch, "k")["split"].to_pylist())
        frac = s.value_counts(normalize=True)
        assert abs(frac["train"] - 0.797) < 0.02  # 'cc' threshold ≈ 0.797
        assert abs(frac["test"] - 0.101) < 0.02
        assert abs(frac["dev"] - 0.102) < 0.02

    def test_batch_invariance(self):
        """Assignment depends only on the key, never on batch boundaries."""
        whole = hash_split_batch(pa.table({"k": list(range(100))}), "k")["split"].to_pylist()
        parts = (
            hash_split_batch(pa.table({"k": list(range(50))}), "k")["split"].to_pylist()
            + hash_split_batch(pa.table({"k": list(range(50, 100))}), "k")["split"].to_pylist()
        )
        assert whole == parts


def test_grouped_aggregate_partials(ray_session):
    """Partial per-batch combine must equal a direct global aggregate."""
    import ray.data as rd

    from article_extraction_ray.pipelines.tabular import grouped_aggregate

    rng = np.random.default_rng(5)
    n = 5000
    df = pd.DataFrame(
        {"g": rng.integers(0, 7, n), "x": rng.standard_normal(n), "y": rng.integers(0, 100, n)}
    )
    ds = rd.from_pandas(df).repartition(8)
    out = (
        grouped_aggregate(
            ds,
            ["g"],
            {
                "sum_x": ("sum", "x"),
                "mean_x": ("mean", "x"),
                "max_y": ("max", "y"),
                "min_y": ("min", "y"),
                "n": ("count", None),
            },
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    exp = (
        df.groupby("g")
        .agg(sum_x=("x", "sum"), mean_x=("x", "mean"), max_y=("y", "max"), min_y=("y", "min"), n=("x", "size"))
        .reset_index()
    )
    assert out["n"].tolist() == exp["n"].tolist()
    assert out["max_y"].tolist() == exp["max_y"].tolist()
    assert out["min_y"].tolist() == exp["min_y"].tolist()
    np.testing.assert_allclose(out["sum_x"], exp["sum_x"], rtol=1e-9)
    np.testing.assert_allclose(out["mean_x"], exp["mean_x"], rtol=1e-9)


def test_topk_multi_key_mixed_directions(ray_session):
    import ray.data as rd

    from article_extraction_ray.pipelines.tabular import topk

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"score": rng.integers(0, 5, 200), "id": rng.permutation(200)})
    ds = rd.from_pandas(df).repartition(8)
    out = topk(ds, ["score", "id"], k=10, descending=[True, False]).to_pandas()
    exp = df.sort_values(["score", "id"], ascending=[False, True]).head(10).reset_index(drop=True)
    pd.testing.assert_frame_equal(out.reset_index(drop=True), exp)


def test_asof_merge_tie_semantics(ray_session):
    """Duplicate (key, ts) right rows collapse to max price; equality on
    the timestamp matches (backward inclusive)."""
    import pandas as pd

    left = pd.DataFrame({"event_id": [1], "user_id": [7], "ts": pd.to_datetime(["2024-01-05"])})
    right = pd.DataFrame(
        {
            "user_id": [7, 7],
            "asof_ts": pd.to_datetime(["2024-01-05", "2024-01-05"]),
            "asof_price": [10.0, 20.0],
        }
    )
    collapsed = (
        right.groupby(["user_id", "asof_ts"], sort=False)["asof_price"].max().reset_index()
    )
    out = pd.merge_asof(
        left.sort_values("ts"),
        collapsed.sort_values("asof_ts"),
        left_on="ts",
        right_on="asof_ts",
        by="user_id",
        direction="backward",
    )
    assert out["asof_price"].tolist() == [20.0]


class TestShuffleJoin:
    def test_matches_pandas_merge(self, ray_session):
        import ray.data as rd

        from article_extraction_ray.pipelines.tabular import shuffle_join

        rng = np.random.default_rng(11)
        left = pd.DataFrame({"k": rng.integers(0, 50, 300), "lv": rng.standard_normal(300)})
        right = pd.DataFrame({"k": rng.integers(0, 50, 200), "rv": rng.integers(0, 9, 200)})
        out = (
            shuffle_join(
                rd.from_pandas(left).repartition(6),
                rd.from_pandas(right).repartition(4),
                on="k",
                num_buckets=8,
            )
            .to_pandas()
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        exp = left.merge(right, on="k").sort_values(["k", "lv", "rv"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(out[exp.columns], exp, check_like=True)

    def test_string_keys(self, ray_session):
        import ray.data as rd

        from article_extraction_ray.pipelines.tabular import shuffle_join

        left = pd.DataFrame({"k": ["a", "b", "c", "a"], "lv": [1, 2, 3, 4]})
        right = pd.DataFrame({"k": ["a", "c", "d"], "rv": [10.0, 30.0, 40.0]})
        out = (
            shuffle_join(rd.from_pandas(left), rd.from_pandas(right), on="k", num_buckets=4)
            .to_pandas()
            .sort_values(["k", "lv"])
            .reset_index(drop=True)
        )
        exp = left.merge(right, on="k").sort_values(["k", "lv"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(out[exp.columns], exp, check_like=True)

    def test_overlapping_payload_rejected(self, ray_session):
        import ray.data as rd

        from article_extraction_ray.pipelines.tabular import shuffle_join

        df = pd.DataFrame({"k": [1], "v": [2]})
        with pytest.raises(ValueError, match="disjoint"):
            shuffle_join(rd.from_pandas(df), rd.from_pandas(df), on="k")


def test_shuffle_join_hot_key(ray_session):
    """A single key holding half of both sides (worst-case skew) still
    joins correctly — it concentrates in one bucket by design; salting
    guidance lives in the operator docstring."""
    import ray.data as rd

    from article_extraction_ray.pipelines.tabular import shuffle_join

    left = pd.DataFrame({"k": [7] * 500 + list(range(500)), "lv": np.arange(1000)})
    right = pd.DataFrame({"k": [7] * 40 + [1, 2, 3], "rv": np.arange(43)})
    out = shuffle_join(
        rd.from_pandas(left).repartition(8), rd.from_pandas(right), on="k", num_buckets=8
    ).to_pandas()
    exp = left.merge(right, on="k")
    assert len(out) == len(exp) == 501 * 40 + 3  # key 7 also occurs in range(500)
    assert out.groupby("k").size().max() == exp.groupby("k").size().max()


class TestShuffleSemiFilter:
    """shuffle_semi_filter (key set as a Dataset) must equal
    broadcast_semi_filter row-for-row, both polarities, both key types."""

    def _data(self):
        rng = np.random.default_rng(3)
        return pd.DataFrame(
            {
                "doc_id": np.arange(500, dtype=np.int64),
                "val": rng.integers(0, 100, 500),
                "name": [f"d{i}" for i in range(500)],
            }
        )

    def test_int_keys_both_polarities(self, ray_session):
        import ray.data as rd

        from article_extraction_ray.pipelines.tabular import (
            broadcast_semi_filter,
            shuffle_semi_filter,
        )

        df = self._data()
        keys = np.arange(0, 500, 3, dtype=np.int64)  # every 3rd id
        ds = rd.from_pandas(df).repartition(5)
        kds = rd.from_pandas(pd.DataFrame({"doc_id": keys})).repartition(3)
        for anti in (False, True):
            want = (
                broadcast_semi_filter(ds, keys, "doc_id", anti=anti)
                .to_pandas().sort_values("doc_id").reset_index(drop=True)
            )
            got = (
                shuffle_semi_filter(ds, kds, "doc_id", anti=anti)
                .to_pandas().sort_values("doc_id").reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(got[want.columns], want)
            # payload dtypes survive exactly (Arrow groups, no widening)
            assert got["doc_id"].dtype == np.int64 and got["val"].dtype == np.int64

    def test_string_keys(self, ray_session):
        import ray.data as rd

        from article_extraction_ray.pipelines.tabular import (
            broadcast_semi_filter,
            shuffle_semi_filter,
        )

        df = self._data()
        names = [f"d{i}" for i in range(0, 500, 7)]
        ds = rd.from_pandas(df).repartition(4)
        kds = rd.from_pandas(pd.DataFrame({"name": names}))
        want = (
            broadcast_semi_filter(ds, names, "name", anti=True)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        got = (
            shuffle_semi_filter(ds, kds, "name", anti=True)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[want.columns], want)

    def test_near_dedup_fallback_identical_counts(self, ray_session):
        """The adversarial-dup-rate ask from the round-2 verdict: with
        loser_budget=0 every loser takes the bucketed anti-join path and
        the survivor counts must match the broadcast path exactly."""
        from article_extraction_ray.pipelines.queries import _near_dedup_counts

        sf = "/root/testdata/sf0.001"
        broad = (
            _near_dedup_counts(sf)  # default budget → broadcast
            .to_pandas().sort_values("origin").reset_index(drop=True)
        )
        bucketed = (
            _near_dedup_counts(sf, loser_budget=0)  # force shuffle path
            .to_pandas().sort_values("origin").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(broad, bucketed)
        # the self-checking property holds on BOTH paths
        assert "mutant" not in set(bucketed["origin"])


def test_grouped_aggregate_null_string_key(ray_session):
    """Null keys must form their own group (SQL GROUP BY semantics) and
    bucket stably across blocks in the open-domain fold path."""
    import ray.data as rd

    from article_extraction_ray.pipelines.tabular import grouped_aggregate

    df = pd.DataFrame(
        {"g": ["a", None, "b", None, "a", "b", None] * 40, "x": list(range(280))}
    )
    out = (
        grouped_aggregate(rd.from_pandas(df).repartition(6), ["g"], {"s": ("sum", "x")})
        .to_pandas()
    )
    exp = df.groupby("g", dropna=False)["x"].sum()
    assert len(out) == 3
    got = {(None if pd.isna(k) else k): v for k, v in zip(out["g"], out["s"])}
    assert got == {(None if pd.isna(k) else k): v for k, v in exp.items()}


def test_read_table_split_rightsizes_blocks(ray_session, tmp_path):
    """split=True must scale block count to the table: >=8k rows per
    block with a floor of 8, capped at 2x cluster CPUs."""
    import pyarrow.parquet as pq

    from article_extraction_ray.pipelines.tabular import read_table

    small = pa.table({"k": np.arange(1000, dtype=np.int64)})
    pq.write_table(small, tmp_path / "tiny.parquet")
    ds = read_table(str(tmp_path), "tiny", split=True)
    assert ds.materialize().num_blocks() == 8  # floor

    big = pa.table({"k": np.arange(200_000, dtype=np.int64)})
    pq.write_table(big, tmp_path / "wide.parquet")
    ds = read_table(str(tmp_path), "wide", split=True)
    import ray as _ray

    cap = int(_ray.cluster_resources().get("CPU", 8)) * 2
    assert ds.materialize().num_blocks() == min(cap, 200_000 // 8192)
