"""Unit-level equivalences for query scale-path routers."""

from __future__ import annotations

import pandas as pd


def test_bigram_sharded_matches_broadcast(ray_session):
    """Forcing the sharded (co-partitioned join) path produces the same
    per-doc scores as the broadcast path."""
    from article_extraction_ray.pipelines.queries import q_bigram_lm_score

    sf = "/root/testdata/sf0.001"
    bc = q_bigram_lm_score(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    sh = (
        q_bigram_lm_score(sf, broadcast_budget_rows=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(bc, sh[bc.columns], check_dtype=False)


class TestFuzzyNameMatcher:
    def test_matches_brute_force_reference(self):
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from article_extraction_ray.functions.strings import jaro_winkler_similarity
        from article_extraction_ray.pipelines.queries import (
            _FUZZY_JOIN_THRESHOLD,
            _FuzzyNameMatcher,
        )
        from article_extraction_ray.state.broadcast import Broadcast

        rng = np.random.default_rng(13)
        vocab = ["small ring", "small rings", "smell ring", "red bolt", "red bolts",
                 "blue cap", "blue cup", "green rod"]
        names = rng.choice(vocab, 60)
        keys = np.arange(60)
        queries = [(0, str(names[0])), (7, str(names[7])), (11, str(names[11]))]

        batch = pa.table({"p_partkey": pa.array(keys, type=pa.int64()),
                          "p_name": pa.array([str(n) for n in names])})
        got = _FuzzyNameMatcher(Broadcast(queries))(batch)
        got = got.sort_values(["query_key", "match_key"]).reset_index(drop=True)

        rows = []
        for qk, qn in queries:
            for k, n in zip(keys, names):
                n = str(n)
                if k != qk and n[:1] == qn[:1]:
                    s = jaro_winkler_similarity(qn, n)
                    if s >= _FUZZY_JOIN_THRESHOLD:
                        rows.append((qk, int(k), round(s, 6)))
        want = (
            pd.DataFrame(rows, columns=["query_key", "match_key", "sim"])
            .sort_values(["query_key", "match_key"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.astype({"query_key": "int64", "match_key": "int64"}), want
        )


class TestFunnelHeterogeneousBatches:
    def test_stage_absent_from_batch(self, ray_session, tmp_path):
        # events sorted by event_type → blocks that lack whole stages;
        # the per-batch partial must still emit timestamp[us] columns
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from article_extraction_ray.pipelines.queries import q_funnel_users

        rng = np.random.default_rng(3)
        n = 600
        df = pd.DataFrame(
            {
                "event_id": np.arange(n),
                "user_id": rng.integers(0, 40, n),
                "event_type": rng.choice(["view", "click", "purchase", "error"], n),
                "ts": pd.to_datetime("2024-01-01")
                + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
            }
        ).sort_values("event_type", kind="stable")
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False).set_column(
                3, "ts", pa.Table.from_pandas(df, preserve_index=False)["ts"].cast(pa.timestamp("us"))
            ),
            tmp_path / "events.parquet",
        )
        got = (
            q_funnel_users(str(tmp_path))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )

        m = df.pivot_table(index="user_id", columns="event_type", values="ts", aggfunc="min")
        m = m.reindex(columns=["view", "click", "purchase"])
        want = m[(m["view"] < m["click"]) & (m["click"] < m["purchase"])]
        assert got["user_id"].tolist() == sorted(want.index.tolist())
        gv = got.set_index("user_id")["t_view"]
        for uid in want.index:
            assert pd.Timestamp(gv.loc[uid]) == want.loc[uid, "view"]


class TestValidateOrdersPlanted:
    def test_rules_fire_on_planted_violations(self, ray_session, tmp_path):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from article_extraction_ray.pipelines.queries import q_validate_orders

        orders = pd.DataFrame(
            {
                "o_orderkey": [1, 2, 2, 3, 4],          # one duplicated key (2 extra rows -> 1 dup key)
                "o_custkey": [10, 10, 11, 99, 10],      # 99 dangles
                "o_totalprice": [5.0, -1.0, 3.0, -2.5, 7.0],  # two negative
                "o_orderdate": pd.to_datetime(
                    ["2024-01-01", "2024-01-02", None, "2024-01-04", "2024-01-05"]
                ),
            }
        )
        customer = pd.DataFrame({"c_custkey": [10, 11]})
        t = pa.Table.from_pandas(orders, preserve_index=False)
        t = t.set_column(3, "o_orderdate", t["o_orderdate"].cast(pa.timestamp("us")))
        pq.write_table(t, tmp_path / "orders.parquet")
        pq.write_table(pa.Table.from_pandas(customer, preserve_index=False), tmp_path / "customer.parquet")

        got = (
            q_validate_orders(str(tmp_path))
            .to_pandas()
            .set_index("rule")["n_violations"]
            .to_dict()
        )
        assert got == {
            "negative_price": 2,
            "null_orderdate": 1,
            "dangling_custkey": 1,
            "duplicate_orderkey": 1,
        }


class TestEwmaParity:
    def test_matches_single_process_pandas(self, ray_session, tmp_path):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from article_extraction_ray.pipelines.queries import _EWMA_ALPHA, q_ewma

        rng = np.random.default_rng(6)
        n = 2_000
        df = pd.DataFrame(
            {
                "event_id": np.arange(n),
                "user_id": rng.integers(0, 60, n),
                "ts": pd.to_datetime("2024-01-01")
                + pd.to_timedelta(rng.choice(10**6, n, replace=False), unit="s"),
                "value": np.round(rng.uniform(0, 100, n), 2),
            }
        )
        t = pa.Table.from_pandas(df, preserve_index=False)
        t = t.set_column(2, "ts", t["ts"].cast(pa.timestamp("us")))
        pq.write_table(t, tmp_path / "events.parquet")

        got = (
            q_ewma(str(tmp_path))
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        want = df.sort_values(["user_id", "ts", "event_id"], kind="stable").copy()
        want["ewma"] = (
            want.groupby("user_id", sort=False)["value"]
            .transform(lambda s: s.ewm(alpha=_EWMA_ALPHA, adjust=False).mean())
            .round(6)
        )
        want = want.sort_values("event_id").reset_index(drop=True)
        pd.testing.assert_series_equal(got["ewma"], want["ewma"])
