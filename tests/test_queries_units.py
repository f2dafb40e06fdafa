"""Unit-level equivalences for query scale-path routers."""

from __future__ import annotations

import numpy as np
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


class TestParetoSkylineProperties:
    """Dominance-law properties of q_pareto_orders, checked against the
    raw table with an O(n²) brute force (1500 rows at sf0.001)."""

    @staticmethod
    def _dominates(b, a):
        # b dominates a: earlier-or-equal date with >= price, strict in one dim
        return (b[0] < a[0] and b[1] >= a[1]) or (b[0] <= a[0] and b[1] > a[1])

    def test_skyline_is_exactly_the_nondominated_set(self, ray_session):
        import pyarrow.parquet as pq

        from article_extraction_ray.pipelines.queries import q_pareto_orders

        sf = "/root/testdata/sf0.001"
        got = q_pareto_orders(sf).to_pandas()
        kept = set(got["o_orderkey"])

        t = pq.read_table(sf + "/orders.parquet",
                          columns=["o_orderkey", "o_orderdate", "o_totalprice"]).to_pandas()
        pts = list(zip(t["o_orderdate"], t["o_totalprice"], t["o_orderkey"]))
        for d, p, k in pts:
            dominated = any(self._dominates((d2, p2), (d, p))
                            for d2, p2, k2 in pts if k2 != k)
            assert (k in kept) == (not dominated), f"orderkey {k}"


class TestBfsInvariants:
    """Level-synchronous BFS output must satisfy the relaxation laws on
    the underlying undirected edge set."""

    def test_hop_labels_are_shortest_within_cap(self, ray_session):
        import duckdb

        from article_extraction_ray.pipelines.queries import _BFS_MAX_HOPS, _BFS_SOURCE, q_bfs_hops

        sf = "/root/testdata/sf0.001"
        got = q_bfs_hops(sf)
        hop = dict(zip(got["node"], got["hop"]))
        assert hop[_BFS_SOURCE] == 0
        assert got["hop"].max() <= _BFS_MAX_HOPS

        con = duckdb.connect()
        e = con.execute(f"""
            SELECT DISTINCT 2*o.o_custkey AS src, 2*l.l_suppkey+1 AS dst
            FROM read_parquet('{sf}/orders.parquet') o
            JOIN read_parquet('{sf}/lineitem.parquet') l ON l.l_orderkey=o.o_orderkey
        """).df()
        edges = list(zip(e["src"], e["dst"])) + list(zip(e["dst"], e["src"]))
        # triangle inequality on every edge with both endpoints labeled
        for u, v in edges:
            if u in hop and v in hop:
                assert hop[v] <= hop[u] + 1
        # every level-k node (k>0) has a level-(k-1) witness neighbor
        nbrs = {}
        for u, v in edges:
            nbrs.setdefault(v, set()).add(u)
        for n, h in hop.items():
            if h > 0:
                assert any(hop.get(w) == h - 1 for w in nbrs.get(n, ())), n


class TestAucBruteForce:
    def test_matches_pairwise_definition(self, ray_session):
        import numpy as np
        import pyarrow.parquet as pq

        from article_extraction_ray.pipelines.queries import _AUC_POS_TYPE, q_auc_score

        sf = "/root/testdata/sf0.001"
        got = float(q_auc_score(sf)["auc"].iloc[0])

        t = pq.read_table(sf + "/events.parquet", columns=["event_type", "value"]).to_pandas()
        s = np.round(t["value"].to_numpy() * 100).astype(np.int64)
        y = (t["event_type"] == _AUC_POS_TYPE).to_numpy()
        pos, neg = s[y], s[~y]
        wins = (pos[:, None] > neg[None, :]).sum()
        ties = (pos[:, None] == neg[None, :]).sum()
        want = (wins + 0.5 * ties) / (len(pos) * len(neg))
        assert abs(got - want) < 1e-6


class TestGiniBruteForce:
    def test_matches_mean_absolute_difference_form(self, ray_session):
        import duckdb
        import numpy as np

        from article_extraction_ray.pipelines.queries import q_gini_revenue

        sf = "/root/testdata/sf0.001"
        got = q_gini_revenue(sf).to_pandas().set_index("c_nationkey")["gini"]

        con = duckdb.connect()
        r = con.execute(f"""
            SELECT c.c_nationkey AS nk, o.o_custkey,
                   sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS rev
            FROM read_parquet('{sf}/orders.parquet') o
            JOIN read_parquet('{sf}/customer.parquet') c ON c.c_custkey=o.o_custkey
            GROUP BY 1, 2
        """).df()
        for nk, g in r.groupby("nk"):
            x = g["rev"].to_numpy(dtype=np.float64)
            mad = np.abs(x[:, None] - x[None, :]).mean()
            want = mad / (2.0 * x.mean())
            assert abs(float(got.loc[nk]) - want) < 1e-6, nk


class TestAttributionLaws:
    def test_attribution_is_the_latest_eligible_touch(self, ray_session):
        import numpy as np
        import pyarrow.parquet as pq

        from article_extraction_ray.pipelines.queries import (
            _ATTR_WINDOW_US,
            q_attribution_last_touch,
        )

        sf = "/root/testdata/sf0.001"
        got = q_attribution_last_touch(sf).to_pandas()

        t = pq.read_table(sf + "/events.parquet").to_pandas()
        t["us"] = t["ts"].astype("datetime64[us]").astype(np.int64)
        by_id = t.set_index("event_id")
        by_user = dict(tuple(t.groupby("user_id")))

        attributed = dict(zip(got["purchase_id"], got["touch_id"]))
        purchases = t[t["event_type"] == "purchase"]
        for _, p in purchases.iterrows():
            cands = by_user[p["user_id"]]
            m = cands[(cands["event_type"] != "purchase")
                      & (cands["us"] < p["us"])
                      & (cands["us"] >= p["us"] - _ATTR_WINDOW_US)]
            if len(m) == 0:
                assert p["event_id"] not in attributed
            else:
                best = m.sort_values(["us", "event_id"]).iloc[-1]
                assert attributed[p["event_id"]] == best["event_id"]
                tid = attributed[p["event_id"]]
                assert by_id.loc[tid, "event_type"] != "purchase"


class TestMmrGreedyInvariant:
    """Each selected item must maximize the MMR objective over the
    remaining pool at its step (brute-force re-evaluation)."""

    def test_selection_is_greedy_optimal(self, ray_session):
        import numpy as np
        import pyarrow.parquet as pq

        from article_extraction_ray.pipelines.queries import (
            _MMR_LAMBDA,
            _MMR_POOL,
            q_mmr_select,
        )

        sf = "/root/testdata/sf0.001"
        got = q_mmr_select(sf)
        sel = got.sort_values("rank")["vec_id"].tolist()

        t = pq.read_table(sf + "/embeddings.parquet", columns=["vec_id", "embedding"]).to_pandas()
        mat = np.array([np.asarray(e) for e in t["embedding"]], dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        idx = {int(v): i for i, v in enumerate(t["vec_id"])}
        q = mat[idx[0]]
        rel = mat @ q
        pool = sorted(
            (i for i in range(len(mat)) if int(t["vec_id"][i]) != 0),
            key=lambda i: (-rel[i], t["vec_id"][i]),
        )[:_MMR_POOL]
        pool_ids = [int(t["vec_id"][i]) for i in pool]

        chosen = []
        for step, picked in enumerate(sel):
            best_score = -np.inf
            for cand in pool_ids:
                if cand in chosen:
                    continue
                r = rel[idx[cand]]
                sim = max((float(mat[idx[cand]] @ mat[idx[s]]) for s in chosen), default=0.0)
                score = _MMR_LAMBDA * r - (1.0 - _MMR_LAMBDA) * sim
                if score > best_score + 1e-12:
                    best_score = score
            r = rel[idx[picked]]
            sim = max((float(mat[idx[picked]] @ mat[idx[s]]) for s in chosen), default=0.0)
            picked_score = _MMR_LAMBDA * r - (1.0 - _MMR_LAMBDA) * sim
            assert picked_score >= best_score - 1e-9, f"step {step}"
            chosen.append(picked)


class TestHourlyAnomalyDegenerateGroups:
    """ADVICE r3: zero-variance and n==1 (type, hour) groups must flag
    ZERO anomalies on BOTH sides — numpy NaN comparisons are False
    while DuckDB orders NaN above all numbers, so an unguarded NaN
    z-score silently diverges the two implementations."""

    def test_matches_oracle_with_planted_degenerates(self, ray_session, tmp_path):
        import duckdb
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from article_extraction_ray.pipelines.queries import (
            SQL_HOURLY_ANOMALY,
            q_hourly_anomaly,
        )

        rng = np.random.default_rng(11)
        base = pd.Timestamp("2024-03-01")  # 00:00 → hour buckets well-defined
        rows = []
        # normal group: (view, hour 0), spread values incl. outliers
        for i in range(200):
            rows.append(("view", base + pd.Timedelta(seconds=int(rng.integers(0, 3600))),
                         float(rng.normal(50, 5))))
        rows.append(("view", base + pd.Timedelta(seconds=10), 500.0))  # clear outlier
        # zero-variance group: (click, hour 1) — all values identical
        for i in range(50):
            rows.append(("click", base + pd.Timedelta(hours=1, seconds=i), 7.0))
        # n==1 group: (purchase, hour 2)
        rows.append(("purchase", base + pd.Timedelta(hours=2), 9.0))
        df = pd.DataFrame(rows, columns=["event_type", "ts", "value"])
        t = pa.Table.from_pandas(df, preserve_index=False)
        t = t.set_column(1, "ts", t["ts"].cast(pa.timestamp("us")))
        pq.write_table(t, tmp_path / "events.parquet")

        got = (
            q_hourly_anomaly(str(tmp_path))
            .to_pandas()
            .sort_values(["event_type", "hour"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
        )
        want = (
            con.execute(SQL_HOURLY_ANOMALY)
            .df()
            .sort_values(["event_type", "hour"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        g = got.set_index(["event_type", "hour"])["n_anomalies"]
        assert g.loc[("click", 1)] == 0     # zero variance → never flagged
        assert g.loc[("purchase", 2)] == 0  # n == 1 → never flagged
        assert g.loc[("view", 0)] >= 1      # the planted outlier still fires


class TestScaleRouteParity:
    """Every documented at-scale swap must be RUNNING code: forcing the
    budget to 0 routes the same query through the web-scale path
    (co-partitioned semi-join / bucketed hash join) and the result must
    be identical to the default broadcast route."""

    SF = "/root/testdata/sf0.001"

    @staticmethod
    def _canon(r, keys):
        df = r.to_pandas() if not isinstance(r, pd.DataFrame) else r
        return df.sort_values(keys).reset_index(drop=True)[sorted(df.columns)]

    def test_clustering_coeff_semi_join_route(self, ray_session):
        from article_extraction_ray.pipelines.queries import _clustering_coeff

        a = self._canon(_clustering_coeff(self.SF), ["part"])
        b = self._canon(_clustering_coeff(self.SF, edge_budget=0), ["part"])
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_bfs_semi_join_sweep(self, ray_session):
        from article_extraction_ray.pipelines.queries import _bfs_hops

        a = self._canon(_bfs_hops(self.SF), ["node"])
        b = self._canon(_bfs_hops(self.SF, frontier_budget=0), ["node"])
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_tfidf_bucketed_join_route(self, ray_session):
        from article_extraction_ray.pipelines.queries import _tfidf_top_terms

        a = self._canon(_tfidf_top_terms(self.SF), ["doc_id", "token"])
        b = self._canon(_tfidf_top_terms(self.SF, vocab_budget=0), ["doc_id", "token"])
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_bigram_pmi_hash_join_route(self, ray_session):
        from article_extraction_ray.pipelines.queries import _bigram_pmi

        a = self._canon(_bigram_pmi(self.SF), ["w1", "w2"])
        b = self._canon(_bigram_pmi(self.SF, vocab_budget=0), ["w1", "w2"])
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_share_of_total_bucketed_join_route(self, ray_session):
        from article_extraction_ray.pipelines.queries import _share_of_total

        a = self._canon(_share_of_total(self.SF), ["event_id"])
        b = self._canon(_share_of_total(self.SF, key_budget=0), ["event_id"])
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_late_events_bucketed_join_route(self, ray_session):
        from article_extraction_ray.pipelines.queries import _late_events

        a = self._canon(_late_events(self.SF), ["event_id"])
        b = self._canon(_late_events(self.SF, key_budget=0), ["event_id"])
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_rolling_distinct_hll_route_error_bound(self, ray_session):
        import numpy as np

        from article_extraction_ray.pipelines.queries import _rolling_distinct_users

        exact = _rolling_distinct_users(self.SF)
        approx = _rolling_distinct_users(self.SF, exact_window_budget=0)
        assert list(exact["tick"]) == list(approx["tick"])
        m = exact.merge(approx, on="tick", suffixes=("_e", "_a"))
        rel = np.abs(m["active_users_a"] - m["active_users_e"]) / np.maximum(
            m["active_users_e"], 1
        )
        assert float(rel.max()) <= 0.02  # HLL p=14 ≈ 0.8% std error

    def test_rfm_tdigest_route_rank_bound(self, ray_session):
        import numpy as np

        from article_extraction_ray.pipelines.queries import _rfm_segments

        exact = _rfm_segments(self.SF).to_pandas()
        approx = _rfm_segments(self.SF, hist_domain_budget=0).to_pandas()
        assert len(exact) == len(approx)
        m = exact.merge(approx, on="c_custkey", suffixes=("_e", "_a"))
        # the t-digest's ≤1% rank error can only flip customers sitting
        # within that rank band of a quintile boundary; bound the flip
        # rate per score dimension
        for s in ("r_score", "f_score", "m_score"):
            flips = float((m[f"{s}_e"] != m[f"{s}_a"]).mean())
            assert flips <= 0.05, (s, flips)

    def test_pareto_bucketed_rank_route(self, ray_session):
        from article_extraction_ray.pipelines.queries import _pareto_8020

        a = _pareto_8020(self.SF).reset_index(drop=True)
        b = _pareto_8020(self.SF, drain_budget=0).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


class TestDegenerateGroupParity:
    """DuckDB emits NULL for float division by zero while numpy emits
    ±inf — NaN ≡ NULL to the driver's comparer, inf is not.  Every
    stat query with a variance/denominator must therefore guard
    degenerate groups (n==1, zero variance, MAD==0) to NaN.  These
    plant the degenerates and compare both engines directly."""

    @staticmethod
    def _cmp(got, con, sql, sort_keys):
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        want = con.execute(sql).df()
        a = got[sorted(got.columns)].sort_values(sort_keys).reset_index(drop=True)
        b = want[sorted(want.columns)].sort_values(sort_keys).reset_index(drop=True)
        assert len(a) == len(b)
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                av, bv = av.astype(float), bv.astype(float)
                ok = ((av.isna() & bv.isna()) | ((av - bv).abs() <= 1e-9 + 1e-9 * bv.abs())).all()
            else:
                ok = av.astype(object).where(~av.isna(), None).equals(
                    bv.astype(object).where(~bv.isna(), None))
            assert ok, (c, a[c].head(), b[c].head())

    def test_zscore_zero_variance_and_singleton_groups(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from article_extraction_ray.pipelines.queries import SQL_ZSCORE, q_zscore_normalize

        rng = np.random.default_rng(7)
        orders = pd.DataFrame(
            {
                "o_orderkey": np.arange(60, dtype=np.int64),
                "o_orderpriority": (["1-URGENT"] * 40) + (["2-HIGH"] * 19) + ["3-SOLO"],
                "o_totalprice": np.concatenate(
                    [rng.uniform(10, 500, 40).round(2), np.full(19, 77.77), [12.34]]
                ),
            }
        )
        pq.write_table(pa.Table.from_pandas(orders, preserve_index=False), tmp_path / "orders.parquet")
        con = duckdb.connect()
        con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{tmp_path}/orders.parquet')")
        self._cmp(q_zscore_normalize(str(tmp_path)), con, SQL_ZSCORE, ["o_orderkey"])

    def test_ab_ttest_zero_variance_metric(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from article_extraction_ray.pipelines.queries import SQL_AB_TTEST, q_ab_ttest

        rng = np.random.default_rng(8)
        n = 400
        events = pd.DataFrame(
            {
                "user_id": np.arange(n, dtype=np.int64),
                "event_type": np.where(np.arange(n) % 2 == 0, "flat", "varied"),
                "value": np.where(
                    np.arange(n) % 2 == 0, 5.0, rng.uniform(1, 9, n).round(2)
                ),
            }
        )
        pq.write_table(pa.Table.from_pandas(events, preserve_index=False), tmp_path / "events.parquet")
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')")
        got = q_ab_ttest(str(tmp_path))
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        assert got.loc[got["event_type"] == "flat", "t_stat"].isna().all()
        self._cmp(got, con, SQL_AB_TTEST, ["event_type"])

    def test_regression_and_corr_constant_columns(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from article_extraction_ray.pipelines.queries import (
            SQL_CORR_MATRIX,
            SQL_GROUPED_REGRESSION,
            q_corr_matrix,
            q_grouped_regression,
        )

        rng = np.random.default_rng(9)
        n = 300
        lineitem = pd.DataFrame(
            {
                "l_returnflag": (["A"] * 150) + (["C"] * 149) + ["S"],  # S = singleton
                "l_quantity": np.concatenate(
                    [np.full(150, 4.0), rng.integers(1, 50, 149).astype(float), [7.0]]
                ),  # group A: constant x
                "l_extendedprice": rng.uniform(100, 9000, n).round(2),
                "l_discount": np.full(n, 0.05),  # constant everywhere
            }
        )
        pq.write_table(pa.Table.from_pandas(lineitem, preserve_index=False), tmp_path / "lineitem.parquet")
        con = duckdb.connect()
        con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{tmp_path}/lineitem.parquet')")
        self._cmp(q_grouped_regression(str(tmp_path)), con, SQL_GROUPED_REGRESSION, ["l_returnflag"])
        self._cmp(q_corr_matrix(str(tmp_path)), con, SQL_CORR_MATRIX, ["col_x", "col_y"])

    def test_fk_audit_anti_join_route(self, ray_session):
        from article_extraction_ray.pipelines.queries import _fk_audit

        sf = "/root/testdata/sf0.001"
        a = _fk_audit(sf).reset_index(drop=True)
        b = _fk_audit(sf, dim_budget=0).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_validate_orders_anti_join_route(self, ray_session):
        from article_extraction_ray.pipelines.queries import _validate_orders

        sf = "/root/testdata/sf0.001"
        def canon(r):
            df = r.to_pandas() if not isinstance(r, pd.DataFrame) else r
            return df.sort_values("rule").reset_index(drop=True)
        a = canon(_validate_orders(sf))
        b = canon(_validate_orders(sf, dim_budget=0))
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


class TestRouterParityRandomTables:
    """Route parity on randomized tiny tables (three seeds each):
    adversarial shapes — singleton groups, empty joins sides, skewed
    keys — that the fixed sf0.001 data can't produce."""

    @staticmethod
    def _write(tmp_path, name, df, ts_cols=()):
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pa.Table.from_pandas(df, preserve_index=False)
        for c in ts_cols:
            t = t.set_column(
                t.column_names.index(c), c, t[c].cast(pa.timestamp("us"))
            )
        pq.write_table(t, tmp_path / f"{name}.parquet")

    def test_share_of_total_routes_on_random_events(self, ray_session, tmp_path):
        from article_extraction_ray.pipelines.queries import _share_of_total

        for seed in (1, 2, 3):
            rng = np.random.default_rng(seed)
            n = int(rng.integers(5, 400))
            d = tmp_path / f"s{seed}"
            d.mkdir()
            types = rng.choice(["a", "b", "c", "solo"], n)
            types[0] = "solo"  # guarantee a possibly-singleton group
            self._write(
                d, "events",
                pd.DataFrame({
                    "event_id": np.arange(n, dtype=np.int64),
                    "event_type": types,
                    "value": np.round(rng.uniform(0.01, 99.99, n), 2),
                }),
            )
            a = _share_of_total(str(d)).to_pandas().sort_values("event_id").reset_index(drop=True)
            b = _share_of_total(str(d), key_budget=0).to_pandas().sort_values("event_id").reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)

    def test_late_events_routes_on_random_events(self, ray_session, tmp_path):
        from article_extraction_ray.pipelines.queries import _late_events

        for seed in (4, 5, 6):
            rng = np.random.default_rng(seed)
            n = int(rng.integers(5, 400))
            d = tmp_path / f"s{seed}"
            d.mkdir()
            self._write(
                d, "events",
                pd.DataFrame({
                    "event_id": np.arange(n, dtype=np.int64),
                    "user_id": rng.integers(0, max(2, n // 10), n),
                    "ts": pd.to_datetime("2024-01-01")
                    + pd.to_timedelta(rng.integers(0, 10**5, n), unit="s"),
                }),
                ts_cols=("ts",),
            )
            a = _late_events(str(d)).to_pandas().sort_values("event_id").reset_index(drop=True)
            b = _late_events(str(d), key_budget=0).to_pandas().sort_values("event_id").reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)

    def test_clustering_coeff_routes_on_random_baskets(self, ray_session, tmp_path):
        from article_extraction_ray.pipelines.queries import _clustering_coeff

        for seed in (7, 8):
            rng = np.random.default_rng(seed)
            n = int(rng.integers(30, 500))
            d = tmp_path / f"s{seed}"
            d.mkdir()
            self._write(
                d, "lineitem",
                pd.DataFrame({
                    "l_orderkey": rng.integers(0, max(3, n // 4), n).astype(np.int64),
                    "l_partkey": rng.integers(0, 30, n).astype(np.int64),  # dense → triangles
                }),
            )
            a = _clustering_coeff(str(d)).reset_index(drop=True)
            b = _clustering_coeff(str(d), edge_budget=0).reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_fk_audit_routes_on_random_tables(self, ray_session, tmp_path):
        from article_extraction_ray.pipelines.queries import _fk_audit

        for seed in (9, 10):
            rng = np.random.default_rng(seed)
            d = tmp_path / f"s{seed}"
            d.mkdir()
            no, nl = int(rng.integers(5, 200)), int(rng.integers(5, 300))
            self._write(d, "customer", pd.DataFrame({"c_custkey": np.arange(20, dtype=np.int64)}))
            self._write(d, "nation", pd.DataFrame({"n_nationkey": np.arange(5, dtype=np.int64)}))
            self._write(d, "part", pd.DataFrame({"p_partkey": np.arange(30, dtype=np.int64)}))
            self._write(
                d, "orders",
                pd.DataFrame({
                    "o_orderkey": np.arange(no, dtype=np.int64),
                    "o_custkey": rng.integers(0, 28, no).astype(np.int64),  # some dangle
                }),
            )
            self._write(
                d, "lineitem",
                pd.DataFrame({
                    "l_orderkey": rng.integers(0, no + 10, nl).astype(np.int64),
                    "l_partkey": rng.integers(0, 40, nl).astype(np.int64),
                }),
            )
            self._write(
                d, "customer2", pd.DataFrame({"x": [1]})
            )  # unused; keeps layout simple
            # customer table needs c_nationkey for the customer->nation edge
            self._write(
                d, "customer",
                pd.DataFrame({
                    "c_custkey": np.arange(20, dtype=np.int64),
                    "c_nationkey": rng.integers(0, 8, 20).astype(np.int64),  # some dangle
                }),
            )
            a = _fk_audit(str(d)).reset_index(drop=True)
            b = _fk_audit(str(d), dim_budget=0).reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b, check_dtype=False)
            assert (a["n_orphans"] > 0).any()  # the planted dangles fire

    def test_kcore_distributed_peel_route(self, ray_session):
        from article_extraction_ray.pipelines.queries import _kcore_members

        sf = "/root/testdata/sf0.001"
        a = _kcore_members(sf).reset_index(drop=True)
        b = _kcore_members(sf, node_budget=0).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        assert len(a) > 0 and (a["core_deg"] >= 2).all()


class TestPavBlocks:
    """Pool-adjacent-violators invariants + parity with an independent
    textbook implementation (repeated-scan pooling)."""

    @staticmethod
    def _reference_fit(n, pos):
        """O(k^2) repeated-scan PAV: merge any adjacent violating pair
        until stable, return the fitted rate per input bucket."""
        blocks = [[int(a), int(b)] for a, b in zip(n, pos)]  # [n, pos]
        sizes = [1] * len(blocks)
        changed = True
        while changed:
            changed = False
            i = 0
            while i + 1 < len(blocks):
                if blocks[i][1] * blocks[i + 1][0] > blocks[i + 1][1] * blocks[i][0]:
                    blocks[i][0] += blocks[i + 1][0]
                    blocks[i][1] += blocks[i + 1][1]
                    sizes[i] += sizes[i + 1]
                    del blocks[i + 1], sizes[i + 1]
                    changed = True
                else:
                    i += 1
        fitted = []
        for (bn, bp), k in zip(blocks, sizes):
            fitted.extend([bp / bn] * k)
        return fitted

    def _fitted_from_blocks(self, scores, blocks):
        out = []
        for s in scores:
            for lo, hi, bn, bp in blocks:
                if lo <= s <= hi:
                    out.append(bp / bn)
                    break
        return out

    def test_pav_properties_and_parity(self):
        import numpy as np

        from article_extraction_ray.pipelines.queries import pav_blocks

        rng = np.random.RandomState(11)
        for _ in range(25):
            k = rng.randint(2, 40)
            scores = np.sort(rng.choice(10_000, size=k, replace=False)).astype(np.int64)
            n = rng.randint(1, 50, size=k).astype(np.int64)
            pos = np.array([rng.randint(0, ni + 1) for ni in n], dtype=np.int64)
            blocks = pav_blocks(scores, n, pos)
            # mass conservation
            assert sum(b[2] for b in blocks) == int(n.sum())
            assert sum(b[3] for b in blocks) == int(pos.sum())
            # monotone non-decreasing rates (exact cross-multiplied)
            for (l1, h1, n1, p1), (l2, h2, n2, p2) in zip(blocks, blocks[1:]):
                assert p1 * n2 < p2 * n1, "rates not strictly increasing"
                assert h1 < l2, "blocks out of order"
            # parity: fitted value per bucket equals the textbook fit
            got = self._fitted_from_blocks(scores, blocks)
            want = self._reference_fit(n, pos)
            assert np.allclose(got, want, rtol=0, atol=1e-12)

    def test_pav_degenerate_constant(self):
        import numpy as np

        from article_extraction_ray.pipelines.queries import pav_blocks

        blocks = pav_blocks(
            np.array([1, 2, 3]), np.array([5, 5, 5]), np.array([2, 2, 2])
        )
        assert len(blocks) == 1 and blocks[0] == (1, 3, 15, 6)


class TestRound5DegenerateParity:
    """Planted degenerates for the round-5 stat queries: all-tied rank
    tests (variance 0), constant series (zero xcorr variance), and a
    corpus with no converting users — both engines must agree (NaN ≡
    NULL to the comparer; an unguarded division yields inf and reds)."""

    @staticmethod
    def _con(tmp_path, **tables):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        con = duckdb.connect()
        for name, df in tables.items():
            pq.write_table(
                pa.Table.from_pandas(df, preserve_index=False),
                tmp_path / f"{name}.parquet",
            )
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{tmp_path}/{name}.parquet')"
            )
        return con

    _cmp = staticmethod(TestDegenerateGroupParity._cmp)

    def test_mann_whitney_all_tied(self, ray_session, tmp_path):
        from article_extraction_ray.pipelines.queries import SQL_MANN_WHITNEY, q_mann_whitney

        n = 60
        events = pd.DataFrame(
            {"event_type": (["view"] * 30) + (["click"] * 30),
             "value": np.full(n, 7.0)}  # every value tied -> variance 0
        )
        con = self._con(tmp_path, events=events)
        got = q_mann_whitney(str(tmp_path))
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        assert got["z"].isna().all() and (~got["reject"]).all()
        self._cmp(got, con, SQL_MANN_WHITNEY, ["event_type"])

    def test_spearman_constant_marginal(self, ray_session, tmp_path):
        from article_extraction_ray.pipelines.queries import SQL_SPEARMAN_CORR, q_spearman_corr

        lineitem = pd.DataFrame(
            {"l_returnflag": ["A"] * 20 + ["N"] * 20,
             "l_quantity": [5.0] * 20 + list(np.arange(1, 21, dtype=float)),
             "l_discount": list(np.linspace(0, 0.1, 20).round(2)) * 2}
        )
        con = self._con(tmp_path, lineitem=lineitem)
        got = q_spearman_corr(str(tmp_path))
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        assert got.loc[got["l_returnflag"] == "A", "rho"].isna().all()
        self._cmp(got, con, SQL_SPEARMAN_CORR, ["l_returnflag"])

    def test_xcorr_constant_series(self, ray_session, tmp_path):
        from article_extraction_ray.pipelines.queries import SQL_XCORR_LAGS, q_xcorr_lags

        # 'click' fires exactly once per hour (constant series -> var 0);
        # 'purchase' varies
        hours = pd.date_range("2024-01-01", periods=48, freq="h")
        clicks = pd.DataFrame({"ts": hours, "event_type": "click"})
        buys = pd.DataFrame(
            {"ts": hours.repeat(np.tile([1, 3], 24)), "event_type": "purchase"}
        )
        events = pd.concat([clicks, buys], ignore_index=True)
        events["user_id"] = np.arange(len(events), dtype=np.int64)
        events["value"] = 1.0
        con = self._con(tmp_path, events=events)
        got = q_xcorr_lags(str(tmp_path))
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        assert got["xcorr"].isna().all()
        self._cmp(got, con, SQL_XCORR_LAGS, ["lag"])

    def test_conversion_lag_no_converters(self, ray_session, tmp_path):
        from article_extraction_ray.pipelines.queries import SQL_CONVERSION_LAG, q_conversion_lag

        events = pd.DataFrame(
            {"user_id": np.arange(20, dtype=np.int64),
             "event_type": ["click"] * 10 + ["view"] * 10,  # nobody purchases
             "ts": pd.date_range("2024-01-01", periods=20, freq="h"),
             "value": 1.0}
        )
        con = self._con(tmp_path, events=events)
        got = q_conversion_lag(str(tmp_path))
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        assert int(got["n_users"][0]) == 0 and got["median_us"].isna().all()
        self._cmp(got, con, SQL_CONVERSION_LAG, ["n_users"])

    def test_hard_negatives_single_label_corpus(self, ray_session, tmp_path):
        """A label covering the WHOLE corpus leaves every row's
        different-label mask empty: numpy argmax over an all--inf row
        would emit a bogus index-0 pair, while the SQL inner join emits
        nothing for that vec_id.  The guard must drop such rows."""
        from article_extraction_ray.pipelines.queries import SQL_HARD_NEGATIVES, q_hard_negatives

        rng = np.random.default_rng(11)
        emb = rng.normal(size=(12, 8)).astype(np.float32)
        embeddings = pd.DataFrame(
            {"vec_id": np.arange(12, dtype=np.int64),
             "label": np.zeros(12, dtype=np.int64),  # ONE label everywhere
             "embedding": [list(map(float, r)) for r in emb]}
        )
        con = self._con(tmp_path, embeddings=embeddings)
        got = q_hard_negatives(str(tmp_path))
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        assert len(got) == 0  # no different-label negative exists
        assert len(con.execute(SQL_HARD_NEGATIVES).df()) == 0

    def test_hard_negatives_mixed_with_universal_majority(self, ray_session, tmp_path):
        """Two labeled vectors among ten same-label ones: only rows with
        a different-label candidate appear, and both engines agree."""
        from article_extraction_ray.pipelines.queries import SQL_HARD_NEGATIVES, q_hard_negatives

        rng = np.random.default_rng(13)
        emb = rng.normal(size=(10, 8)).astype(np.float32)
        labels = np.zeros(10, dtype=np.int64)
        labels[3] = 1  # a single minority-label vector
        embeddings = pd.DataFrame(
            {"vec_id": np.arange(10, dtype=np.int64),
             "label": labels,
             "embedding": [list(map(float, r)) for r in emb]}
        )
        con = self._con(tmp_path, embeddings=embeddings)
        got = q_hard_negatives(str(tmp_path))
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        # every majority row pairs with vec 3; vec 3 picks its best majority
        assert len(got) == 10
        self._cmp(got, con, SQL_HARD_NEGATIVES, ["vec_id"])

    def test_jaccard_weeks_gap_week(self, ray_session, tmp_path):
        """An empty week between two active ones: the SQL oracle's
        w+1 join emits nothing across the gap, so the engine must not
        pair list-adjacent weeks either."""
        from article_extraction_ray.pipelines.queries import SQL_JACCARD_WEEKS, q_jaccard_weeks

        wk = 7 * 86_400
        t0 = pd.Timestamp("2024-01-04")  # epoch-week aligned enough
        ts = (
            [t0 + pd.Timedelta(seconds=i * 3600) for i in range(5)]            # week A
            + [t0 + pd.Timedelta(seconds=2 * wk + i * 3600) for i in range(5)]  # week A+2
        )
        events = pd.DataFrame(
            {"user_id": np.array([1, 2, 3, 4, 5] * 2, dtype=np.int64),
             "ts": pd.to_datetime(ts).astype("datetime64[us]"),
             "event_type": "view", "value": 1.0}
        )
        con = self._con(tmp_path, events=events)
        got = q_jaccard_weeks(str(tmp_path))
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        want = con.execute(SQL_JACCARD_WEEKS).df()
        assert len(got) == len(want) == 0  # nothing crosses the gap


class TestRound6Degenerates:
    """Planted edge cases for the round-6 queries: constant-difficulty
    curriculum, equal/skewed class sizes, a planted mislabel, a fully
    duplicated source."""

    _con = staticmethod(TestRound5DegenerateParity._con)
    _cmp = staticmethod(TestDegenerateGroupParity._cmp)

    def test_curriculum_constant_difficulty(self, ray_session, tmp_path):
        """All docs the same length: one value bucket holds everything,
        NTILE must still split exactly by doc_id order."""
        from article_extraction_ray.pipelines.queries import (
            SQL_CURRICULUM_ORDER,
            q_curriculum_order,
        )

        docs = pd.DataFrame(
            {"doc_id": np.arange(10, dtype=np.int64),
             "n_chars": np.full(10, 77, dtype=np.int64),
             "text": ["x"] * 10, "lang": "en", "source": "s"}
        )
        con = self._con(tmp_path, documents=docs)
        got = q_curriculum_order(str(tmp_path))
        self._cmp(got, con, SQL_CURRICULUM_ORDER, ["doc_id"])
        g = (got.to_pandas() if not isinstance(got, pd.DataFrame) else got)
        # 10 rows / 4 phases → sizes 3,3,2,2 in doc_id order
        sizes = g.sort_values("doc_id")["phase"].value_counts().sort_index().tolist()
        assert sizes == [3, 3, 2, 2]

    def test_class_balance_equal_and_skewed(self, ray_session, tmp_path):
        """Equal class sizes keep every row; a 1-row class forces m=1."""
        from article_extraction_ray.pipelines.queries import (
            SQL_CLASS_BALANCE,
            q_class_balance,
        )

        emb = pd.DataFrame(
            {"vec_id": np.arange(9, dtype=np.int64),
             "label": np.array([0, 0, 0, 1, 1, 1, 2, 2, 2], dtype=np.int32),
             "embedding": [[1.0, 0.0]] * 9}
        )
        con = self._con(tmp_path, embeddings=emb)
        got = q_class_balance(str(tmp_path))
        self._cmp(got, con, SQL_CLASS_BALANCE, ["vec_id"])
        g = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        assert len(g) == 9  # equal sizes → nothing dropped

        skew = pd.DataFrame(
            {"vec_id": np.arange(7, dtype=np.int64),
             "label": np.array([0, 0, 0, 0, 0, 0, 1], dtype=np.int32),
             "embedding": [[1.0, 0.0]] * 7}
        )
        con2 = self._con(tmp_path, embeddings=skew)
        got2 = q_class_balance(str(tmp_path))
        self._cmp(got2, con2, SQL_CLASS_BALANCE, ["vec_id"])
        g2 = got2.to_pandas() if not isinstance(got2, pd.DataFrame) else got2
        assert len(g2) == 2 and set(g2["label"]) == {0, 1}

    def test_label_noise_planted_mislabel(self, ray_session, tmp_path):
        """Two tight clusters; one cluster-0 point carries label 1 —
        exactly that point must be flagged with knn_label 0."""
        from article_extraction_ray.pipelines.queries import (
            SQL_LABEL_NOISE,
            q_label_noise_detect,
        )

        rng = np.random.default_rng(5)
        a = rng.normal((1.0, 0.0), 0.01, size=(8, 2))
        b = rng.normal((0.0, 1.0), 0.01, size=(8, 2))
        vecs = np.vstack([a, b]).astype(np.float32)
        labels = np.array([0] * 8 + [1] * 8, dtype=np.int32)
        labels[3] = 1  # the mislabel: geometrically cluster 0
        emb = pd.DataFrame(
            {"vec_id": np.arange(16, dtype=np.int64),
             "label": labels,
             "embedding": [list(map(float, v)) for v in vecs]}
        )
        con = self._con(tmp_path, embeddings=emb)
        got = q_label_noise_detect(str(tmp_path))
        self._cmp(got, con, SQL_LABEL_NOISE, ["vec_id"])
        g = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        assert 3 in set(g["vec_id"]) and int(g.set_index("vec_id").loc[3, "knn_label"]) == 0

    def test_data_card_fully_duplicated_source(self, ray_session, tmp_path):
        """One source is a single text repeated: dup_frac must hit
        (n-1)/n and entropy 0 for its single language."""
        from article_extraction_ray.pipelines.queries import SQL_DATA_CARD, q_data_card

        docs = pd.DataFrame(
            {"doc_id": np.arange(12, dtype=np.int64),
             "text": ["same text here"] * 6 + [f"unique {i} words" for i in range(6)],
             "lang": ["en"] * 6 + ["en", "fr", "fr", "de", "de", "de"],
             "source": ["dup"] * 6 + ["mix"] * 6,
             "n_chars": np.full(12, 14, dtype=np.int64)}
        )
        con = self._con(tmp_path, documents=docs)
        got = q_data_card(str(tmp_path))
        self._cmp(got, con, SQL_DATA_CARD, ["source"])
        g = (got.to_pandas() if not isinstance(got, pd.DataFrame) else got).set_index("source")
        assert abs(g.loc["dup", "dup_frac"] - 5 / 6) < 1e-6  # 6-dp rounded
        assert g.loc["dup", "lang_entropy"] == 0.0
        assert g.loc["mix", "n_langs"] == 3

    def test_media_blob_dedup_tiny_corpus(self, ray_session, tmp_path):
        """Fewer docs than blob groups: every blob unique → zero saved."""
        from article_extraction_ray.pipelines.queries import (
            SQL_MEDIA_BLOB_DEDUP,
            q_media_blob_dedup,
        )

        docs = pd.DataFrame(
            {"doc_id": np.arange(10, dtype=np.int64),
             "text": ["t"] * 10, "lang": "en", "source": "s",
             "n_chars": np.ones(10, dtype=np.int64)}
        )
        con = self._con(tmp_path, documents=docs)
        got = q_media_blob_dedup(str(tmp_path))
        self._cmp(got, con, SQL_MEDIA_BLOB_DEDUP, ["canonical_ref"])
        g = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        assert (g["bytes_saved"] == 0).all() and len(g) == 10

    def test_media_phash_beats_exact_hash(self, ray_session, tmp_path):
        """The perceptual groups are invisible to exact hashing: every
        payload is byte-unique (sha256 all distinct) yet aHash groups
        land exactly on the planted structure."""
        import hashlib

        from article_extraction_ray.pipelines.queries import (
            _PHASH_GROUPS,
            SQL_MEDIA_PHASH_DEDUP,
            _phash_base_bits,
            q_media_phash_dedup,
        )
        from article_extraction_ray.stages.multimodal import make_bmp

        docs = pd.DataFrame(
            {"doc_id": np.arange(100, dtype=np.int64),
             "text": ["t"] * 100, "lang": "en", "source": "s",
             "n_chars": np.ones(100, dtype=np.int64)}
        )
        con = self._con(tmp_path, documents=docs)
        got = q_media_phash_dedup(str(tmp_path))
        self._cmp(got, con, SQL_MEDIA_PHASH_DEDUP, ["canonical_ref"])
        g = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        assert len(g) == _PHASH_GROUPS and int(g["n_refs"].sum()) == 100

        # rebuild the payloads the query synthesizes; exact digests must
        # ALL differ (the noise defeats byte-level dedup)
        digests = set()
        for i in range(100):
            vals = np.where(_phash_base_bits(i % _PHASH_GROUPS) == 1, 200, 40).astype(np.int16)
            noise = np.unpackbits(
                np.frombuffer(hashlib.md5(f"noise-{i}".encode()).digest(), dtype=np.uint8)
            )[:64]
            vals = (vals + np.where(noise == 1, 1, -1)).astype(np.uint8)
            digests.add(hashlib.sha256(make_bmp(8, 8, np.repeat(vals, 3).tobytes())).hexdigest())
        assert len(digests) == 100

    def test_normalized_dedup_planted_variants(self, ray_session, tmp_path):
        """Case/whitespace edits of one text collapse to a single
        survivor (min doc_id) with the right variant count; byte-exact
        dedup would keep all four."""
        from article_extraction_ray.pipelines.queries import (
            SQL_NORMALIZED_DEDUP,
            q_normalized_dedup,
        )

        docs = pd.DataFrame(
            {"doc_id": np.arange(6, dtype=np.int64),
             "text": ["Hello  World", "hello world", " hello\tWORLD ".lower(),
                      "hello\nworld", "different doc", "another doc"],
             "lang": "en", "source": "s", "n_chars": np.full(6, 11, dtype=np.int64)}
        )
        con = self._con(tmp_path, documents=docs)
        got = q_normalized_dedup(str(tmp_path))
        self._cmp(got, con, SQL_NORMALIZED_DEDUP, ["doc_id"])
        g = (got.to_pandas() if not isinstance(got, pd.DataFrame) else got).set_index("doc_id")
        assert len(g) == 3 and int(g.loc[0, "n_variants"]) == 4


class TestEmbeddingBlockedRoutes:
    """The three attribute-aware embedding queries must produce
    IDENTICAL results on the broadcast path and on the above-budget
    ``knn_graph_blocked`` path (block-pair expansion, no driver
    matrix) — forced by shrinking the broadcast budget to zero."""

    SF = "/root/testdata/sf0.001"

    @staticmethod
    def _canon(r, keys):
        df = r.to_pandas() if not isinstance(r, pd.DataFrame) else r
        return df.sort_values(keys).reset_index(drop=True)[sorted(df.columns)]

    def _route_pair(self, monkeypatch, fn, keys):
        from article_extraction_ray.pipelines import queries

        a = self._canon(fn(self.SF), keys)
        monkeypatch.setattr(queries, "_EMB_BROADCAST_ROWS", 0)
        b = self._canon(fn(self.SF), keys)
        assert len(a) > 0  # a trivially-empty parity check proves nothing
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_mutual_nn_blocked_route(self, ray_session, monkeypatch):
        from article_extraction_ray.pipelines.queries import q_mutual_nn

        self._route_pair(monkeypatch, q_mutual_nn, ["vec_a", "vec_b"])

    def test_hard_negatives_blocked_route(self, ray_session, monkeypatch):
        from article_extraction_ray.pipelines.queries import q_hard_negatives

        self._route_pair(monkeypatch, q_hard_negatives, ["vec_id"])

    def test_label_noise_blocked_route(self, ray_session, monkeypatch):
        from article_extraction_ray.pipelines.queries import q_label_noise_detect

        self._route_pair(monkeypatch, q_label_noise_detect, ["vec_id"])


class TestCaptionPairsPlanted:
    """Planted interleave edge cases for the MMC4-style pairing: the
    span-boundary caption gate (exactly _CAP_MIN_TOKENS survives, one
    fewer is dropped), same-span media collapsing to the lowest index,
    media-less and empty documents emitting nothing — each compared
    two-engine via the SQL oracle on the same planted table."""

    _con = staticmethod(TestRound5DegenerateParity._con)
    _cmp = staticmethod(TestDegenerateGroupParity._cmp)

    @staticmethod
    def _docs():
        tok = lambda n: " ".join(f"w{i}" for i in range(n))
        rows = [
            (0, tok(30)),   # m=0: no media, no pairs
            (1, tok(25)),   # nsp=2, cap_idx=1, cap_tok=5: survives the >=5 gate exactly
            (2, tok(25)),   # m=2: spans 0 and 1 both captioned
            (3, tok(10)),   # m=3, nsp=1: all media collide on span 0 -> keep k=0 only
            (5, tok(3)),    # nsp=1, cap_tok=3 < 5: gated out
            (6, ""),        # empty text: emits nothing
            (9, tok(100)),  # nsp=5, cap_idx=4: full-width caption
        ]
        return pd.DataFrame(
            {"doc_id": np.array([r[0] for r in rows], dtype=np.int64),
             "text": [r[1] for r in rows],
             "lang": "en", "source": "s",
             "n_chars": np.array([len(r[1]) for r in rows], dtype=np.int64)}
        )

    def test_caption_pairs_planted(self, ray_session, tmp_path):
        from article_extraction_ray.pipelines.queries import SQL_CAPTION_PAIRS, q_caption_pairs

        con = self._con(tmp_path, documents=self._docs())
        got = q_caption_pairs(str(tmp_path))
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        self._cmp(got, con, SQL_CAPTION_PAIRS, ["doc_id", "media_idx"])
        by_doc = got.groupby("doc_id").size().to_dict()
        assert by_doc == {1: 1, 2: 2, 3: 1, 9: 1}
        d3 = got[got["doc_id"] == 3]
        assert list(d3["media_idx"]) == [0]  # same-span collision keeps lowest k
        d1 = got[got["doc_id"] == 1].iloc[0]
        assert d1["caption"] == "w20 w21 w22 w23 w24"  # boundary: exactly 5 tokens

    def test_span_interleave_stats_planted(self, ray_session, tmp_path):
        from article_extraction_ray.pipelines.queries import (
            SQL_SPAN_INTERLEAVE_STATS,
            q_span_interleave_stats,
        )

        con = self._con(tmp_path, documents=self._docs())
        got = q_span_interleave_stats(str(tmp_path))
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        self._cmp(got, con, SQL_SPAN_INTERLEAVE_STATS, ["source"])
        row = got.iloc[0]
        # docs 1,2,3,5,9 carry media (6 is empty, 0 is m=0)
        assert int(row["docs_with_media"]) == 5
        # media count zeroes out for the empty doc (6%4=2 not counted)
        assert int(row["n_media"]) == (1 + 2 + 3 + 1 + 1)

    def test_temperature_mix_exact_ratio(self, ray_session, tmp_path):
        from article_extraction_ray.pipelines.queries import SQL_TEMPERATURE_MIX, q_temperature_mix

        docs = pd.DataFrame(
            {"doc_id": np.arange(101, dtype=np.int64),
             "text": "t", "lang": "en",
             "source": (["head"] * 100) + ["tail"],
             "n_chars": np.ones(101, dtype=np.int64)}
        )
        con = self._con(tmp_path, documents=docs)
        got = q_temperature_mix(str(tmp_path))
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        self._cmp(got, con, SQL_TEMPERATURE_MIX, ["source"])
        m = got.set_index("source")["upsample"]
        assert m["head"] == 1.0 and m["tail"] == 10.0  # sqrt(100/1) exact


class TestExactSubstrRewritePlanted:
    """Two documents sharing one 8-token run lose exactly those 8
    tokens each (and nothing else); a unique doc and a short doc pass
    through untouched; a doc that IS the duplicated run rewrites to
    empty — each checked two-engine."""

    _con = staticmethod(TestRound5DegenerateParity._con)
    _cmp = staticmethod(TestDegenerateGroupParity._cmp)

    def test_planted_shared_run(self, ray_session, tmp_path):
        from article_extraction_ray.pipelines.queries import (
            SQL_EXACT_SUBSTR_REWRITE,
            q_exact_substr_rewrite,
        )

        shared = " ".join(f"d{i}" for i in range(8))
        docs = pd.DataFrame(
            {"doc_id": np.array([0, 1, 2, 3, 4], dtype=np.int64),
             "text": [f"alpha beta {shared} gamma delta",
                      f"x1 x2 x3 {shared} y1",
                      "all unique tokens here nothing repeats at all ever",
                      "short doc",
                      shared],  # exactly the duplicated run -> rewrites to ''
             "lang": "en", "source": "s", "n_chars": np.int64(1)}
        )
        con = self._con(tmp_path, documents=docs)
        got = q_exact_substr_rewrite(str(tmp_path))
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        self._cmp(got, con, SQL_EXACT_SUBSTR_REWRITE, ["doc_id"])
        g = got.set_index("doc_id")
        assert g.loc[0, "clean_text"] == "alpha beta gamma delta"
        assert g.loc[1, "clean_text"] == "x1 x2 x3 y1"
        assert int(g.loc[0, "n_removed"]) == 8 and int(g.loc[1, "n_removed"]) == 8
        assert int(g.loc[2, "n_removed"]) == 0 and int(g.loc[3, "n_removed"]) == 0
        assert g.loc[4, "clean_text"] == "" and int(g.loc[4, "n_removed"]) == 8


class TestCdcChunkDedupPlanted:
    """The defining CDC property: a one-char prefix insertion shifts
    every byte offset, yet the content-defined boundaries realign and
    the two documents share all chunks after the first cut — fixed
    blocks would share nothing.  Verified two-engine on a planted
    pair, plus the kernel-level chunk-suffix assertion."""

    _con = staticmethod(TestRound5DegenerateParity._con)
    _cmp = staticmethod(TestDegenerateGroupParity._cmp)

    def test_insertion_resilience(self, ray_session, tmp_path):
        from article_extraction_ray.pipelines.queries import (
            SQL_CDC_CHUNK_DEDUP,
            _cdc_chunks,
            q_cdc_chunk_dedup,
        )

        rng = np.random.default_rng(11)
        base = "".join(rng.choice(list("abcdefgh ")) for _ in range(400))
        docs = pd.DataFrame(
            {"doc_id": np.array([0, 1], dtype=np.int64),
             "text": [base, "X" + base],
             "lang": "en", "source": "s", "n_chars": np.int64(1)}
        )
        ca, cb = _cdc_chunks(base), _cdc_chunks("X" + base)
        assert len(ca) > 2  # the planted text must actually cut
        # all chunks after each side's first cut coincide
        assert ca[1:] == cb[1:]
        con = self._con(tmp_path, documents=docs)
        got = q_cdc_chunk_dedup(str(tmp_path))
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        self._cmp(got, con, SQL_CDC_CHUNK_DEDUP, ["source"])
        row = got.iloc[0]
        # the shared suffix chunks dedup away: distinct < total
        assert int(row["n_distinct_chunks"]) == int(row["n_chunks"]) - (len(ca) - 1)

    def test_short_and_empty_docs(self, ray_session, tmp_path):
        from article_extraction_ray.pipelines.queries import SQL_CDC_CHUNK_DEDUP, q_cdc_chunk_dedup

        docs = pd.DataFrame(
            {"doc_id": np.array([0, 1, 2], dtype=np.int64),
             "text": ["tiny", "", "tiny"],  # sub-window docs are single chunks
             "lang": "en", "source": "s", "n_chars": np.int64(1)}
        )
        con = self._con(tmp_path, documents=docs)
        got = q_cdc_chunk_dedup(str(tmp_path))
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        self._cmp(got, con, SQL_CDC_CHUNK_DEDUP, ["source"])
        row = got.iloc[0]
        assert int(row["n_chunks"]) == 3 and int(row["n_distinct_chunks"]) == 2


class TestRound4InterleavedPlanted:
    """Planted edge-case parity for the round-4 interleaved family:
    media_ref_integrity's checksum pins WHICH refs are orphaned (not
    just how many), span_order_restore survives single-span and exact
    multiple-of-W documents, token_budget_shards puts a media-glued
    span in its caption's shard and lands exact-budget boundaries on
    the next shard — each compared two-engine via the SQL oracle."""

    _con = staticmethod(TestRound5DegenerateParity._con)
    _cmp = staticmethod(TestDegenerateGroupParity._cmp)

    @staticmethod
    def _docs():
        tok = lambda n: " ".join(f"w{i}" for i in range(n))
        rows = [
            (0, tok(40)),   # m=0: no media; exactly 2 full spans (nt % W == 0)
            (1, tok(20)),   # m=1, single span; blob (1+0)%5 != 0 -> resolved
            (3, tok(48)),   # m=3, nsp=3; media collapse + budget boundary at 48
            (4, tok(1)),    # m=0, single 1-token span
            (5, tok(25)),   # m=1, k=0: (5+0)%5 == 0 -> ORPHAN ref
            (7, tok(100)),  # m=3, nsp=5: k=1 -> (7+3)%5 == 0 -> one orphan of 3
        ]
        return pd.DataFrame(
            {"doc_id": np.array([r[0] for r in rows], dtype=np.int64),
             "text": [r[1] for r in rows],
             "lang": "en", "source": "s",
             "n_chars": np.array([len(r[1]) for r in rows], dtype=np.int64)}
        )

    def test_media_ref_integrity_planted(self, ray_session, tmp_path):
        from article_extraction_ray.pipelines.queries import (
            SQL_MEDIA_REF_INTEGRITY,
            q_media_ref_integrity,
        )

        con = self._con(tmp_path, documents=self._docs())
        got = q_media_ref_integrity(str(tmp_path))
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        self._cmp(got, con, SQL_MEDIA_REF_INTEGRITY, ["source"])
        row = got.iloc[0]
        # refs: doc1 k0, doc3 k0-2, doc5 k0, doc7 k0-2 = 8
        assert int(row["n_refs"]) == 8
        # orphans: doc5 k0 (key 20) and doc7 k1 (key 29) only
        assert int(row["n_missing"]) == 2
        assert int(row["missing_key_sum"]) == 5 * 4 + 0 + 7 * 4 + 1

    def test_span_order_restore_planted(self, ray_session, tmp_path):
        import hashlib

        from article_extraction_ray.pipelines.queries import (
            SQL_SPAN_ORDER_RESTORE,
            q_span_order_restore,
        )

        docs = self._docs()
        con = self._con(tmp_path, documents=docs)
        got = q_span_order_restore(str(tmp_path))
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        self._cmp(got, con, SQL_SPAN_ORDER_RESTORE, ["doc_id"])
        by_doc = got.set_index("doc_id")
        assert int(by_doc.loc[0, "n_spans"]) == 2  # exact multiple of W
        assert int(by_doc.loc[4, "n_spans"]) == 1  # single-token doc
        # reassembly hash equals the intact document's md5 for every doc
        for _, r in docs.iterrows():
            want = hashlib.md5(" ".join(r["text"].split()).encode()).hexdigest()
            assert by_doc.loc[r["doc_id"], "restored_md5"] == want

    def test_token_budget_shards_planted(self, ray_session, tmp_path):
        from article_extraction_ray.pipelines.queries import (
            _IMG_TOKENS,
            _SHARD_BUDGET,
            SQL_TOKEN_BUDGET_SHARDS,
            q_token_budget_shards,
        )

        con = self._con(tmp_path, documents=self._docs())
        got = q_token_budget_shards(str(tmp_path))
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        self._cmp(got, con, SQL_TOKEN_BUDGET_SHARDS, ["doc_id", "shard"])
        # doc 0 (40 text tokens, no media): spans cost 20+20, cum_before
        # 0 and 20 -> one shard holds both
        d0 = got[got["doc_id"] == 0]
        assert list(d0["shard"]) == [0] and int(d0["n_tokens"].iloc[0]) == 40
        # doc 3 (48 tokens, nsp=3, media collapse): spans 20,20,8; media
        # k=0 -> span (3*1+0)%3=0, k=1 -> (3*2+1)%3=1, k=2 -> (3*3+2)%3=2
        # -> every span carries one media, costs 52,52,40; cum_before
        # 0,52,104 -> shards 0,1,2 (the 48-boundary puts span 1 in shard 1)
        d3 = got[got["doc_id"] == 3].sort_values("shard")
        assert list(d3["shard"]) == [0, 1, 2]
        assert list(d3["n_tokens"]) == [52, 52, 40]
        assert int(d3["n_media"].sum()) == 3
        # token conservation: shard costs sum to text + media budget
        d7 = got[got["doc_id"] == 7]
        assert int(d7["n_tokens"].sum()) == 100 + 3 * _IMG_TOKENS


class TestRound4Gates:
    """Non-vacuity of the round-4 driver gates (their SQL oracles
    enumerate TRUE, so these prove the Ray side can actually turn red)
    plus forced-route parity for the reach closure."""

    SF = "/root/testdata/sf0.001"

    def test_reach_pairs_shuffle_route_parity(self, ray_session):
        from article_extraction_ray.pipelines.queries import (
            _reach_pairs_shuffle,
            q_reach_pairs,
        )

        fast = q_reach_pairs(self.SF)
        slow = _reach_pairs_shuffle(self.SF, t_max=2)
        pd.testing.assert_frame_equal(
            fast.head(3).reset_index(drop=True), slow.reset_index(drop=True)
        )

    def test_bpe_gate_detects_symbol_drop(self, ray_session):
        """A mutant encoder that loses the end-of-word marker must fail
        the roundtrip — the gate is not vacuously TRUE."""
        import pyarrow as pa

        from article_extraction_ray.pipelines.queries import _BpeRoundtripGateStage
        from article_extraction_ray.stages.bpe import bpe_train_local
        from article_extraction_ray.state.broadcast import Broadcast

        merges = bpe_train_local(["the cat sat on the mat"], num_merges=4)
        mbc = Broadcast(list(zip(merges["left"].astype(str), merges["right"].astype(str))))
        batch = pa.table({"source": ["s0", "s0"], "text": ["the cat", "sat mat"]})

        stage = _BpeRoundtripGateStage(mbc)
        ok = stage(batch)
        assert int(ok["n_ok"].sum()) == 2

        bad = _BpeRoundtripGateStage(mbc)
        real = bad._st._encode_word
        bad._st._encode_word = lambda w: real(w)[:-1]  # drop the last token
        out = bad(batch)
        assert int(out["n_ok"].sum()) == 0

    def test_unigram_gate_detects_piece_drop(self, ray_session, monkeypatch):
        """A mutant Viterbi that drops the final piece must fail the
        lossless check."""
        import pyarrow as pa

        import article_extraction_ray.stages.unigram_lm as ul
        from article_extraction_ray.pipelines.queries import _UnigramRoundtripGateStage
        from article_extraction_ray.state.broadcast import Broadcast

        logp = {c: -2.0 for c in "thecatsm "} | {"the": -1.0, "cat": -1.0}
        lbc = Broadcast(list(logp.items()))
        batch = pa.table({"source": ["s0"], "text": ["the cat"]})

        ok = _UnigramRoundtripGateStage(lbc, 3)(batch)
        assert int(ok["n_lossless"].sum()) == 1 and int(ok["n_opt"].sum()) == 1

        real = ul.viterbi_segment
        monkeypatch.setattr(ul, "viterbi_segment", lambda w, lp, m: real(w, lp, m)[:-1])
        bad = _UnigramRoundtripGateStage(lbc, 3)(batch)
        assert int(bad["n_lossless"].sum()) == 0

    def test_training_order_gate_detects_dropped_batch(self, ray_session, monkeypatch):
        """If the iterator silently loses rows, permutation_ok must go
        False."""
        import article_extraction_ray.pipelines.training as tr
        from article_extraction_ray.pipelines import queries as Q

        real = tr.iter_training_batches

        def lossy(ds, **kw):
            it = iter(list(real(ds, **kw))[:-1])  # drop the last batch
            return it

        monkeypatch.setattr(tr, "iter_training_batches", lossy)
        # q imports from .training at call time via module attribute
        monkeypatch.setattr(
            "article_extraction_ray.pipelines.training.iter_training_batches", lossy
        )
        out = Q.q_training_order_gate(self.SF)
        assert not bool(out["permutation_ok"].iloc[0])

    def test_media_ref_integrity_shuffle_route_parity(self, ray_session):
        from article_extraction_ray.pipelines.queries import _media_ref_integrity

        bc = _media_ref_integrity(self.SF)
        sh = _media_ref_integrity(self.SF, dim_budget=0)
        pd.testing.assert_frame_equal(
            bc.reset_index(drop=True), sh.reset_index(drop=True)
        )

    def test_scc_pairs_route_parity(self, ray_session):
        from article_extraction_ray.pipelines.queries import (
            _scc_members_pairs,
            q_scc_members,
        )

        fast = q_scc_members(self.SF)
        pairs = _scc_members_pairs(self.SF)
        pd.testing.assert_frame_equal(
            fast.reset_index(drop=True), pairs.reset_index(drop=True)
        )

    def test_pca_gate_detects_unnormalized_components(self, ray_session, monkeypatch):
        import article_extraction_ray.stages.clustering as cl
        from article_extraction_ray.pipelines import queries as Q

        real = cl.pca_fit

        def scaled(ds, **kw):
            mean, comps = real(ds, **kw)
            return mean, comps * 1.1

        monkeypatch.setattr(cl, "pca_fit", scaled)
        out = Q.q_pca_gate(self.SF)
        assert not bool(out["orthonormal_ok"].iloc[0])

    def test_semantic_gate_detects_all_dropped(self, ray_session, monkeypatch):
        """If the dedup drops EVERY vector, no dropped vector has a kept
        cover — cover_ok must go False."""
        import article_extraction_ray.stages.clustering as cl
        from article_extraction_ray.pipelines import queries as Q

        real = cl.semantic_dedup

        def drop_all(ds, **kw):
            out = real(ds, **kw)

            def flip(df):
                df = df.copy()
                df["keep"] = False
                return df

            return out.map_batches(flip, batch_format="pandas")

        monkeypatch.setattr(cl, "semantic_dedup", drop_all)
        out = Q.q_semantic_dedup_gate(self.SF)
        assert not bool(out["cover_ok"].iloc[0])

    def test_isotonic_gate_detects_lost_block(self, ray_session, monkeypatch):
        from article_extraction_ray.pipelines import queries as Q

        real = Q.pav_blocks
        monkeypatch.setattr(Q, "pav_blocks", lambda s, n, p: real(s, n, p)[1:])
        out = Q.q_isotonic_gate(self.SF)
        assert not bool(out["mass_ok"].iloc[0])

    def test_hyperball_gate_detects_biased_estimator(self, ray_session, monkeypatch):
        import article_extraction_ray.stages.hyperball as hb
        from article_extraction_ray.pipelines import queries as Q

        real = hb.hyperball

        def doubled(edges, **kw):
            out = real(edges, **kw)
            out = out.copy()
            out["n_pairs_est"] = out["n_pairs_est"] * 2.0
            return out

        monkeypatch.setattr(hb, "hyperball", doubled)
        out = Q.q_hyperball_gate(self.SF)
        assert not out["est_ok"].any()

    def test_rag_gate_detects_id_plumbing_slip(self, ray_session, monkeypatch):
        import article_extraction_ray.stages.pq as pq
        from article_extraction_ray.pipelines import queries as Q

        real = pq.knn_ivfpq

        def shifted(*a, **kw):
            out = real(*a, **kw)

            def bump(df):
                df = df.copy()
                df["vec_id"] = df["vec_id"] + 1
                return df

            return out.map_batches(bump, batch_format="pandas")

        monkeypatch.setattr(pq, "knn_ivfpq", shifted)
        out = Q.q_rag_recall_gate(self.SF)
        assert not out["self_hit_ok"].any()

    def test_incremental_dedup_gate_detects_lost_candidates(self, ray_session, monkeypatch):
        import pandas as _pd

        import article_extraction_ray.stages.dedup as dd
        from article_extraction_ray.pipelines import queries as Q

        empty = _pd.DataFrame(
            {"id_new": _pd.Series(dtype="int64"), "id_old": _pd.Series(dtype="int64"),
             "n_bands": _pd.Series(dtype="int64"), "est_jaccard": _pd.Series(dtype="float64")}
        )
        monkeypatch.setattr(dd, "minhash_dedup_incremental", lambda *a, **kw: empty)
        out = Q.q_incremental_dedup_gate(self.SF)
        assert not bool(out["candidates_equal_ok"].iloc[0])


class TestTrainingMixPlanted:
    """Planted edge cases for the training-mix composite: exact
    ceil(sqrt(n_min*n_dom)) keep counts on a tiny skewed corpus, and
    the all-domains-equal corpus where the mix must keep EVERYTHING."""

    _con = staticmethod(TestRound5DegenerateParity._con)
    _cmp = staticmethod(TestDegenerateGroupParity._cmp)

    def test_skewed_keep_counts(self, ray_session, tmp_path):
        from article_extraction_ray.pipelines.queries import SQL_TRAINING_MIX, q_training_mix

        # doms: 0×1 (id 0), 1×4 (ids ≡1), 2×4 (ids ≡5) → n_min=1,
        # k = ceil(sqrt(1·n)) → 1, 2, 2 → exactly 5 survivors
        ids = [0, 1, 101, 201, 301, 5, 105, 205, 305]
        docs = pd.DataFrame(
            {"doc_id": ids, "source": "s", "lang": "en",
             "text": [f"w{i} " * (i % 4 + 1) for i in range(len(ids))]}
        )
        con = self._con(tmp_path, documents=docs)
        got = q_training_mix(str(tmp_path))
        self._cmp(got, con, SQL_TRAINING_MIX, ["position"])
        assert len(got) == 5
        assert sorted(got["position"]) == [1, 2, 3, 4, 5]
        assert got.groupby("dom")["doc_id"].size().to_dict() == {0: 1, 1: 2, 2: 2}

    def test_equal_domains_keep_everything(self, ray_session, tmp_path):
        from article_extraction_ray.pipelines.queries import SQL_TRAINING_MIX, q_training_mix

        ids = [1, 101, 201, 5, 105, 205]  # dom 1 ×3, dom 2 ×3
        docs = pd.DataFrame(
            {"doc_id": ids, "source": "s", "lang": "en",
             "text": ["alpha beta gamma"] * len(ids)}
        )
        con = self._con(tmp_path, documents=docs)
        got = q_training_mix(str(tmp_path))
        self._cmp(got, con, SQL_TRAINING_MIX, ["position"])
        assert len(got) == len(ids)  # n_min == n_dom → no downsampling


class TestRegistryCompanions:
    """Registry invariants for the rows-only/companion pairing."""

    def test_every_companion_adjacent_and_green_checkable(self):
        from article_extraction_ray.pipelines.queries import (
            COMPANION_OF,
            ORACLE_SQL,
            QUERIES,
        )

        ks = list(QUERIES)
        for base, gate in COMPANION_OF.items():
            assert base in QUERIES, base
            assert gate in QUERIES, gate
            assert ks.index(gate) == ks.index(base) + 1, (base, gate)
            # the companion's whole point is a driver-checkable oracle
            assert gate in ORACLE_SQL, gate

    def test_rows_only_budget(self):
        """Round-5 target: fewer than 35 rows-only queries, and every
        one of them is either covered by a companion or documented in
        the ORACLE_SQL trailer comment."""
        from article_extraction_ray.pipelines.queries import (
            COMPANION_OF,
            ORACLE_SQL,
            QUERIES,
        )

        rows_only = [k for k in QUERIES if k not in ORACLE_SQL]
        assert len(rows_only) < 35, rows_only
        paired = set(COMPANION_OF) | {
            "unigram_encode",  # shares unigram_roundtrip_gate with _train
            "bpe_encode",  # shares bpe_roundtrip_gate with _train
            "qa_token_extract",  # shares qa_extract_gate
            "media_frames", "media_features",  # share media_dims_gate
            "knn_lsh_shuffle", "knn_ivf", "knn_pq", "knn_ivfpq",  # ann_recall_gates
        }
        uncovered = [k for k in rows_only if k not in paired]
        assert not uncovered, uncovered
