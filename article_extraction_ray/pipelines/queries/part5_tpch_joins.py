"""Query registry part5 tpch joins — assembled into the
article_extraction_ray.pipelines.queries namespace by the package
__init__ (single shared namespace: cross-part helpers, constants
and late-bound references behave exactly as in the original
single-file module)."""

if "_ASSEMBLING" not in globals():  # pragma: no cover
    raise ImportError(
        "queries part files are executed by the package __init__ into ONE\n"
        "shared namespace; import article_extraction_ray.pipelines.queries"
    )

# ---------------------------------------------------------------------------
# TPC-H-shaped multi-join family: Q5 / Q17 / Q18 plan shapes
# ---------------------------------------------------------------------------

_Q5_REGION = "ASIA"
_Q5_FROM = "1996-01-01"
_Q5_TO = "1997-01-01"


def q_q5_region_revenue(sf_dir: str):
    """TPC-H-Q5-shaped five-table join: revenue per nation where the
    customer and the line's supplier sit in the SAME nation of one
    region, over a one-year order window.

    Canonical distributed Q5 plan: the dimension chain (region⋈nation,
    supplier, and the ASIA-filtered custkey→nationkey map — all
    dimensions by the TPC-H size hierarchy) broadcasts once as
    pre-built lookups and FUSES into the fact-scan passes; the one
    genuinely fact-fact exchange, lineitem⋈order-dim, routes through
    the size-routed :func:`tabular.join` facade (broadcast under
    budget, hash exchange above).  Lineitem pre-reduces
    per (orderkey, supplier-nation) inside the batch before the
    exchange, so the join input is bounded by distinct keys, not line
    count.  Revenue accumulates in integer 1e-4 dollars (price has 2
    decimals, discount 2) — exact under any accumulation order."""
    import pyarrow.compute as pc

    from ..tabular import join as join_route

    nat = read_table_arrow(sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = read_table_arrow(sf_dir, "region", columns=["r_regionkey", "r_name"])
    rkey = reg.filter(pc.equal(reg["r_name"], _Q5_REGION))["r_regionkey"][0].as_py()
    nat_in = nat.filter(pc.equal(nat["n_regionkey"], rkey))
    nkeys = nat_in["n_nationkey"].to_numpy().astype(np.int64)
    nname = {int(k): v for k, v in zip(nkeys, nat_in["n_name"].to_pylist())}
    nkeys_arr_bc = Broadcast(pa.array(nkeys, type=pa.int32()))

    sup = read_table_arrow(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    smap = pd.Series(
        sup["s_nationkey"].to_numpy().astype(np.int64),
        index=sup["s_suppkey"].to_numpy().astype(np.int64),
    )
    smap_bc = Broadcast(smap)

    lo = np.datetime64(_Q5_FROM, "us")
    hi = np.datetime64(_Q5_TO, "us")
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"], split=True)

    # customer → nation attach: ASIA-filtered custkey→nationkey map is a
    # DIMENSION by the TPC-H size hierarchy, so it broadcasts once and the
    # attach fuses into the order-filter pass (one plan barrier saved vs
    # routing a dedicated join; the FACT-fact exchange below still routes
    # through the size-routed facade, which is the part that must scale).
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"], split=True)

    def cust_partial(batch: pa.Table) -> pd.DataFrame:
        keep = pc.is_in(batch["c_nationkey"], value_set=nkeys_arr_bc.get())
        out = batch.filter(keep)
        return pd.DataFrame(
            {
                "k": out["c_custkey"].to_numpy(zero_copy_only=False),
                "n": out["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )

    cmap_df = cust.map_batches(cust_partial, batch_format="pyarrow").to_pandas()
    cmap_bc = Broadcast(pd.Series(cmap_df["n"].to_numpy(), index=cmap_df["k"].to_numpy()))

    def pick_orders_nation(batch: pa.Table) -> pd.DataFrame:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        keep = (d >= lo) & (d < hi)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)[keep]
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)[keep]
        nk = cmap_bc.get().reindex(ck).to_numpy()
        hit = ~np.isnan(nk)
        return pd.DataFrame(
            {"o_orderkey": ok[hit], "c_nationkey": nk[hit].astype(np.int64)}
        )

    odim = orders.map_batches(pick_orders_nation, batch_format="pyarrow")

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        split=True,
    )

    def li_partial(batch: pa.Table) -> pd.DataFrame:
        snat = smap_bc.get()[batch["l_suppkey"].to_numpy(zero_copy_only=False)].to_numpy()
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.round(price * 10000 * (1.0 - disc)).astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                    "s_nationkey": snat,
                    "rev": rev,
                }
            )
            .groupby(["o_orderkey", "s_nationkey"], as_index=False)["rev"]
            .sum()
        )

    lrev = li.map_batches(li_partial, batch_format="pyarrow")
    joined, _ = join_route(lrev, odim, on="o_orderkey")

    def same_nation(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["s_nationkey"] == df["c_nationkey"]]
        return df[["c_nationkey", "rev"]]

    per_nation = grouped_aggregate(
        joined.map_batches(same_nation, batch_format="pandas"),
        ["c_nationkey"],
        {"rev": ("sum", "rev")},
        small_keys=True,
    ).to_pandas()
    per_nation["n_name"] = per_nation["c_nationkey"].map(nname)
    per_nation["revenue"] = np.round(per_nation["rev"] / 10000.0, 2)
    out = per_nation.sort_values(["rev", "n_name"], ascending=[False, True], kind="stable")
    return out[["n_name", "revenue"]].reset_index(drop=True)


SQL_Q5 = f"""
SELECT n.n_name,
       round(sum(CAST(round(l.l_extendedprice * 10000 * (1.0 - l.l_discount)) AS BIGINT)) / 10000.0, 2) AS revenue
FROM customer c
JOIN orders   o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation   n ON c.c_nationkey = n.n_nationkey AND s.s_nationkey = n.n_nationkey
JOIN region   r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{_Q5_REGION}'
  AND o.o_orderdate >= TIMESTAMP '{_Q5_FROM}'
  AND o.o_orderdate <  TIMESTAMP '{_Q5_TO}'
GROUP BY n.n_name
ORDER BY sum(CAST(round(l.l_extendedprice * 10000 * (1.0 - l.l_discount)) AS BIGINT)) DESC, n.n_name
"""


_Q10_FROM = "1996-01-01"
_Q10_TO = "1996-04-01"
_Q10_TOPN = 20


def q_q10_returned_items(sf_dir: str):
    """TPC-H-Q10-shaped returned-item report: the top-20 customers by
    revenue lost to returned lineitems over one quarter, with their
    nation attached — the complaint-triage join chain (fact filter →
    fact-fact join → two dimension attaches → grouped top-k).

    Plan: lineitem filters ``l_returnflag='R'`` AT THE SCAN (predicate
    in the batch pass, only 3 columns read) and pre-reduces integer
    1e-4-dollar revenue per orderkey; the quarter-filtered orders side
    carries (orderkey → custkey); the one fact-fact exchange routes
    through the size-routed :func:`tabular.join` facade.  Per-customer
    revenue folds through the open-domain exchange, the nation name
    attaches from a broadcast dimension map, and the top-20 runs
    through :func:`tabular.topk`'s per-batch prefilter with a
    deterministic (revenue DESC, custkey ASC) rule.  Integer cents
    end-to-end — the top-20 boundary cannot shift with accumulation
    order."""
    import pyarrow.compute as pc

    from ..tabular import join as join_route
    from ..tabular import topk

    nat = read_table_arrow(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nname = {
        int(k): v
        for k, v in zip(nat["n_nationkey"].to_numpy(), nat["n_name"].to_pylist())
    }
    lo = np.datetime64(_Q10_FROM, "us")
    hi = np.datetime64(_Q10_TO, "us")

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
        split=True,
    )

    def returned_rev(batch: pa.Table) -> pd.DataFrame:
        keep = pc.equal(batch["l_returnflag"], "R")
        b = batch.filter(keep)
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.round(price * 10000 * (1.0 - disc)).astype(np.int64)
        return (
            pd.DataFrame(
                {"o_orderkey": b["l_orderkey"].to_numpy(zero_copy_only=False), "rev": rev}
            )
            .groupby("o_orderkey", as_index=False)["rev"]
            .sum()
        )

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"], split=True)

    def quarter_orders(batch: pa.Table) -> pd.DataFrame:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        keep = (d >= lo) & (d < hi)
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy(zero_copy_only=False)[keep],
                "c_custkey": batch["o_custkey"].to_numpy(zero_copy_only=False)[keep],
            }
        )

    joined, _ = join_route(
        li.map_batches(returned_rev, batch_format="pyarrow"),
        orders.map_batches(quarter_orders, batch_format="pyarrow"),
        on="o_orderkey",
    )
    per_cust = grouped_aggregate(
        joined.map_batches(
            lambda df: df[["c_custkey", "rev"]], batch_format="pandas"
        ),
        ["c_custkey"],
        {"rev": ("sum", "rev")},
    )
    top = (
        topk(per_cust, ["rev", "c_custkey"], k=_Q10_TOPN, descending=[True, False])
        .to_pandas()
        .reset_index(drop=True)
    )
    cust = read_table_arrow(sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"])
    cdf = cust.to_pandas().set_index("c_custkey")
    top["c_name"] = top["c_custkey"].map(cdf["c_name"])
    top["n_name"] = top["c_custkey"].map(cdf["c_nationkey"]).map(nname)
    top["revenue"] = np.round(top["rev"] / 10000.0, 2)
    return top[["c_custkey", "c_name", "n_name", "revenue"]].astype({"c_custkey": np.int64})


SQL_Q10 = f"""
SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_name, n.n_name,
       round(sum(CAST(round(l.l_extendedprice * 10000 * (1.0 - l.l_discount)) AS BIGINT)) / 10000.0, 2) AS revenue
FROM customer c
JOIN orders   o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation   n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '{_Q10_FROM}'
  AND o.o_orderdate <  TIMESTAMP '{_Q10_TO}'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY sum(CAST(round(l.l_extendedprice * 10000 * (1.0 - l.l_discount)) AS BIGINT)) DESC, c.c_custkey
LIMIT {_Q10_TOPN}
"""


_Q17_BRAND = "Brand#13"
_Q17_FRACTION = 0.2


def q_q17_small_quantity(sf_dir: str):
    """TPC-H-Q17-shaped correlated-aggregate join: average yearly
    revenue lost if small-quantity orders (below 20% of the part's own
    mean quantity) were no longer taken, for one brand.

    Two streaming passes over lineitem, zero row shuffle: pass 1
    semi-filters on the brand's part keys (broadcast ``pa.array`` +
    ``pc.is_in``) and reduces exact per-part (sum, count) quantity
    partials — quantities are whole numbers, so the sums are exact
    integers in float64 and the 0.2·mean threshold is deterministic
    under any accumulation order.  The per-part thresholds broadcast
    (bounded by the brand's part count); pass 2 re-filters and sums
    matching revenue in integer cents.  Single-row output."""
    import pyarrow.compute as pc

    part = read_table_arrow(sf_dir, "part", columns=["p_partkey", "p_brand"])
    pk = part.filter(pc.equal(part["p_brand"], _Q17_BRAND))["p_partkey"].combine_chunks()
    pk_bc = Broadcast(pk.cast(pa.int64()))

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"], split=True)

    def qty_partial(batch: pa.Table) -> pd.DataFrame:
        keep = pc.is_in(batch["l_partkey"], value_set=pk_bc.get())
        b = batch.filter(keep)
        return (
            pd.DataFrame(
                {
                    "p": b["l_partkey"].to_numpy(zero_copy_only=False),
                    "q": b["l_quantity"].to_numpy(zero_copy_only=False),
                }
            )
            .groupby("p", as_index=False)
            .agg(s=("q", "sum"), c=("q", "count"))
        )

    stats = grouped_aggregate(
        li.map_batches(qty_partial, batch_format="pyarrow"),
        ["p"],
        {"s": ("sum", "s"), "c": ("sum", "c")},
        small_keys=True,
    ).to_pandas()
    thr = pd.Series(
        _Q17_FRACTION * (stats["s"].to_numpy() / stats["c"].to_numpy()),
        index=stats["p"].to_numpy(),
    )
    thr_bc = Broadcast(thr)

    def rev_partial(batch: pa.Table) -> pd.DataFrame:
        keep = pc.is_in(batch["l_partkey"], value_set=pk_bc.get()).to_numpy(zero_copy_only=False)
        b = batch.filter(pa.array(keep))
        if len(b) == 0:
            return pd.DataFrame({"cents": pd.Series([], dtype=np.int64)})
        pkeys = b["l_partkey"].to_numpy(zero_copy_only=False)
        t = thr_bc.get().reindex(pkeys).to_numpy()
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        small = q < t
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)[small]
        cents = np.round(price * 100).astype(np.int64).sum()
        return pd.DataFrame({"cents": [cents]})

    total = (
        li.map_batches(rev_partial, batch_format="pyarrow")
        .sum("cents")
    )
    return pd.DataFrame({"avg_yearly": [round((total / 100.0) / 7.0, 2)]})


SQL_Q17 = f"""
SELECT round((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) / 100.0) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = '{_Q17_BRAND}'
  AND l.l_quantity < (
    SELECT {_Q17_FRACTION} * (sum(l2.l_quantity) / count(l2.l_quantity))
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
"""


_Q18_MIN_QTY = 250.0


def q_q18_large_orders(sf_dir: str):
    """TPC-H-Q18-shaped big-order report: orders whose total line
    quantity exceeds a threshold, with customer name — the
    HAVING-over-fact-aggregate + two-dimension-join plan.

    Per-orderkey quantity partials pre-reduce inside each batch, fold
    through the open-domain ``grouped_aggregate`` exchange (exact —
    whole-number quantities), and the surviving keys (HAVING prunes to
    a sliver) join orders and customer through the size-routed facade.
    Top-100 runs through ``topk``'s per-batch prefilter.  Quantities
    cast to int64 on both sides."""
    from ..tabular import join as join_route, topk

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"], split=True)

    def qty_partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "q": batch["l_quantity"].to_numpy(zero_copy_only=False),
            }
        )
        return df.groupby("o_orderkey", as_index=False)["q"].sum()

    per_order = grouped_aggregate(
        li.map_batches(qty_partial, batch_format="pyarrow"),
        ["o_orderkey"],
        {"q": ("sum", "q")},
    )

    def keep_big(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["q"] > _Q18_MIN_QTY]
        return df.assign(sum_qty=df["q"].astype(np.int64))[["o_orderkey", "sum_qty"]]

    big = per_order.map_batches(keep_big, batch_format="pandas")

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        split=True,
    )
    j1, _ = join_route(orders, big, on="o_orderkey")

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"], split=True)

    def key_cust(batch: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": batch["c_custkey"], "c_name": batch["c_name"]})

    j2, _ = join_route(j1, cust.map_batches(key_cust, batch_format="pyarrow"), on="o_custkey")
    top = topk(
        j2, ["o_totalprice", "o_orderdate", "o_orderkey"], 100, descending=[True, False, False]
    ).to_pandas()
    return top[["c_name", "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"]].reset_index(
        drop=True
    )


SQL_Q18 = f"""
SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(sum(l.l_quantity) AS BIGINT) AS sum_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
HAVING sum(l.l_quantity) > {_Q18_MIN_QTY}
ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
LIMIT 100
"""


_Q4_FROM = "1997-07-01"
_Q4_TO = "1997-10-01"


def q_q4_order_priority(sf_dir: str):
    """TPC-H-Q4-shaped EXISTS semi-join: orders placed in one quarter
    that had at least one line shipped AFTER the order date, counted per
    priority class (the commit/receipt columns aren't in this schema, so
    the late-line predicate substitutes — same correlated-EXISTS plan).

    The EXISTS rewrites to an aggregate semi-join: lineitem pre-reduces
    per orderkey to max(l_shipdate) inside each batch (combiner), folds
    through the open-domain exchange, and the QUARTER-windowed order
    sliver joins it through the size-routed facade — the window side is
    the small one, so it broadcasts under budget and hash-exchanges
    above.  Priority counts finalize on the bounded 5-value domain."""
    from ..tabular import join as join_route

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"], split=True)

    def max_ship(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "ship": batch["l_shipdate"].to_numpy(zero_copy_only=False),
            }
        )
        return df.groupby("o_orderkey", as_index=False)["ship"].max()

    per_order = grouped_aggregate(
        li.map_batches(max_ship, batch_format="pyarrow"),
        ["o_orderkey"],
        {"ship": ("max", "ship")},
    )

    lo, hi = np.datetime64(_Q4_FROM, "us"), np.datetime64(_Q4_TO, "us")
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"], split=True
    )

    def window(batch: pa.Table) -> pa.Table:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((d >= lo) & (d < hi)))

    j, _ = join_route(per_order, orders.map_batches(window, batch_format="pyarrow"), on="o_orderkey")

    def late_only(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["ship"].to_numpy() > df["o_orderdate"].to_numpy()
        return df.loc[keep, ["o_orderpriority"]]

    out = grouped_aggregate(
        j.map_batches(late_only, batch_format="pandas"),
        ["o_orderpriority"],
        {"order_count": ("count", None)},
        small_keys=True,
    ).to_pandas()
    out["order_count"] = out["order_count"].astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


SQL_Q4 = f"""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{_Q4_FROM}'
  AND o.o_orderdate <  TIMESTAMP '{_Q4_TO}'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


_Q6_FROM = "1997-01-01"
_Q6_TO = "1998-01-01"


def q_q6_forecast_revenue(sf_dir: str):
    """TPC-H-Q6-shaped forecast: revenue delta from discounts in a band,
    one shipping year, small quantities — the pure filter-aggregate scan.

    Single streaming pass, zero shuffle: each batch reduces to ONE
    int64 partial in 1e-4-dollar units (price has 2 decimals, discount
    2, so price·10000·discount is an exact integer) and the partials
    fold through ``Dataset.sum``.  The only data leaving a worker is
    8 bytes per block — the canonical shape for a 100-TB filter-agg."""
    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        split=True,
    )
    lo, hi = np.datetime64(_Q6_FROM, "us"), np.datetime64(_Q6_TO, "us")

    def partial(batch: pa.Table) -> pd.DataFrame:
        d = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        keep = (d >= lo) & (d < hi) & (disc >= 0.02) & (disc <= 0.04) & (q < 24)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        units = np.round(price * 10000 * disc[keep]).astype(np.int64).sum()
        return pd.DataFrame({"u": [units]})

    total = li.map_batches(partial, batch_format="pyarrow").sum("u")
    return pd.DataFrame({"revenue": [np.round(total / 10000.0, 2)]})


SQL_Q6 = f"""
SELECT round(sum(CAST(round(l_extendedprice * 10000 * l_discount) AS BIGINT)) / 10000.0, 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{_Q6_FROM}'
  AND l_shipdate <  TIMESTAMP '{_Q6_TO}'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
"""


_Q7_N1 = 3
_Q7_N2 = 8
_Q7_FROM = "1998-01-01"
_Q7_TO = "2000-01-01"


def q_q7_volume_shipping(sf_dir: str):
    """TPC-H-Q7-shaped volume shipping: revenue between a NATION PAIR
    (supplier in one, customer in the other, both directions) per ship
    year over a two-year window.

    Supplier→nation and the pair-filtered customer→nation maps are
    dimensions (TPC-H size hierarchy) and broadcast once as pandas
    index lookups; lineitem pre-reduces per (orderkey, supp-nation,
    ship-year) INSIDE the batch so the one fact-fact exchange —
    lineitem⋈order-dimension on orderkey, via the size-routed
    :func:`tabular.join` facade — carries distinct keys, not lines.
    Revenue in exact 1e-4-dollar int64; the 2×2×2 final groupby
    finalizes on the bounded domain."""
    from ..tabular import join as join_route

    nat = read_table_arrow(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nname = {int(k): v for k, v in zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist())}

    sup = read_table_arrow(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    sk = sup["s_suppkey"].to_numpy().astype(np.int64)
    sn = sup["s_nationkey"].to_numpy().astype(np.int64)
    m = (sn == _Q7_N1) | (sn == _Q7_N2)
    smap_bc = Broadcast(pd.Series(sn[m], index=sk[m]))

    cust = read_table_arrow(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    ck = cust["c_custkey"].to_numpy().astype(np.int64)
    cn = cust["c_nationkey"].to_numpy().astype(np.int64)
    cm = (cn == _Q7_N1) | (cn == _Q7_N2)
    cmap_bc = Broadcast(pd.Series(cn[cm], index=ck[cm]))

    lo, hi = np.datetime64(_Q7_FROM, "us"), np.datetime64(_Q7_TO, "us")
    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        split=True,
    )

    def li_partial(batch: pa.Table) -> pd.DataFrame:
        d = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        b = batch.filter(pa.array((d >= lo) & (d < hi)))
        snat = smap_bc.get().reindex(b["l_suppkey"].to_numpy(zero_copy_only=False)).to_numpy()
        hit = ~np.isnan(snat)
        b = b.filter(pa.array(hit))
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.round(price * 10000 * (1.0 - disc)).astype(np.int64)
        yr = b["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[Y]").astype(np.int64) + 1970
        return (
            pd.DataFrame(
                {
                    "o_orderkey": b["l_orderkey"].to_numpy(zero_copy_only=False),
                    "supp_nat": snat[hit].astype(np.int64),
                    "l_year": yr,
                    "rev": rev,
                }
            )
            .groupby(["o_orderkey", "supp_nat", "l_year"], as_index=False)["rev"]
            .sum()
        )

    lrev = li.map_batches(li_partial, batch_format="pyarrow")

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"], split=True)

    def odim_fn(batch: pa.Table) -> pd.DataFrame:
        cnat = cmap_bc.get().reindex(batch["o_custkey"].to_numpy(zero_copy_only=False)).to_numpy()
        hit = ~np.isnan(cnat)
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy(zero_copy_only=False)[hit],
                "cust_nat": cnat[hit].astype(np.int64),
            }
        )

    odim = orders.map_batches(odim_fn, batch_format="pyarrow")
    j, _ = join_route(lrev, odim, on="o_orderkey")

    def pair_filter(df: pd.DataFrame) -> pd.DataFrame:
        keep = ((df["supp_nat"] == _Q7_N1) & (df["cust_nat"] == _Q7_N2)) | (
            (df["supp_nat"] == _Q7_N2) & (df["cust_nat"] == _Q7_N1)
        )
        return df.loc[keep, ["supp_nat", "cust_nat", "l_year", "rev"]]

    out = grouped_aggregate(
        j.map_batches(pair_filter, batch_format="pandas"),
        ["supp_nat", "cust_nat", "l_year"],
        {"rev": ("sum", "rev")},
        small_keys=True,
    ).to_pandas()
    out["supp_nation"] = out["supp_nat"].map(nname)
    out["cust_nation"] = out["cust_nat"].map(nname)
    out["revenue"] = np.round(out["rev"] / 10000.0, 2)
    return (
        out.sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)[["supp_nation", "cust_nation", "l_year", "revenue"]]
    )


SQL_Q7 = f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(extract(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       round(sum(CAST(round(l.l_extendedprice * 10000 * (1.0 - l.l_discount)) AS BIGINT)) / 10000.0, 2) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q7_FROM}'
  AND l.l_shipdate <  TIMESTAMP '{_Q7_TO}'
  AND ((s.s_nationkey = {_Q7_N1} AND c.c_nationkey = {_Q7_N2})
    OR (s.s_nationkey = {_Q7_N2} AND c.c_nationkey = {_Q7_N1}))
GROUP BY ns.n_name, nc.n_name, CAST(extract(year FROM l.l_shipdate) AS BIGINT)
ORDER BY supp_nation, cust_nation, l_year
"""


_Q8_REGION = "EUROPE"
_Q8_TYPE = "STANDARD"
_Q8_NATION = 3
_Q8_FROM = "1998-01-01"
_Q8_TO = "2000-01-01"


def q_q8_market_share(sf_dir: str):
    """TPC-H-Q8-shaped national market share: of the revenue for one
    part type sold to customers of one region over two years, the
    fraction supplied from one target nation, per order year.

    Dimension chain (type-filtered part keys, region-filtered customer
    keys, supplier→nation) broadcasts once and fuses into the two fact
    scans; lineitem pre-reduces per (orderkey, is-target-nation) so the
    fact-fact exchange (size-routed facade) carries two rows per
    distinct order at most.  Numerator and denominator accumulate as
    exact int64 1e-4-dollar units; the share divides once per year
    group (identical correctly-rounded IEEE division on both engines)
    and rounds to 6 places on both sides."""
    import pyarrow.compute as pc

    from ..tabular import join as join_route

    part = read_table_arrow(sf_dir, "part", columns=["p_partkey", "p_type"])
    pk_bc = Broadcast(
        part.filter(pc.equal(part["p_type"], _Q8_TYPE))["p_partkey"].combine_chunks().cast(pa.int64())
    )

    nat = read_table_arrow(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    reg = read_table_arrow(sf_dir, "region", columns=["r_regionkey", "r_name"])
    rkey = reg.filter(pc.equal(reg["r_name"], _Q8_REGION))["r_regionkey"][0].as_py()
    nkeys = nat.filter(pc.equal(nat["n_regionkey"], rkey))["n_nationkey"].to_numpy().astype(np.int64)

    cust = read_table_arrow(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    ck = cust["c_custkey"].to_numpy().astype(np.int64)
    cn = cust["c_nationkey"].to_numpy().astype(np.int64)
    ckeys_bc = Broadcast(pa.array(ck[np.isin(cn, nkeys)]))

    sup = read_table_arrow(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    smap_bc = Broadcast(
        pd.Series(
            sup["s_nationkey"].to_numpy().astype(np.int64),
            index=sup["s_suppkey"].to_numpy().astype(np.int64),
        )
    )

    lo, hi = np.datetime64(_Q8_FROM, "us"), np.datetime64(_Q8_TO, "us")
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"], split=True)

    def odim_fn(batch: pa.Table) -> pd.DataFrame:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        b = batch.filter(pa.array((d >= lo) & (d < hi)))
        inr = pc.is_in(b["o_custkey"], value_set=ckeys_bc.get())
        b = b.filter(inr)
        yr = b["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[Y]").astype(np.int64) + 1970
        return pd.DataFrame(
            {"o_orderkey": b["o_orderkey"].to_numpy(zero_copy_only=False), "o_year": yr}
        )

    odim = orders.map_batches(odim_fn, batch_format="pyarrow")

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
        split=True,
    )

    def li_partial(batch: pa.Table) -> pd.DataFrame:
        b = batch.filter(pc.is_in(batch["l_partkey"], value_set=pk_bc.get()))
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.round(price * 10000 * (1.0 - disc)).astype(np.int64)
        snat = smap_bc.get().reindex(b["l_suppkey"].to_numpy(zero_copy_only=False)).to_numpy()
        return (
            pd.DataFrame(
                {
                    "o_orderkey": b["l_orderkey"].to_numpy(zero_copy_only=False),
                    "tgt": (snat == _Q8_NATION).astype(np.int64),
                    "rev": rev,
                }
            )
            .groupby(["o_orderkey", "tgt"], as_index=False)["rev"]
            .sum()
        )

    lrev = li.map_batches(li_partial, batch_format="pyarrow")
    j, _ = join_route(lrev, odim, on="o_orderkey")
    per = grouped_aggregate(
        j, ["o_year", "tgt"], {"rev": ("sum", "rev")}, small_keys=True
    ).to_pandas()
    tot = per.groupby("o_year")["rev"].sum()
    tgt = per[per["tgt"] == 1].set_index("o_year")["rev"].reindex(tot.index).fillna(0).astype(np.int64)
    out = pd.DataFrame(
        {
            "o_year": tot.index.to_numpy().astype(np.int64),
            "mkt_share": np.round(tgt.to_numpy() / tot.to_numpy(), 6),
        }
    )
    return out.sort_values("o_year").reset_index(drop=True)


SQL_Q8 = f"""
SELECT CAST(extract(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       round(sum(CASE WHEN s.s_nationkey = {_Q8_NATION}
                      THEN CAST(round(l.l_extendedprice * 10000 * (1.0 - l.l_discount)) AS BIGINT)
                      ELSE 0 END)
             / sum(CAST(round(l.l_extendedprice * 10000 * (1.0 - l.l_discount)) AS BIGINT)), 6) AS mkt_share
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE r.r_name = '{_Q8_REGION}'
  AND p.p_type = '{_Q8_TYPE}'
  AND o.o_orderdate >= TIMESTAMP '{_Q8_FROM}'
  AND o.o_orderdate <  TIMESTAMP '{_Q8_TO}'
GROUP BY CAST(extract(year FROM o.o_orderdate) AS BIGINT)
ORDER BY o_year
"""


_Q12_FROM = "1998-01-01"
_Q12_TO = "1999-01-01"
_Q12_HIGH = ("1-URGENT", "2-HIGH")


def q_q12_priority_lines(sf_dir: str):
    """TPC-H-Q12-shaped priority split: lines shipped in one year,
    counted per line status, split into high-priority (urgent/high
    order) vs low-priority line counts — the fact-fact join with CASE
    aggregation (this schema has no shipmode, so line status keys the
    report; same plan shape).

    Lineitem pre-reduces per (orderkey, linestatus) counts inside each
    batch; the orders side projects to (orderkey, is_high) — both fact-
    sized, so the exchange routes through the size-routed facade
    (broadcast under budget, hash exchange above).  The CASE split is a
    vectorized multiply; the 2-value final groupby is bounded-domain."""
    from ..tabular import join as join_route

    lo, hi = np.datetime64(_Q12_FROM, "us"), np.datetime64(_Q12_TO, "us")
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linestatus", "l_shipdate"], split=True)

    def li_partial(batch: pa.Table) -> pd.DataFrame:
        d = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        b = batch.filter(pa.array((d >= lo) & (d < hi)))
        df = pd.DataFrame(
            {
                "o_orderkey": b["l_orderkey"].to_numpy(zero_copy_only=False),
                "l_linestatus": b["l_linestatus"].to_numpy(zero_copy_only=False),
            }
        )
        return (
            df.groupby(["o_orderkey", "l_linestatus"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    lcnt = li.map_batches(li_partial, batch_format="pyarrow")

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"], split=True)

    def odim_fn(batch: pa.Table) -> pd.DataFrame:
        pri = batch["o_orderpriority"].to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy(zero_copy_only=False),
                "is_high": np.isin(pri, list(_Q12_HIGH)).astype(np.int64),
            }
        )

    odim = orders.map_batches(odim_fn, batch_format="pyarrow")
    j, _ = join_route(lcnt, odim, on="o_orderkey")

    def split(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_linestatus": df["l_linestatus"],
                "h": df["n"] * df["is_high"],
                "l": df["n"] * (1 - df["is_high"]),
            }
        )

    out = grouped_aggregate(
        j.map_batches(split, batch_format="pandas"),
        ["l_linestatus"],
        {"high_line_count": ("sum", "h"), "low_line_count": ("sum", "l")},
        small_keys=True,
    ).to_pandas()
    out["high_line_count"] = out["high_line_count"].astype(np.int64)
    out["low_line_count"] = out["low_line_count"].astype(np.int64)
    return out.sort_values("l_linestatus").reset_index(drop=True)


SQL_Q12 = f"""
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q12_FROM}'
  AND l.l_shipdate <  TIMESTAMP '{_Q12_TO}'
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
"""


_Q13_CUTOFF = "2000-01-01"


def q_q13_order_counts(sf_dir: str):
    """TPC-H-Q13-shaped customer order-count distribution: how many
    customers placed exactly N orders on/after a cutoff date —
    including the zero bucket (the LEFT-JOIN semantics).

    Two-level aggregation: orders pre-reduce per custkey inside each
    batch, fold through the open-domain exchange, and the count
    HISTOGRAM finalizes on the bounded count domain.  The zero bucket
    is arithmetic — total customers from the parquet FOOTER (no data
    read) minus the number of per-customer groups — so the left join
    never materializes; at 100 TB that replaces a customer×orders
    outer exchange with one metadata probe."""
    import os

    import pyarrow.parquet as pq

    lo = np.datetime64(_Q13_CUTOFF, "us")
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate"], split=True)

    def per_cust(batch: pa.Table) -> pd.DataFrame:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"o_custkey": batch["o_custkey"].to_numpy(zero_copy_only=False)[d >= lo]})
        return df.groupby("o_custkey", as_index=False).size().rename(columns={"size": "n"})

    per = grouped_aggregate(
        orders.map_batches(per_cust, batch_format="pyarrow"),
        ["o_custkey"],
        {"c_count": ("sum", "n")},
    )
    hist = grouped_aggregate(
        per, ["c_count"], {"custdist": ("count", None)}, small_keys=True
    ).to_pandas()
    total_cust = pq.ParquetFile(os.path.join(sf_dir, "customer.parquet")).metadata.num_rows
    n_zero = total_cust - int(hist["custdist"].sum())
    if n_zero > 0:
        hist = pd.concat(
            [hist, pd.DataFrame({"c_count": [0], "custdist": [n_zero]})], ignore_index=True
        )
    hist["c_count"] = hist["c_count"].astype(np.int64)
    hist["custdist"] = hist["custdist"].astype(np.int64)
    return (
        hist.sort_values(["custdist", "c_count"], ascending=[False, False]).reset_index(drop=True)
    )


SQL_Q13 = f"""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_custkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{_Q13_CUTOFF}'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


_Q14_FROM = "1998-09-01"
_Q14_TO = "1998-10-01"


def q_q14_promo_revenue(sf_dir: str):
    """TPC-H-Q14-shaped promotion effect: percentage of one month's
    revenue from promo-type parts.

    The promo part-key set is a dimension and broadcasts once as a
    pre-built Arrow array; each lineitem batch reduces to TWO int64
    partials (promo revenue, total revenue, exact 1e-4-dollar units),
    so the exchange is 16 bytes per block.  One double division at the
    end, identical on both engines; rounded to 6 on both sides."""
    import pyarrow.compute as pc

    part = read_table_arrow(sf_dir, "part", columns=["p_partkey", "p_type"])
    promo_bc = Broadcast(
        part.filter(pc.equal(part["p_type"], "PROMO"))["p_partkey"].combine_chunks().cast(pa.int64())
    )

    lo, hi = np.datetime64(_Q14_FROM, "us"), np.datetime64(_Q14_TO, "us")
    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
        split=True,
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        d = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        b = batch.filter(pa.array((d >= lo) & (d < hi)))
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.round(price * 10000 * (1.0 - disc)).astype(np.int64)
        isp = pc.is_in(b["l_partkey"], value_set=promo_bc.get()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({"p": [rev[isp].sum()], "t": [rev.sum()]})

    parts = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    promo, total = int(parts["p"].sum()), int(parts["t"].sum())
    return pd.DataFrame({"promo_revenue": [np.round(100.0 * promo / total, 6)]})


SQL_Q14 = f"""
SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN CAST(round(l.l_extendedprice * 10000 * (1.0 - l.l_discount)) AS BIGINT)
                              ELSE 0 END)
             / sum(CAST(round(l.l_extendedprice * 10000 * (1.0 - l.l_discount)) AS BIGINT)), 6) AS promo_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q14_FROM}'
  AND l.l_shipdate <  TIMESTAMP '{_Q14_TO}'
"""


_Q15_FROM = "1997-01-01"
_Q15_TO = "1997-04-01"


def q_q15_top_supplier(sf_dir: str):
    """TPC-H-Q15-shaped top supplier: the supplier(s) with maximum
    revenue in one quarter (ties kept, per the spec's view + max plan).

    Suppliers are a dimension, so the per-supplier revenue fold uses
    the bounded-domain fast path (one int64 partial row per supplier
    per block, exact 1e-4-dollar units); max + tie filter + the name
    attach all happen on the supplier-sized result.  Nothing
    fact-sized leaves the workers."""
    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        split=True,
    )
    lo, hi = np.datetime64(_Q15_FROM, "us"), np.datetime64(_Q15_TO, "us")

    def partial(batch: pa.Table) -> pd.DataFrame:
        d = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        keep = (d >= lo) & (d < hi)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)[keep]
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[keep]
        rev = np.round(price * 10000 * (1.0 - disc)).astype(np.int64)
        return pd.DataFrame({"l_suppkey": sk, "r": rev}).groupby("l_suppkey", as_index=False)["r"].sum()

    per_supp = grouped_aggregate(
        li.map_batches(partial, batch_format="pyarrow"),
        ["l_suppkey"],
        {"r": ("sum", "r")},
        small_keys=True,
    ).to_pandas()
    best = per_supp[per_supp["r"] == per_supp["r"].max()]
    sup = read_table_arrow(sf_dir, "supplier", columns=["s_suppkey", "s_name"]).to_pandas()
    out = best.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    out["total_revenue"] = np.round(out["r"] / 10000.0, 2)
    return (
        out.sort_values("s_suppkey")[["s_suppkey", "s_name", "total_revenue"]].reset_index(drop=True)
    )


SQL_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(round(l_extendedprice * 10000 * (1.0 - l_discount)) AS BIGINT)) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_Q15_FROM}'
    AND l_shipdate <  TIMESTAMP '{_Q15_TO}'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, round(r.r / 10000.0, 2) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.r = (SELECT max(r) FROM revenue)
ORDER BY s.s_suppkey
"""


_Q16_EXCL_BRAND = "Brand#13"
_Q16_SIZES = (1, 5, 9, 14, 20, 28, 36, 45)


def q_q16_supplier_variety(sf_dir: str):
    """TPC-H-Q16-shaped supplier variety: distinct suppliers that
    shipped parts of each (brand, type, size) combination, over parts
    outside one brand and within a size set (no partsupp table in this
    schema — lineitem supplies the part↔supplier relation; same
    COUNT(DISTINCT) plan).

    Part attributes broadcast once as index lookups (dimension); each
    lineitem batch emits its DISTINCT (brand, type, size, suppkey)
    tuples — the per-batch combiner for a distinct-count — so the
    exchange is bounded by groups×suppliers, not line count.  The
    global dedupe folds through the open-domain exchange keyed on the
    full tuple; the final count per (brand, type, size) is a bounded-
    domain row count."""
    import pyarrow.compute as pc

    part = read_table_arrow(
        sf_dir, "part", columns=["p_partkey", "p_brand", "p_type", "p_size"]
    ).to_pandas()
    qual = part[(part["p_brand"] != _Q16_EXCL_BRAND) & (part["p_size"].isin(_Q16_SIZES))]
    pk = qual["p_partkey"].to_numpy().astype(np.int64)
    pk_bc = Broadcast(pa.array(pk))
    attr_bc = Broadcast(
        (
            pd.Series(qual["p_brand"].to_numpy(), index=pk),
            pd.Series(qual["p_type"].to_numpy(), index=pk),
            pd.Series(qual["p_size"].to_numpy().astype(np.int64), index=pk),
        )
    )

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"], split=True)

    def pairs(batch: pa.Table) -> pd.DataFrame:
        b = batch.filter(pc.is_in(batch["l_partkey"], value_set=pk_bc.get()))
        pkeys = b["l_partkey"].to_numpy(zero_copy_only=False)
        br, ty, sz = attr_bc.get()
        df = pd.DataFrame(
            {
                "p_brand": br.reindex(pkeys).to_numpy(),
                "p_type": ty.reindex(pkeys).to_numpy(),
                "p_size": sz.reindex(pkeys).to_numpy().astype(np.int64),
                "s": b["l_suppkey"].to_numpy(zero_copy_only=False),
            }
        )
        return df.drop_duplicates()

    distinct = grouped_aggregate(
        li.map_batches(pairs, batch_format="pyarrow"),
        ["p_brand", "p_type", "p_size", "s"],
        {"c": ("count", None)},
    )
    out = grouped_aggregate(
        distinct,
        ["p_brand", "p_type", "p_size"],
        {"supplier_cnt": ("count", None)},
        small_keys=True,
    ).to_pandas()
    out["supplier_cnt"] = out["supplier_cnt"].astype(np.int64)
    out["p_size"] = out["p_size"].astype(np.int64)
    return (
        out.sort_values(
            ["supplier_cnt", "p_brand", "p_type", "p_size"], ascending=[False, True, True, True]
        ).reset_index(drop=True)
    )


SQL_Q16 = f"""
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> '{_Q16_EXCL_BRAND}'
  AND p.p_size IN {_Q16_SIZES}
GROUP BY p.p_brand, p.p_type, CAST(p.p_size AS BIGINT)
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p_size
"""


_Q19_CLAUSES = (
    ("Brand#3", 1, 5, 1, 11),
    ("Brand#14", 1, 10, 10, 20),
    ("Brand#21", 1, 15, 20, 30),
)


def q_q19_special_revenue(sf_dir: str):
    """TPC-H-Q19-shaped discounted revenue: an OR of three
    (brand, size-range, quantity-range) conjunctions — the disjunctive
    multi-predicate scan (no container column in this schema; size
    stands in, same plan shape).

    Each clause's qualifying part-key set resolves driver-side against
    the part DIMENSION and broadcasts as a pre-built Arrow array; a
    single lineitem pass evaluates the three-way OR vectorized
    (``pc.is_in`` + quantity band per clause) and reduces to one int64
    partial per batch.  Zero shuffle."""
    import pyarrow.compute as pc

    part = read_table_arrow(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]).to_pandas()
    sets = []
    for brand, slo, shi, _qlo, _qhi in _Q19_CLAUSES:
        m = (part["p_brand"] == brand) & (part["p_size"] >= slo) & (part["p_size"] <= shi)
        sets.append(pa.array(part["p_partkey"].to_numpy()[m.to_numpy()].astype(np.int64)))
    sets_bc = Broadcast(tuple(sets))

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        split=True,
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(q), dtype=bool)
        for (_b, _slo, _shi, qlo, qhi), pkset in zip(_Q19_CLAUSES, sets_bc.get()):
            inset = pc.is_in(batch["l_partkey"], value_set=pkset).to_numpy(zero_copy_only=False)
            keep |= inset & (q >= qlo) & (q <= qhi)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[keep]
        units = np.round(price * 10000 * (1.0 - disc)).astype(np.int64).sum()
        return pd.DataFrame({"u": [units]})

    total = li.map_batches(partial, batch_format="pyarrow").sum("u")
    return pd.DataFrame({"revenue": [np.round(total / 10000.0, 2)]})


SQL_Q19 = f"""
SELECT round(sum(CAST(round(l.l_extendedprice * 10000 * (1.0 - l.l_discount)) AS BIGINT)) / 10000.0, 2) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE ({" OR ".join(
    f"(p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi} "
    f"AND l.l_quantity BETWEEN {qlo} AND {qhi})"
    for b, slo, shi, qlo, qhi in _Q19_CLAUSES
)})
"""


_Q22_CUTOFF = "2000-06-01"


def q_q22_dormant_customers(sf_dir: str):
    """TPC-H-Q22-shaped sales opportunity: customers with above-average
    positive account balance and NO orders on/after a cutoff, counted
    and totalled per nation (no phone column in this schema; the
    nation keys the report — same scalar-subquery + anti-join plan).

    The balance threshold computes once over the customer DIMENSION in
    exact integer cents (sum/100.0/count, the identical expression the
    oracle evaluates).  The anti-join's probe side — distinct custkeys
    with a recent order — pre-reduces per batch on the orders FACT
    scan and folds through the open-domain exchange; the drained
    keyset is customer-bounded (a dimension by the size hierarchy), so
    the exclusion is a vectorized isin on the dimension frame."""
    cust = read_table_arrow(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    ).to_pandas()
    bal = cust["c_acctbal"].to_numpy()
    cents = np.round(bal * 100).astype(np.int64)
    pos = bal > 0
    thr = (cents[pos].sum() / 100.0) / int(pos.sum())
    rich = cust[bal > thr]

    lo = np.datetime64(_Q22_CUTOFF, "us")
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate"], split=True)

    def active(batch: pa.Table) -> pd.DataFrame:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {"k": np.unique(batch["o_custkey"].to_numpy(zero_copy_only=False)[d >= lo])}
        )

    act = grouped_aggregate(
        orders.map_batches(active, batch_format="pyarrow"), ["k"], {"c": ("count", None)}
    ).to_pandas()

    dormant = rich[~rich["c_custkey"].isin(act["k"])]
    g = dormant.groupby("c_nationkey", as_index=False).agg(
        numcust=("c_custkey", "count"), bal_cents=("c_acctbal", "sum")
    )
    g["numcust"] = g["numcust"].astype(np.int64)
    g["totacctbal"] = np.round(
        np.array(
            [
                np.round(dormant.loc[dormant["c_nationkey"] == nk, "c_acctbal"].to_numpy() * 100)
                .astype(np.int64)
                .sum()
                for nk in g["c_nationkey"]
            ]
        )
        / 100.0,
        2,
    )
    g["c_nationkey"] = g["c_nationkey"].astype(np.int64)
    return g.sort_values("c_nationkey").reset_index(drop=True)[
        ["c_nationkey", "numcust", "totacctbal"]
    ]


SQL_Q22 = f"""
SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       round(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) / 100.0, 2) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (
    SELECT sum(CAST(round(c2.c_acctbal * 100) AS BIGINT)) / 100.0 / count(*)
    FROM customer c2 WHERE c2.c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}'
  )
GROUP BY c.c_nationkey
ORDER BY c_nationkey
"""


_Q2_REGION = "EUROPE"
_Q2_TYPE = "PROMO"
_Q2_MAX_SIZE = 25


def q_q2_min_cost_supplier(sf_dir: str):
    """TPC-H-Q2-shaped correlated-min join, re-targeted at this schema:
    there is no partsupp table, so the (part, supplier) supply relation
    is DERIVED from lineitem history and a pair's "supply cost" is its
    total billed cents; Q2's ``ps_supplycost = (SELECT min ...)``
    correlated subquery then picks, per qualifying part, the cheapest
    REGION supplier.

    Plan: the region-supplier keyset and the size/type part keyset are
    dimensions — both broadcast once as pre-built ``pa.array`` value
    sets and fuse into ONE lineitem pass that semi-filters and reduces
    exact integer-cent partials per (part, supplier).  The partials fold
    through the open-domain exchange; the surviving pair table is
    bounded by |qualifying parts| × |region suppliers| (dimension-sized
    at any corpus scale), so the correlated per-part min and the final
    4-column ordering finalize driver-side on that bounded set."""
    import pyarrow.compute as pc

    nat = read_table_arrow(sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = read_table_arrow(sf_dir, "region", columns=["r_regionkey", "r_name"])
    rkey = reg.filter(pc.equal(reg["r_name"], _Q2_REGION))["r_regionkey"][0].as_py()
    nat_in = nat.filter(pc.equal(nat["n_regionkey"], rkey))
    nname = pd.Series(
        nat_in["n_name"].to_pylist(),
        index=nat_in["n_nationkey"].to_numpy().astype(np.int64),
    )

    sup = read_table_arrow(
        sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]
    )
    sdf = sup.to_pandas()
    sdf["s_nationkey"] = sdf["s_nationkey"].astype(np.int64)
    sdf = sdf[sdf["s_nationkey"].isin(nname.index)]
    skeys_bc = Broadcast(pa.array(sdf["s_suppkey"].to_numpy(), type=pa.int64()))

    part = read_table_arrow(sf_dir, "part", columns=["p_partkey", "p_type", "p_size"])
    pqual = part.filter(
        pc.and_(
            pc.equal(part["p_type"], _Q2_TYPE),
            pc.less_equal(part["p_size"], _Q2_MAX_SIZE),
        )
    )
    pkeys_bc = Broadcast(pqual["p_partkey"].combine_chunks().cast(pa.int64()))

    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice"], split=True
    )

    def pair_partial(batch: pa.Table) -> pd.DataFrame:
        keep = pc.and_(
            pc.is_in(batch["l_partkey"], value_set=pkeys_bc.get()),
            pc.is_in(batch["l_suppkey"], value_set=skeys_bc.get()),
        )
        b = batch.filter(keep)
        cents = np.round(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "p_partkey": b["l_partkey"].to_numpy(zero_copy_only=False),
                    "s_suppkey": b["l_suppkey"].to_numpy(zero_copy_only=False),
                    "cost_cents": cents,
                }
            )
            .groupby(["p_partkey", "s_suppkey"], as_index=False)["cost_cents"]
            .sum()
        )

    pairs = grouped_aggregate(
        li.map_batches(pair_partial, batch_format="pyarrow"),
        ["p_partkey", "s_suppkey"],
        {"cost_cents": ("sum", "cost_cents")},
    ).to_pandas()

    mins = pairs.groupby("p_partkey")["cost_cents"].transform("min")
    win = pairs[pairs["cost_cents"] == mins].merge(sdf, on="s_suppkey")
    win["n_name"] = nname.reindex(win["s_nationkey"]).to_numpy()
    win["cost"] = np.round(win["cost_cents"].to_numpy() / 100.0, 2)
    win["p_partkey"] = win["p_partkey"].astype(np.int64)
    out = win.sort_values(
        ["s_acctbal", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True],
    ).head(100)
    return out[["s_acctbal", "s_name", "n_name", "p_partkey", "cost"]].reset_index(drop=True)


SQL_Q2 = f"""
WITH ps AS (
  SELECT l.l_partkey AS p_partkey, l.l_suppkey AS s_suppkey,
         sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cost_cents
  FROM lineitem l GROUP BY 1, 2
)
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, round(ps.cost_cents / 100.0, 2) AS cost
FROM ps
JOIN part p ON p.p_partkey = ps.p_partkey
JOIN supplier s ON s.s_suppkey = ps.s_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = '{_Q2_REGION}' AND p.p_type = '{_Q2_TYPE}' AND p.p_size <= {_Q2_MAX_SIZE}
  AND ps.cost_cents = (
    SELECT min(ps2.cost_cents)
    FROM ps ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.s_suppkey
    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
    WHERE r2.r_name = '{_Q2_REGION}' AND ps2.p_partkey = p.p_partkey
  )
ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
LIMIT 100
"""


_Q9_PATTERN = "widget"


def q_q9_product_profit(sf_dir: str):
    """TPC-H-Q9-shaped product-type profit: per (supplier nation, order
    year), the margin on every line whose part name matches a pattern.
    This schema has no partsupp, so ``p_retailprice`` stands in for
    ``ps_supplycost`` — same five-table star plan, same column shape.

    Plan: part→retail-cents and supplier→nation are dimension lookups
    (broadcast once, pre-built); one lineitem pass computes the exact
    1e-4-dollar margin (price and retail have 2 decimals, discount 2,
    quantity whole — every term integer) and pre-reduces per
    (orderkey, nation) INSIDE the batch, so the only fact-fact exchange
    — attaching the order year — moves one row per distinct key, not
    per line, through the size-routed join facade.  The (nation, year)
    finalize runs on a bounded 25×|years| domain."""
    import pyarrow.compute as pc

    from ..tabular import join as join_route

    part = read_table_arrow(sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"])
    pq = part.filter(pc.match_substring(part["p_name"], _Q9_PATTERN))
    retail = pd.Series(
        np.round(pq["p_retailprice"].to_numpy() * 100).astype(np.int64),
        index=pq["p_partkey"].to_numpy().astype(np.int64),
    )
    retail_bc = Broadcast(retail)

    sup = read_table_arrow(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    smap_bc = Broadcast(
        pd.Series(
            sup["s_nationkey"].to_numpy().astype(np.int64),
            index=sup["s_suppkey"].to_numpy().astype(np.int64),
        )
    )

    li = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
        split=True,
    )

    def profit_partial(batch: pa.Table) -> pd.DataFrame:
        r = retail_bc.get().reindex(batch["l_partkey"].to_numpy(zero_copy_only=False))
        m = r.notna().to_numpy()
        if not m.any():
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series([], dtype=np.int64),
                    "n_nationkey": pd.Series([], dtype=np.int64),
                    "amount_e4": pd.Series([], dtype=np.int64),
                }
            )
        cents = np.round(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m] * 100
        ).astype(np.int64)
        disc = np.round(batch["l_discount"].to_numpy(zero_copy_only=False)[m] * 100).astype(
            np.int64
        )
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)[m].astype(np.int64)
        amount = cents * (100 - disc) - r.to_numpy()[m].astype(np.int64) * 100 * qty
        nation = (
            smap_bc.get()
            .reindex(batch["l_suppkey"].to_numpy(zero_copy_only=False)[m])
            .to_numpy()
            .astype(np.int64)
        )
        return (
            pd.DataFrame(
                {
                    "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False)[m],
                    "n_nationkey": nation,
                    "amount_e4": amount,
                }
            )
            .groupby(["o_orderkey", "n_nationkey"], as_index=False)["amount_e4"]
            .sum()
        )

    partials = grouped_aggregate(
        li.map_batches(profit_partial, batch_format="pyarrow"),
        ["o_orderkey", "n_nationkey"],
        {"amount_e4": ("sum", "amount_e4")},
    )

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"], split=True)

    def year_of(batch: pa.Table) -> pa.Table:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        yr = d.astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({"o_orderkey": batch["o_orderkey"], "o_year": pa.array(yr)})

    j, _ = join_route(partials, orders.map_batches(year_of, batch_format="pyarrow"), on="o_orderkey")

    out = grouped_aggregate(
        j, ["n_nationkey", "o_year"], {"amount_e4": ("sum", "amount_e4")}, small_keys=True
    ).to_pandas()
    nat = read_table_arrow(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    names = pd.Series(
        nat["n_name"].to_pylist(), index=nat["n_nationkey"].to_numpy().astype(np.int64)
    )
    out["n_name"] = names.reindex(out["n_nationkey"].astype(np.int64)).to_numpy()
    out["profit"] = np.round(out["amount_e4"].to_numpy() / 10000.0, 2)
    out["o_year"] = out["o_year"].astype(np.int64)
    return (
        out.sort_values(["n_name", "o_year"], ascending=[True, False])
        .reset_index(drop=True)[["n_name", "o_year", "profit"]]
    )


SQL_Q9 = f"""
SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                 - CAST(round(p.p_retailprice * 100) AS BIGINT) * 100 * CAST(l.l_quantity AS BIGINT)) / 10000.0, 2) AS profit
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%{_Q9_PATTERN}%'
GROUP BY 1, 2
ORDER BY n.n_name, o_year DESC
"""


_Q11_NATIONS = 8
_Q11_FACTOR = 1.5


def q_q11_important_parts(sf_dir: str):
    """TPC-H-Q11-shaped important-stock scan: parts whose billed value
    from suppliers in a nation band exceeds a multiple of the band's
    MEAN per-part value — the global-scalar-subquery (HAVING > SELECT)
    plan.  No partsupp in this schema, so value is billed lineitem
    cents rather than availqty·supplycost; the mean-relative threshold
    replaces Q11's 0.0001/SF fraction so the selectivity is scale-free.

    Plan: the nation-band supplier keyset broadcasts; ONE lineitem pass
    semi-filters and reduces exact per-part cent partials; the partials
    fold through the open-domain exchange ONCE and the result (one row
    per part — dimension-bounded) is materialized so the grand-total
    fold and the threshold filter reuse the same blocks instead of
    re-running the scan."""
    import pyarrow.compute as pc

    sup = read_table_arrow(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    band = sup.filter(pc.less(sup["s_nationkey"], _Q11_NATIONS))
    skeys_bc = Broadcast(band["s_suppkey"].combine_chunks().cast(pa.int64()))

    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice"], split=True
    )

    def value_partial(batch: pa.Table) -> pd.DataFrame:
        b = batch.filter(pc.is_in(batch["l_suppkey"], value_set=skeys_bc.get()))
        cents = np.round(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return (
            pd.DataFrame(
                {"p_partkey": b["l_partkey"].to_numpy(zero_copy_only=False), "cents": cents}
            )
            .groupby("p_partkey", as_index=False)["cents"]
            .sum()
        )

    vals = grouped_aggregate(
        li.map_batches(value_partial, batch_format="pyarrow"),
        ["p_partkey"],
        {"cents": ("sum", "cents")},
    ).materialize()

    total = vals.sum("cents")
    nparts = vals.count()
    thr = (total / nparts) * _Q11_FACTOR

    def above(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["cents"], pa.scalar(thr)))

    out = vals.map_batches(above, batch_format="pyarrow").to_pandas()
    if "cents" not in out.columns:
        out = pd.DataFrame(
            {"p_partkey": pd.Series([], dtype=np.int64), "cents": pd.Series([], dtype=np.int64)}
        )
    out["value"] = np.round(out["cents"].to_numpy() / 100.0, 2)
    out["p_partkey"] = out["p_partkey"].astype(np.int64)
    return (
        out.sort_values(["value", "p_partkey"], ascending=[False, True])
        .reset_index(drop=True)[["p_partkey", "value"]]
    )


SQL_Q11 = f"""
WITH pv AS (
  SELECT l.l_partkey AS p_partkey,
         sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE s.s_nationkey < {_Q11_NATIONS}
  GROUP BY 1
)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey, round(cents / 100.0, 2) AS value
FROM pv
WHERE cents > (SELECT sum(cents) / count(*) FROM pv) * {_Q11_FACTOR}
ORDER BY value DESC, p_partkey
"""


_Q20_PATTERN = "bolt"
_Q20_FROM = "1997-01-01"
_Q20_TO = "1998-01-01"
_Q20_SHARE = 0.3


def q_q20_dominant_suppliers(sf_dir: str):
    """TPC-H-Q20-shaped nested semi-join: suppliers who, for SOME part
    matching a name pattern, shipped more than a SHARE of that part's
    total quantity in one year.  Q20's availqty-vs-half-demand
    comparison becomes share-of-demand (no partsupp here); the
    IN (SELECT ... correlated threshold) nesting is preserved.

    Plan: the pattern-part keyset broadcasts; one windowed lineitem
    pass reduces whole-number quantity partials per (part, supplier);
    per-part totals derive from THOSE partials (no second scan) on the
    pattern-bounded domain and broadcast back; the dominant-supplier
    filter then runs distributed over the pair table and only distinct
    supplier ids — dimension-bounded — reach the driver for the name
    attach and final sort."""
    import pyarrow.compute as pc

    part = read_table_arrow(sf_dir, "part", columns=["p_partkey", "p_name"])
    pq = part.filter(pc.match_substring(part["p_name"], _Q20_PATTERN))
    pkeys_bc = Broadcast(pq["p_partkey"].combine_chunks().cast(pa.int64()))

    lo, hi = np.datetime64(_Q20_FROM, "us"), np.datetime64(_Q20_TO, "us")
    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"], split=True
    )

    def qty_partial(batch: pa.Table) -> pd.DataFrame:
        d = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        b = batch.filter(
            pc.and_(
                pa.array((d >= lo) & (d < hi)),
                pc.is_in(batch["l_partkey"], value_set=pkeys_bc.get()),
            )
        )
        return (
            pd.DataFrame(
                {
                    "p_partkey": b["l_partkey"].to_numpy(zero_copy_only=False),
                    "s_suppkey": b["l_suppkey"].to_numpy(zero_copy_only=False),
                    "qty": b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64),
                }
            )
            .groupby(["p_partkey", "s_suppkey"], as_index=False)["qty"]
            .sum()
        )

    pairs = grouped_aggregate(
        li.map_batches(qty_partial, batch_format="pyarrow"),
        ["p_partkey", "s_suppkey"],
        {"qty": ("sum", "qty")},
    ).materialize()

    totals = grouped_aggregate(
        pairs, ["p_partkey"], {"tq": ("sum", "qty")}, small_keys=True
    ).to_pandas()
    tq_bc = Broadcast(
        pd.Series(totals["tq"].to_numpy(), index=totals["p_partkey"].to_numpy())
    )

    def dominant(batch: pa.Table) -> pd.DataFrame:
        tq = tq_bc.get().reindex(batch["p_partkey"].to_numpy(zero_copy_only=False)).to_numpy()
        keep = batch["qty"].to_numpy(zero_copy_only=False) > _Q20_SHARE * tq
        return pd.DataFrame(
            {"s_suppkey": np.unique(batch["s_suppkey"].to_numpy(zero_copy_only=False)[keep])}
        )

    supp_ids = grouped_aggregate(
        pairs.map_batches(dominant, batch_format="pyarrow"),
        ["s_suppkey"],
        {"c": ("count", None)},
        small_keys=True,
    ).to_pandas()

    sup = read_table_arrow(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    names = pd.Series(
        sup["s_name"].to_pylist(), index=sup["s_suppkey"].to_numpy().astype(np.int64)
    )
    out = pd.DataFrame(
        {"s_name": names.reindex(supp_ids["s_suppkey"].astype(np.int64)).to_numpy()}
    )
    return out.sort_values("s_name").reset_index(drop=True)


SQL_Q20 = f"""
WITH pq AS (
  SELECT l.l_partkey AS p, l.l_suppkey AS s, sum(CAST(l.l_quantity AS BIGINT)) AS q
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '{_Q20_FROM}' AND l.l_shipdate < TIMESTAMP '{_Q20_TO}'
    AND l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%{_Q20_PATTERN}%')
  GROUP BY 1, 2
),
pt AS (SELECT p, sum(q) AS tq FROM pq GROUP BY 1)
SELECT DISTINCT s.s_name
FROM pq JOIN pt USING (p) JOIN supplier s ON s.s_suppkey = pq.s
WHERE pq.q > {_Q20_SHARE} * pt.tq
ORDER BY s.s_name
"""


_Q21_LATE_DAYS = 60
_Q21_NATIONS = 13


def q_q21_waiting_suppliers(sf_dir: str):
    """TPC-H-Q21-shaped double-EXISTS anti-join: for finalized orders,
    count per supplier the multi-supplier orders where THIS supplier was
    the only late one.  No commit/receipt dates in this schema, so
    "late" is shipping more than LATE_DAYS after the order date — the
    EXISTS(other supplier) AND NOT EXISTS(other LATE supplier) plan is
    preserved.

    Plan: lineitem pre-reduces per (order, supplier) to max(shipdate)
    — one row per pair — and that pair table joins the F-status order
    dates through the size-routed facade (the one fact-fact exchange).
    The double EXISTS collapses into a per-order aggregate: n_supp,
    n_late, and sum(late·suppkey) (which IS the lone late supplier's id
    when n_late = 1), so no self-join runs.  Per-supplier counts
    finalize on the dimension-bounded supplier domain."""
    from ..tabular import join as join_route

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"], split=True)

    def max_ship(batch: pa.Table) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                    "s_suppkey": batch["l_suppkey"].to_numpy(zero_copy_only=False),
                    "ms": batch["l_shipdate"].to_numpy(zero_copy_only=False),
                }
            )
            .groupby(["o_orderkey", "s_suppkey"], as_index=False)["ms"]
            .max()
        )

    pairs = grouped_aggregate(
        li.map_batches(max_ship, batch_format="pyarrow"),
        ["o_orderkey", "s_suppkey"],
        {"ms": ("max", "ms")},
    )

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderstatus"], split=True
    )

    def final_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = batch.filter(pc.equal(batch["o_orderstatus"], "F"))
        return b.select(["o_orderkey", "o_orderdate"])

    j, _ = join_route(pairs, orders.map_batches(final_only, batch_format="pyarrow"), on="o_orderkey")

    late_delta = np.timedelta64(_Q21_LATE_DAYS, "D")

    def late_flags(df: pd.DataFrame) -> pd.DataFrame:
        late = (
            df["ms"].to_numpy() > df["o_orderdate"].to_numpy() + late_delta
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy().astype(np.int64),
                "late": late,
                "late_sk": late * df["s_suppkey"].to_numpy().astype(np.int64),
            }
        )

    stats = grouped_aggregate(
        j.map_batches(late_flags, batch_format="pandas"),
        ["o_orderkey"],
        {"n_supp": ("count", None), "n_late": ("sum", "late"), "late_sk": ("sum", "late_sk")},
    )

    def lone_late(df: pd.DataFrame) -> pd.DataFrame:
        keep = (df["n_supp"].to_numpy() >= 2) & (df["n_late"].to_numpy() == 1)
        return pd.DataFrame({"late_sk": df["late_sk"].to_numpy()[keep].astype(np.int64)})

    waits = grouped_aggregate(
        stats.map_batches(lone_late, batch_format="pandas"),
        ["late_sk"],
        {"numwait": ("count", None)},
    ).to_pandas()

    sup = read_table_arrow(sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey"])
    sdf = sup.to_pandas()
    sdf["s_suppkey"] = sdf["s_suppkey"].astype(np.int64)
    out = waits.merge(sdf, left_on="late_sk", right_on="s_suppkey")
    out = out[out["s_nationkey"].astype(np.int64) < _Q21_NATIONS]
    out["numwait"] = out["numwait"].astype(np.int64)
    out = out.sort_values(["numwait", "s_name"], ascending=[False, True]).head(100)
    return out[["s_name", "numwait"]].reset_index(drop=True)


SQL_Q21 = f"""
WITH ls AS (
  SELECT l_orderkey AS ok, l_suppkey AS sk, max(l_shipdate) AS ms
  FROM lineitem GROUP BY 1, 2
),
j AS (
  SELECT ls.ok, ls.sk, ls.ms, o.o_orderdate AS od
  FROM ls JOIN orders o ON o.o_orderkey = ls.ok
  WHERE o.o_orderstatus = 'F'
),
st AS (
  SELECT ok, count(*) AS n_supp,
         sum(CASE WHEN ms > od + INTERVAL {_Q21_LATE_DAYS} DAY THEN 1 ELSE 0 END) AS n_late,
         sum(CASE WHEN ms > od + INTERVAL {_Q21_LATE_DAYS} DAY THEN sk ELSE 0 END) AS late_sk
  FROM j GROUP BY 1
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM st JOIN supplier s ON s.s_suppkey = st.late_sk
WHERE st.n_supp >= 2 AND st.n_late = 1 AND s.s_nationkey < {_Q21_NATIONS}
GROUP BY 1
ORDER BY numwait DESC, s.s_name
LIMIT 100
"""


# ---------------------------------------------------------------------------
# BM25 ranked retrieval over the documents corpus
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "join", "hash", "scan")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20


def _bm25_term_freqs(texts, terms) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-doc term frequencies + doc lengths for one batch:
    one Arrow split, then per-term boolean mask + offset-windowed cumsum
    — no Python loop over docs or tokens."""
    import pyarrow.compute as pc

    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    split = pc.split_pattern(arr, " ")
    offs = np.asarray(split.offsets)
    dl = (offs[1:] - offs[:-1]).astype(np.int64)
    tf = np.empty((len(terms), dl.size), dtype=np.int64)
    for i, term in enumerate(terms):
        m = pc.equal(split.values, term).to_numpy(zero_copy_only=False).astype(np.int64)
        c = np.concatenate([[0], np.cumsum(m)])
        tf[i] = c[offs[1:]] - c[offs[:-1]]
    return tf, dl


def q_bm25_search(sf_dir: str):
    """BM25 ranked retrieval (Lucene idf variant, k1=1.2, b=0.75) for a
    fixed term query over the documents corpus — the sparse-retrieval
    scorer complementing the dense ``rag_index_search`` path.

    Two streaming passes, nothing materializes: pass 1 folds bounded
    per-batch partials (doc count, total length, per-term doc
    frequencies — ONE row per block) into global idf/avgdl; those
    broadcast once and pass 2 re-reads the corpus, scores each batch
    with the vectorized tf kernel, and keeps a per-batch top-k so only
    blocks × k candidate rows reach the driver's final cut.  Scores are
    float64 rounded to 6 dp on BOTH engines before the (score desc,
    doc_id) cut, so the top-k boundary is deterministic."""
    terms = list(_BM25_TERMS)
    k1, b = _BM25_K1, _BM25_B

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def stats_partial(batch: pa.Table) -> pa.Table:
        tf, dl = _bm25_term_freqs(batch["text"], terms)
        row: dict = {"n": [dl.size], "sum_dl": [int(dl.sum())]}
        for i in range(len(terms)):
            row[f"df{i}"] = [int((tf[i] > 0).sum())]
        return pa.table(row)

    stats = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas().sum()
    n = float(stats["n"])
    avgdl = float(stats["sum_dl"]) / n
    df = np.asarray([stats[f"df{i}"] for i in range(len(terms))], dtype=np.float64)
    idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
    handle = Broadcast((idf, avgdl))

    def score(batch: pa.Table) -> pd.DataFrame:
        idf_vec, avg = handle.get()
        tf, dl = _bm25_term_freqs(batch["text"], terms)
        tff = tf.astype(np.float64)
        denom = tff + k1 * (1.0 - b + b * dl.astype(np.float64) / avg)
        s = np.round((idf_vec[:, None] * tff * (k1 + 1.0) / denom).sum(axis=0), 6)
        keep = s > 0.0
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)[keep]
        s = s[keep]
        order = np.lexsort((ids, -s))[:_BM25_TOPK]
        return pd.DataFrame({"doc_id": ids[order], "score": s[order]})

    cands = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    cands = cands.sort_values(["score", "doc_id"], ascending=[False, True])
    return cands.head(_BM25_TOPK).reset_index(drop=True)


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)

SQL_BM25 = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT avg(dl) AS avgdl, (SELECT count(*) FROM documents) AS n FROM dl),
qt AS (SELECT unnest([{_BM25_TERMS_SQL}]) AS term),
df AS (SELECT t.tok AS term, count(DISTINCT t.doc_id) AS df
       FROM toks t JOIN qt ON qt.term = t.tok GROUP BY 1),
tf AS (SELECT t.doc_id, t.tok AS term, count(*) AS tf
       FROM toks t JOIN qt ON qt.term = t.tok GROUP BY 1, 2),
scores AS (
  SELECT tf.doc_id,
         sum(ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * tf.tf * ({_BM25_K1} + 1.0)
             / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / s.avgdl))) AS s
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 6) AS score
FROM scores ORDER BY round(s, 6) DESC, doc_id LIMIT {_BM25_TOPK}
"""


