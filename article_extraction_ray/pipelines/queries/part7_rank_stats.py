"""Query registry part7 rank stats — assembled into the
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
# Rank statistics: Mann-Whitney U, Spearman correlation, Kaplan-Meier
# ---------------------------------------------------------------------------

_MW_BASE = "view"  # baseline arm for the rank-sum tests


def q_mann_whitney(sf_dir: str):
    """Mann-Whitney U (Wilcoxon rank-sum) test of each event type's
    value distribution against the '{base}' baseline — the
    nonparametric sibling of `ab_ttest` for metrics whose distribution
    a t-test mis-models (heavy tails, bounded supports).

    Values are cent-quantized (x100, round) on BOTH engines so ranks
    are over a discrete support; the distributed part reduces
    (event_type, cents) counts — support-bounded, not row-bounded.
    Mid-ranks are computed exactly in doubled-integer space
    (2·midrank = 2·cum_less + tied + 1), so U is an exact half-integer
    on both sides; the tie-corrected normal z uses the identical
    float operation sequence as the SQL mirror.  |z| > 1.96 rejects
    at alpha = 0.05."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        cents = np.round(batch["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return (
            pd.DataFrame({"event_type": batch["event_type"].to_pandas(), "v": cents})
            .groupby(["event_type", "v"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )

    counts = (
        grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["event_type", "v"],
            {"c": ("sum", "c")},
            small_keys=True,
        )
        .to_pandas()
    )
    base = counts[counts["event_type"] == _MW_BASE].set_index("v")["c"].sort_index()
    rows = []
    for et in sorted(counts["event_type"].unique()):
        if et == _MW_BASE:
            continue
        a = counts[counts["event_type"] == et].set_index("v")["c"].sort_index()
        support = base.index.union(a.index)
        ca = a.reindex(support, fill_value=0).to_numpy(dtype=np.int64)
        ct = ca + base.reindex(support, fill_value=0).to_numpy(dtype=np.int64)
        cumlt = np.concatenate(([0], np.cumsum(ct)[:-1]))
        na, n = int(ca.sum()), int(ct.sum())
        nb = n - na
        r2 = int((ca * (2 * cumlt + ct + 1)).sum())  # 2·(rank-sum of arm a)
        ties = int((ct.astype(np.int64) ** 3 - ct).sum())
        u = (r2 - na * (na + 1)) / 2.0
        var = na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1.0)))
        z = (u - na * nb / 2.0) / np.sqrt(var) if var > 0 else float("nan")
        rows.append(
            {"event_type": et, "n_a": na, "n_b": nb,
             "u_stat": round(u, 6), "z": round(float(z), 6),
             "reject": bool(abs(z) > 1.96) if var > 0 else False}
        )
    out = pd.DataFrame(rows)
    out[["n_a", "n_b"]] = out[["n_a", "n_b"]].astype(np.int64)
    return out


q_mann_whitney.__doc__ = q_mann_whitney.__doc__.format(base=_MW_BASE)


SQL_MANN_WHITNEY = f"""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v, count(*) AS c
  FROM events GROUP BY 1, 2
),
pairs AS (SELECT DISTINCT event_type AS et FROM c WHERE event_type <> '{_MW_BASE}'),
comb AS (
  SELECT p.et, c.v,
         sum(CASE WHEN c.event_type = p.et THEN c.c ELSE 0 END) AS ca,
         sum(c.c) AS ct
  FROM pairs p JOIN c ON c.event_type IN (p.et, '{_MW_BASE}')
  GROUP BY 1, 2
),
w AS (
  SELECT et, v, ca, ct,
         coalesce(sum(ct) OVER (PARTITION BY et ORDER BY v
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumlt
  FROM comb
),
agg AS (
  SELECT et, CAST(sum(ca) AS BIGINT) AS na,
         CAST(sum(ct) - sum(ca) AS BIGINT) AS nb,
         CAST(sum(ct) AS BIGINT) AS n,
         CAST(sum(ca * (2 * cumlt + ct + 1)) AS BIGINT) AS r2,
         CAST(sum(ct * ct * ct - ct) AS BIGINT) AS ties
  FROM w GROUP BY 1
)
SELECT et AS event_type, na AS n_a, nb AS n_b,
       round((r2 - na * (na + 1)) / 2.0, 6) AS u_stat,
       CASE WHEN na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1.0))) > 0
            THEN round(((r2 - na * (na + 1)) / 2.0 - na * nb / 2.0)
                 / sqrt(na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1.0)))), 6)
            ELSE NULL END AS z,
       CASE WHEN na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1.0))) > 0
            THEN abs(((r2 - na * (na + 1)) / 2.0 - na * nb / 2.0)
                 / sqrt(na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1.0))))) > 1.96
            ELSE FALSE END AS reject
FROM agg
"""


def q_spearman_corr(sf_dir: str):
    """Spearman rank correlation of l_quantity vs l_discount per
    l_returnflag — the monotonic-association readout Pearson misses
    when the relationship is nonlinear.

    Both variables have tiny discrete supports (quantity 1-50,
    discount 0-10 cents), so the distributed part reduces a JOINT
    contingency table per flag (≤ 50×11 cells) — the row data never
    leaves the cluster.  Marginal mid-ranks are exact in
    doubled-integer space (2·midrank); Pearson over the doubled ranks
    equals Pearson over the ranks (scale invariance), so every sum in
    the correlation is an exact int64 and only the final division
    rounds.  SQL mirrors cell-for-cell."""
    ds = read_table(
        sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_discount"], split=True
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        q = np.round(batch["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        d = np.round(batch["l_discount"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return (
            pd.DataFrame(
                {"flag": batch["l_returnflag"].to_pandas(), "q": q, "d": d}
            )
            .groupby(["flag", "q", "d"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )

    cells = (
        grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["flag", "q", "d"],
            {"c": ("sum", "c")},
            small_keys=True,
        )
        .to_pandas()
    )
    rows = []
    for flag, grp in cells.groupby("flag", sort=True):
        n = int(grp["c"].sum())

        def midrank2(marg: pd.Series) -> dict:
            marg = marg.sort_index()
            cnt = marg.to_numpy(dtype=np.int64)
            cumlt = np.concatenate(([0], np.cumsum(cnt)[:-1]))
            return dict(zip(marg.index, 2 * cumlt + cnt + 1))

        rx = midrank2(grp.groupby("q")["c"].sum())
        ry = midrank2(grp.groupby("d")["c"].sum())
        c = grp["c"].to_numpy(dtype=np.int64)
        R = grp["q"].map(rx).to_numpy(dtype=np.int64)
        S = grp["d"].map(ry).to_numpy(dtype=np.int64)
        # cell sums stay exact int64 (max ~4e15/cell at sf0.1); the
        # final algebra runs in DOUBLE with the identical op order as
        # SQL — sr*sr as INT64 overflows in DuckDB at sf0.1 (4e10)^2
        sr, ss = float((c * R).sum()), float((c * S).sum())
        srr, sss = float((c * R * R).sum()), float((c * S * S).sum())
        srs = float((c * R * S).sum())
        num = srs - sr * ss / n
        den = np.sqrt((srr - sr * sr / n) * (sss - ss * ss / n))
        rho = num / den if den > 0 else float("nan")
        rows.append({"l_returnflag": flag, "n": n, "rho": round(float(rho), 6)})
    out = pd.DataFrame(rows)
    out["n"] = out["n"].astype(np.int64)
    return out


SQL_SPEARMAN_CORR = """
WITH cell AS (
  SELECT l_returnflag AS flag, CAST(round(l_quantity) AS BIGINT) AS q,
         CAST(round(l_discount * 100) AS BIGINT) AS d, count(*) AS c
  FROM lineitem GROUP BY 1, 2, 3
),
mx AS (
  SELECT flag, q,
         2 * coalesce(sum(sum(c)) OVER (PARTITION BY flag ORDER BY q
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + sum(c) + 1 AS r2
  FROM cell GROUP BY flag, q
),
my AS (
  SELECT flag, d,
         2 * coalesce(sum(sum(c)) OVER (PARTITION BY flag ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + sum(c) + 1 AS s2
  FROM cell GROUP BY flag, d
),
agg AS (
  SELECT cell.flag, CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(c * r2) AS BIGINT) AS sr, CAST(sum(c * s2) AS BIGINT) AS ss,
         CAST(sum(c * r2 * r2) AS BIGINT) AS srr,
         CAST(sum(c * s2 * s2) AS BIGINT) AS sss,
         CAST(sum(c * r2 * s2) AS BIGINT) AS srs
  FROM cell
  JOIN mx ON mx.flag = cell.flag AND mx.q = cell.q
  JOIN my ON my.flag = cell.flag AND my.d = cell.d
  GROUP BY 1
)
SELECT flag AS l_returnflag, n,
       CASE WHEN (CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * sr / n)
               * (CAST(sss AS DOUBLE) - CAST(ss AS DOUBLE) * ss / n) > 0
            THEN round((CAST(srs AS DOUBLE) - CAST(sr AS DOUBLE) * ss / n)
                 / sqrt((CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * sr / n)
                      * (CAST(sss AS DOUBLE) - CAST(ss AS DOUBLE) * ss / n)), 6)
            ELSE NULL END AS rho
FROM agg
"""


_KM_HORIZON_DAYS = 180  # last order within this window of max date => censored


def q_kaplan_meier(sf_dir: str):
    """Kaplan-Meier survival curve over customer order-activity
    lifetimes: duration = days between a customer's first and last
    order, censored when the last order falls within {h} days of the
    dataset's max order date (the customer may still be active).

    The distributed parts are a per-customer (min, max) grouped
    aggregate and a (duration, event) count reduce whose output is
    bounded by the day-range of the data — the KM sweep itself runs
    over that tiny table.  n_at_risk counts censored-at-t customers
    as at risk at t (the standard deaths-before-censoring
    convention).  Survival is exp(Σ ln(1-d/n)) on BOTH engines (same
    summation order, ascending t) and exactly 0 when d == n; rows are
    emitted only at event times."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate"], split=True)

    def span(batch: pa.Table) -> pd.DataFrame:
        us = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        day = us // 86_400_000_000
        return (
            pd.DataFrame({"k": batch["o_custkey"].to_numpy(zero_copy_only=False), "d": day})
            .groupby("k", as_index=False)
            .agg(first=("d", "min"), last=("d", "max"))
        )

    spans = (
        grouped_aggregate(
            ds.map_batches(span, batch_format="pyarrow"),
            ["k"],
            {"first": ("min", "first"), "last": ("max", "last")},
        )
        .to_pandas()
    )
    max_day = int(spans["last"].max())
    dur = (spans["last"] - spans["first"]).to_numpy(dtype=np.int64)
    event = (spans["last"].to_numpy(dtype=np.int64) < max_day - _KM_HORIZON_DAYS)
    tbl = (
        pd.DataFrame({"t": dur, "e": event.astype(np.int64)})
        .groupby("t", as_index=False)
        .agg(d=("e", "sum"), a=("e", "count"))
        .sort_values("t")
    )
    total = int(tbl["a"].sum())
    at_risk = total - np.concatenate(([0], np.cumsum(tbl["a"].to_numpy())[:-1]))
    d = tbl["d"].to_numpy(dtype=np.int64)
    keep = d > 0
    n_i, d_i, t_i = at_risk[keep], d[keep], tbl["t"].to_numpy()[keep]
    frac = 1.0 - d_i / n_i
    logs = np.where(frac > 0, np.log(np.where(frac > 0, frac, 1.0)), 0.0)
    surv = np.exp(np.cumsum(logs))
    dead = np.cumsum(d_i == n_i) > 0  # once everyone at risk dies, S == 0
    surv = np.where(dead, 0.0, surv)
    out = pd.DataFrame(
        {"t_days": t_i, "n_risk": n_i, "n_events": d_i,
         "survival": np.round(surv, 6)}
    )
    out[["t_days", "n_risk", "n_events"]] = out[["t_days", "n_risk", "n_events"]].astype(np.int64)
    return out


q_kaplan_meier.__doc__ = q_kaplan_meier.__doc__.format(h=_KM_HORIZON_DAYS)


SQL_KAPLAN_MEIER = f"""
WITH span AS (
  SELECT o_custkey,
         CAST(epoch_us(min(o_orderdate)) // 86400000000 AS BIGINT) AS first,
         CAST(epoch_us(max(o_orderdate)) // 86400000000 AS BIGINT) AS last
  FROM orders GROUP BY 1
),
mx AS (SELECT max(last) AS max_day FROM span),
life AS (
  SELECT s.last - s.first AS t,
         CASE WHEN s.last < m.max_day - {_KM_HORIZON_DAYS} THEN 1 ELSE 0 END AS e
  FROM span s CROSS JOIN mx m
),
tbl AS (SELECT t, sum(e) AS d, count(*) AS a FROM life GROUP BY 1),
risk AS (
  SELECT t, d,
         (SELECT sum(a) FROM tbl) -
         coalesce(sum(a) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS n
  FROM tbl
),
ev AS (SELECT t, d, n FROM risk WHERE d > 0),
curve AS (
  SELECT t, n, d,
         exp(sum(CASE WHEN d < n THEN ln(1.0 - d / CAST(n AS DOUBLE)) ELSE 0 END)
             OVER (ORDER BY t)) AS s_raw,
         max(CASE WHEN d = n THEN 1 ELSE 0 END) OVER (ORDER BY t) AS dead
  FROM ev
)
SELECT CAST(t AS BIGINT) AS t_days, CAST(n AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_events,
       round(CASE WHEN dead = 1 THEN 0.0 ELSE s_raw END, 6) AS survival
FROM curve
"""


# ---------------------------------------------------------------------------
# Phrase search, DP aggregates, cross-correlation
# ---------------------------------------------------------------------------

_PHRASE = ("merge", "slow")  # adjacent-token phrase under test


def q_phrase_search(sf_dir: str):
    """Positional phrase search: documents containing the exact
    adjacent-token phrase {phrase!r}, with per-document occurrence
    counts (overlapping occurrences count, Lucene PhraseQuery
    semantics).

    The scan is fused and embarrassingly parallel — no shuffle: each
    batch splits its texts once (Arrow kernel), then matches the
    phrase on the FLAT token array with numpy shift-compares
    (k-1 vector ANDs for a k-token phrase), masking positions whose
    window crosses a document boundary.  Occurrence counts come from
    one bincount over the flat→doc index.  At 100 TB this is the
    postings-adjacency plan with the index build fused into the read
    — nothing materializes but (doc_id, n_matches) hits."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)
    phrase = _PHRASE

    def scan(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        toks = pc.split_pattern(batch["text"], " ")
        la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = la.values
        off = la.offsets.to_numpy(zero_copy_only=False)
        lens = np.diff(off)
        k = len(phrase)
        n_flat = len(flat)
        if n_flat < k:
            return pd.DataFrame({"doc_id": [], "n_matches": []})
        m = pc.equal(flat, phrase[0]).to_numpy(zero_copy_only=False)[: n_flat - k + 1]
        for j, tok in enumerate(phrase[1:], start=1):
            mj = pc.equal(flat, tok).to_numpy(zero_copy_only=False)
            m = m & mj[j : n_flat - k + 1 + j]
        docidx = np.repeat(np.arange(len(lens)), lens)
        m = m & (docidx[: n_flat - k + 1] == docidx[k - 1 :])
        counts = np.bincount(docidx[: n_flat - k + 1][m], minlength=len(lens))
        hit = counts > 0
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)[hit]
        return pd.DataFrame(
            {"doc_id": ids.astype(np.int64), "n_matches": counts[hit].astype(np.int64)}
        )

    return ds.map_batches(scan, batch_format="pyarrow")


q_phrase_search.__doc__ = q_phrase_search.__doc__.format(phrase=" ".join(_PHRASE))


SQL_PHRASE_SEARCH = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
)
SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_matches
FROM toks a
JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.tok = '{_PHRASE[1]}'
WHERE a.tok = '{_PHRASE[0]}'
GROUP BY 1
"""


_DP_EPS = 1.0          # privacy budget per released statistic
_DP_CLIP_CENTS = 10_000  # value clipped to [0, 100.00] before the sum


def q_dp_aggregate(sf_dir: str):
    """Differentially-private per-event-type count and sum release:
    exact integer aggregates plus seeded Laplace noise at ε = {eps}
    (sensitivity 1 for the count; values clipped to [0, {clip}]
    cents for the sum, sensitivity = the clip bound).

    The noise is DETERMINISTIC — u ∈ (0,1) from the first 13 hex
    digits of md5(event_type:stat) (52 bits, exactly representable in
    a double), mapped through the Laplace inverse CDF — so the
    release is reproducible across retries/resume (a real pipeline
    would swap the seed source for a DRBG per release epoch; the
    plumbing — clip, exact reduce, per-group noise — is the
    at-scale shape).  SQL mirrors the hash and the inverse CDF
    exactly."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        cents = np.round(batch["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        cents = np.clip(cents, 0, _DP_CLIP_CENTS)
        return (
            pd.DataFrame({"event_type": batch["event_type"].to_pandas(), "c": cents})
            .groupby("event_type", as_index=False)
            .agg(n=("c", "count"), s=("c", "sum"))
        )

    stats = (
        grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["event_type"],
            {"n": ("sum", "n"), "s": ("sum", "s")},
            small_keys=True,
        )
        .to_pandas()
        .sort_values("event_type")
    )

    import hashlib

    def lap(key: str, b: float) -> float:
        h = int(hashlib.md5(key.encode()).hexdigest()[:13], 16)
        u = (h + 0.5) / 16**13
        return -b * np.sign(u - 0.5) * np.log(1.0 - 2.0 * abs(u - 0.5))

    rows = []
    for _, r in stats.iterrows():
        et = r["event_type"]
        rows.append(
            {
                "event_type": et,
                "dp_count": round(float(r["n"]) + lap(f"{et}:count", 1.0 / _DP_EPS), 6),
                "dp_sum_cents": round(
                    float(r["s"]) + lap(f"{et}:sum", _DP_CLIP_CENTS / _DP_EPS), 6
                ),
            }
        )
    return pd.DataFrame(rows)


q_dp_aggregate.__doc__ = q_dp_aggregate.__doc__.format(eps=_DP_EPS, clip=_DP_CLIP_CENTS)


SQL_DP_AGGREGATE = f"""
WITH agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(least(greatest(CAST(round(value * 100) AS BIGINT), 0),
                        {_DP_CLIP_CENTS})) AS BIGINT) AS s
  FROM events GROUP BY 1
),
noised AS (
  SELECT event_type, n, s,
         (('0x' || substr(md5(event_type || ':count'), 1, 13))::BIGINT + 0.5)
           / power(16, 13) AS uc,
         (('0x' || substr(md5(event_type || ':sum'), 1, 13))::BIGINT + 0.5)
           / power(16, 13) AS us
  FROM agg
)
SELECT event_type,
       round(n + (-(1.0 / {_DP_EPS}) * sign(uc - 0.5)
                  * ln(1.0 - 2.0 * abs(uc - 0.5))), 6) AS dp_count,
       round(s + (-({_DP_CLIP_CENTS} / {_DP_EPS}) * sign(us - 0.5)
                  * ln(1.0 - 2.0 * abs(us - 0.5))), 6) AS dp_sum_cents
FROM noised
"""


_XCORR_A, _XCORR_B = "click", "purchase"
_XCORR_MAX_LAG = 6


def q_xcorr_lags(sf_dir: str):
    """Cross-correlation between the '{a}' and '{b}' hourly volume
    series at lags 0..{maxlag} (does {a} activity lead {b}?) — the
    lead-lag probe behind every conversion-latency dashboard.

    Rides `_dense_hourly_counts`' bounded reduction; at lag k the
    Pearson corr of (a[t], b[t-k]) over the n-k overlapping hours is
    computed from exact integer sums (counts are ints), identical
    operation order to the SQL mirror; only the final corr rounds."""
    dense = _dense_hourly_counts(sf_dir)
    a = dense[dense["event_type"] == _XCORR_A].sort_values("hour")["x"].to_numpy(np.int64)
    b = dense[dense["event_type"] == _XCORR_B].sort_values("hour")["x"].to_numpy(np.int64)
    rows = []
    for k in range(_XCORR_MAX_LAG + 1):
        x = a[k:].astype(np.int64)
        y = b[: len(b) - k if k else len(b)].astype(np.int64)
        n = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxx, syy = int((x * x).sum()), int((y * y).sum())
        sxy = int((x * y).sum())
        num = sxy - sx * sy / n
        den = np.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
        rows.append(
            {"lag": k, "n_hours": n,
             "xcorr": round(float(num / den), 6) if den > 0 else float("nan")}
        )
    out = pd.DataFrame(rows)
    out[["lag", "n_hours"]] = out[["lag", "n_hours"]].astype(np.int64)
    return out


q_xcorr_lags.__doc__ = q_xcorr_lags.__doc__.format(
    a=_XCORR_A, b=_XCORR_B, maxlag=_XCORR_MAX_LAG
)


SQL_XCORR_LAGS = f"""
WITH {_SQL_DENSE_HOURLY},
lags AS (SELECT unnest(generate_series(0, {_XCORR_MAX_LAG})) AS lag),
joined AS (
  SELECT l.lag, CAST(a.x AS BIGINT) AS x, CAST(b.x AS BIGINT) AS y
  FROM lags l
  JOIN dense a ON a.event_type = '{_XCORR_A}'
  JOIN dense b ON b.event_type = '{_XCORR_B}' AND b.hour = a.hour - l.lag
),
agg AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM joined GROUP BY 1
)
SELECT lag, n AS n_hours,
       CASE WHEN (sxx - sx * sx / n) * (syy - sy * sy / n) > 0
            THEN round((sxy - sx * sy / n)
                 / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)
            ELSE NULL END AS xcorr
FROM agg
"""


# ---------------------------------------------------------------------------
# Media probe: header-only metadata across four container formats
# ---------------------------------------------------------------------------


def q_media_probe(sf_dir: str):
    """ffprobe-style header probe across a MIXED media corpus: each
    document becomes one of six real container formats by doc_id % 6
    (PNG with CRC-verified IHDR, GIF with logical screen descriptor +
    global color table, 24-bit BMP, PCM WAV, endian-alternating TIFF
    via a real IFD walk, MPEG-1 Layer III via the frame-header
    bitrate/sample-rate tables), and MediaProbeStage
    routes on magic bytes and parses ONLY headers — the decode-nothing
    classify-everything front stage a 100-TB multimodal pipeline runs
    before paying any decompression.  All planted metadata is closed
    form over doc_id, so the SQL oracle catches a single mis-parsed
    header in any of the four format branches."""
    from ...stages.multimodal import (
        _MP3_BITRATES,
        _MP3_RATES,
        MediaProbeStage,
        make_bmp,
        make_gif,
        make_mp3_frame,
        make_png,
        make_tiff,
        make_wav,
    )

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        payloads = []
        for i, t in zip(ids, texts):
            i = int(i)
            kind = i % 6
            if kind == 0:
                payloads.append(make_png(i % 31 + 1, i % 17 + 1, 8, 2))
            elif kind == 1:
                payloads.append(make_gif(i % 63 + 1, i % 29 + 1, 2 ** (i % 8 + 1)))
            elif kind == 2:
                payloads.append(make_bmp(i % 31 + 1, i % 17 + 1, (t or " ").encode()))
            elif kind == 3:
                payloads.append(
                    make_wav(8000 + (i % 5) * 1000, np.zeros(4, dtype=np.int16), i % 2 + 1)
                )
            elif kind == 4:
                payloads.append(make_tiff(i % 41 + 1, i % 23 + 1, big_endian=bool(i % 2)))
            else:
                payloads.append(
                    make_mp3_frame(_MP3_BITRATES[i % 14 + 1], _MP3_RATES[i % 3])
                )
        return pa.Table.from_arrays(
            [
                pa.array([str(int(i)) for i in ids], type=pa.string()),
                pa.array(["media"] * len(ids), type=pa.string()),
                pa.array(payloads, type=pa.large_binary()),
            ],
            names=["media_ref", "media_kind", "payload"],
        )

    media = ds.map_batches(to_media, batch_format="pyarrow")
    return media.map_batches(MediaProbeStage, batch_format="pyarrow", concurrency=(1, 4))


SQL_MEDIA_PROBE = """
SELECT CAST(doc_id AS VARCHAR) AS media_ref,
       CASE doc_id % 6 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' WHEN 2 THEN 'bmp'
                       WHEN 3 THEN 'wav' WHEN 4 THEN 'tiff' ELSE 'mp3'
       END AS format,
       CAST(CASE doc_id % 6
              WHEN 0 THEN doc_id % 31 + 1
              WHEN 1 THEN doc_id % 63 + 1
              WHEN 2 THEN doc_id % 31 + 1
              WHEN 3 THEN doc_id % 2 + 1
              WHEN 4 THEN doc_id % 41 + 1
              ELSE ([0,32,40,48,56,64,80,96,112,128,160,192,224,256,320])[doc_id % 14 + 2]
            END AS BIGINT) AS width,
       CAST(CASE doc_id % 6
              WHEN 0 THEN doc_id % 17 + 1
              WHEN 1 THEN doc_id % 29 + 1
              WHEN 2 THEN doc_id % 17 + 1
              WHEN 3 THEN 8000 + (doc_id % 5) * 1000
              WHEN 4 THEN doc_id % 23 + 1
              ELSE ([44100,48000,32000])[doc_id % 3 + 1]
            END AS BIGINT) AS height,
       CAST(CASE doc_id % 6
              WHEN 0 THEN 8
              WHEN 1 THEN power(2, doc_id % 8 + 1)
              WHEN 2 THEN 24
              WHEN 3 THEN 16
              WHEN 4 THEN 0
              ELSE 3 END AS BIGINT) AS depth
FROM documents
"""


# ---------------------------------------------------------------------------
# HLL set operations + isotonic (PAV) calibration
# ---------------------------------------------------------------------------

_HLL_SETOP_PAIRS = (("click", "purchase"), ("view", "signup"))


def q_hll_setops(sf_dir: str):
    """HyperLogLog set algebra: estimated |A∪B| (register max-merge)
    and |A∩B| (inclusion-exclusion) of the user sets behind event-type
    pairs, gated against EXACT distributed counts — the mergeable-
    sketch contract that lets a 100-TB pipeline answer audience-overlap
    questions from 16 KiB per segment instead of a set shuffle.

    Exact counts come from a two-level distributed distinct (never a
    driver drain); only fixed-width register rows (one per batch per
    type) and the tiny per-type counts reach the driver.  The oracle
    enumerates the pair grid with within=TRUE for both estimates
    (union at ±5%, the subtractive intersection at ±10% of the union),
    so an out-of-tolerance sketch reds the value hash."""
    from ...stages.sketch import hll_estimate, hll_partial

    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"], split=True)

    P = 12

    def reg_partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {"event_type": batch["event_type"].to_pandas(),
             "u": batch["user_id"].to_numpy(zero_copy_only=False)}
        )
        rows = []
        for et, grp in df.groupby("event_type"):
            regs = hll_partial(grp["u"].to_numpy(), p=P)
            rows.append({"event_type": et, "regs": regs.tobytes()})
        return pd.DataFrame(rows)

    reg_rows = ds.map_batches(reg_partial, batch_format="pyarrow").to_pandas()
    regs: dict[str, np.ndarray] = {}
    for _, r in reg_rows.iterrows():
        arr = np.frombuffer(r["regs"], dtype=np.uint8)
        et = r["event_type"]
        regs[et] = np.maximum(regs[et], arr) if et in regs else arr.copy()

    # exact per-type and per-pair counts: distinct (type, user) pairs
    def pair_distinct(batch: pa.Table) -> pa.Table:
        t = pa.table({"event_type": batch["event_type"], "user_id": batch["user_id"]})
        return pa.TableGroupBy(t, ["event_type", "user_id"]).aggregate([])

    distinct_pairs = grouped_aggregate(
        ds.map_batches(pair_distinct, batch_format="pyarrow"),
        ["event_type", "user_id"],
        {"one": ("count", None)},
    ).to_pandas()

    rows = []
    for a, b in _HLL_SETOP_PAIRS:
        ua = set(distinct_pairs[distinct_pairs["event_type"] == a]["user_id"])
        ub = set(distinct_pairs[distinct_pairs["event_type"] == b]["user_id"])
        n_union, n_inter = len(ua | ub), len(ua & ub)
        est_a, est_b = hll_estimate(regs[a]), hll_estimate(regs[b])
        est_u = hll_estimate(np.maximum(regs[a], regs[b]))
        est_i = est_a + est_b - est_u
        rows.append(
            {"pair": f"{a}|{b}",
             "n_union": n_union, "n_intersect": n_inter,
             "union_within": bool(abs(est_u - n_union) <= 0.05 * n_union),
             "intersect_within": bool(abs(est_i - n_inter) <= 0.10 * n_union)}
        )
    out = pd.DataFrame(rows)
    out[["n_union", "n_intersect"]] = out[["n_union", "n_intersect"]].astype(np.int64)
    return out


SQL_HLL_SETOPS = f"""
WITH pairs AS (
  SELECT * FROM (VALUES {", ".join(f"('{a}', '{b}')" for a, b in _HLL_SETOP_PAIRS)})
    AS t(a, b)
),
du AS (SELECT DISTINCT event_type, user_id FROM events)
SELECT p.a || '|' || p.b AS pair,
       CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_union,
       CAST(count(DISTINCT CASE WHEN EXISTS (
             SELECT 1 FROM du x WHERE x.event_type = p.a AND x.user_id = d.user_id)
           AND EXISTS (
             SELECT 1 FROM du y WHERE y.event_type = p.b AND y.user_id = d.user_id)
           THEN d.user_id END) AS BIGINT) AS n_intersect,
       TRUE AS union_within, TRUE AS intersect_within
FROM pairs p
JOIN du d ON d.event_type IN (p.a, p.b)
GROUP BY 1
"""


def q_isotonic_calibration(sf_dir: str):
    """Isotonic-regression calibration (pool-adjacent-violators) of
    P(purchase | value): the nonparametric monotone fit every
    model-calibration pass runs after `ece_calibration` flags drift.

    The distributed part reduces (cent-quantized score → n, n_pos)
    — a support-bounded table — and PAV pools adjacent violators
    driver-side with exact integer block sums (rates compare as
    cross-multiplied integers, so pooling order can't float-flip).
    Output: the pooled monotone blocks (score range, n, calibrated
    rate).  Rows-only at the driver gate; the PAV properties
    (monotonicity, mass conservation, mean preservation, parity with
    the textbook per-row algorithm) are pytest-verified."""
    buckets = _isotonic_buckets(sf_dir)
    blocks = pav_blocks(
        buckets["s"].to_numpy(np.int64),
        buckets["n"].to_numpy(np.int64),
        buckets["pos"].to_numpy(np.int64),
    )
    out = pd.DataFrame(blocks, columns=["score_lo", "score_hi", "n", "n_pos"])
    out = out.astype(np.int64)
    out["rate"] = np.round(out["n_pos"] / out["n"], 6)
    return out


def _isotonic_buckets(sf_dir: str) -> pd.DataFrame:
    """The distributed half of isotonic calibration: exact (cent score →
    n, n_pos) buckets over events, sorted by score — a support-bounded
    table (shared by `isotonic_calibration` and `isotonic_gate`)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        cents = np.round(batch["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        pos = (batch["event_type"].to_pandas() == "purchase").to_numpy().astype(np.int64)
        return (
            pd.DataFrame({"s": cents, "n": 1, "pos": pos})
            .groupby("s", as_index=False)
            .agg(n=("n", "sum"), pos=("pos", "sum"))
        )

    return (
        grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["s"],
            {"n": ("sum", "n"), "pos": ("sum", "pos")},
        )
        .to_pandas()
        .sort_values("s")
        .reset_index(drop=True)
    )


def pav_blocks(scores: np.ndarray, n: np.ndarray, pos: np.ndarray):
    """Textbook stack PAV over pre-aggregated (score, n, n_pos) buckets
    sorted by score.  Violator test is exact: pos_a·n_b >= pos_b·n_a
    (cross-multiplied integers — no float rate comparisons)."""
    stack: list[list[int]] = []  # [score_lo, score_hi, n, pos]
    for s, ni, pi in zip(scores, n, pos):
        stack.append([int(s), int(s), int(ni), int(pi)])
        while (
            len(stack) > 1
            and stack[-2][3] * stack[-1][2] >= stack[-1][3] * stack[-2][2]
        ):
            _lo2, hi2, n2, p2 = stack.pop()
            stack[-1][1] = hi2  # merged block extends to the popped right edge
            stack[-1][2] += n2
            stack[-1][3] += p2
    return [tuple(b) for b in stack]


# ---------------------------------------------------------------------------
# Periodogram, Theil-Sen trend, conversion-lag quantiles
# ---------------------------------------------------------------------------

_PERIODS = (24, 12, 8, 168)


def q_periodogram(sf_dir: str):
    """Discrete-Fourier power at candidate periods ({periods} hours)
    per event type — the frequency-domain seasonality probe that tells
    a forecasting pipeline WHICH period to model (acf_lags' spectral
    sibling).

    Power_P = [(Σ a·cos(2πt/P))² + (Σ a·sin(2πt/P))²] / n over the
    mean-centered dense hourly series (a = x − x̄), scaled by n so the
    magnitude stays O(amplitude²) and the 6-dp rounding is safe.
    Rides the bounded `_dense_hourly_counts` reduction; both engines
    evaluate the identical trig expression per (type, period)."""
    dense = _dense_hourly_counts(sf_dir)
    rows = []
    for etype, grp in dense.groupby("event_type", sort=True):
        g = grp.sort_values("hour")
        x = g["x"].to_numpy(np.float64)
        t = np.arange(len(x), dtype=np.float64)
        a = x - x.sum() / len(x)
        for p in _PERIODS:
            sc = float((a * np.cos(2.0 * np.pi * t / p)).sum())
            ss = float((a * np.sin(2.0 * np.pi * t / p)).sum())
            rows.append(
                {"event_type": etype, "period": p,
                 "power": round((sc * sc + ss * ss) / len(x), 6)}
            )
    out = pd.DataFrame(rows)
    out["period"] = out["period"].astype(np.int64)
    return out


q_periodogram.__doc__ = q_periodogram.__doc__.format(periods=_PERIODS)


SQL_PERIODOGRAM = f"""
WITH {_SQL_DENSE_HOURLY},
idx AS (
  SELECT event_type, hour - min(hour) OVER (PARTITION BY event_type) AS t, x
  FROM dense
),
ctr AS (
  SELECT event_type, t,
         x - avg(x) OVER (PARTITION BY event_type) AS a
  FROM idx
),
per AS (SELECT unnest(ARRAY{list(_PERIODS)}) AS period)
SELECT c.event_type, CAST(p.period AS BIGINT) AS period,
       round((pow(sum(c.a * cos(2.0 * pi() * c.t / p.period)), 2)
              + pow(sum(c.a * sin(2.0 * pi() * c.t / p.period)), 2))
             / count(*), 6) AS power
FROM ctr c CROSS JOIN per p
GROUP BY 1, 2
"""


def q_theilsen_trend(sf_dir: str):
    """Theil-Sen robust trend of each event type's hourly volume: the
    MEDIAN of all pairwise slopes (x_j − x_i)/(j − i) — immune to the
    outlier hours that wreck a least-squares slope.

    The distributed part is the bounded dense-hourly reduction; the
    O(n²) pairwise-slope median runs on the driver over the ~720-point
    series (at 100 TB the series length is set by the TIME RANGE, not
    the corpus, so this stays bounded — and the in-repo t-digest is
    the swap if a deployment ever needs multi-year minute-level
    series).  Each slope is a single IEEE division on both engines, so
    the median (mean of the two middles at even counts) is bit-stable
    before the 6-dp rounding."""
    dense = _dense_hourly_counts(sf_dir)
    rows = []
    for etype, grp in dense.groupby("event_type", sort=True):
        x = grp.sort_values("hour")["x"].to_numpy(np.float64)
        n = len(x)
        i, j = np.triu_indices(n, k=1)
        slopes = (x[j] - x[i]) / (j - i)
        rows.append(
            {"event_type": etype, "n_pairs": int(len(slopes)),
             "slope": round(float(np.median(slopes)), 6)}
        )
    out = pd.DataFrame(rows)
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out


SQL_THEILSEN_TREND = f"""
WITH {_SQL_DENSE_HOURLY},
idx AS (
  SELECT event_type, hour - min(hour) OVER (PARTITION BY event_type) AS t, x
  FROM dense
)
SELECT a.event_type, CAST(count(*) AS BIGINT) AS n_pairs,
       round(median((b.x - a.x) / (b.t - a.t)), 6) AS slope
FROM idx a JOIN idx b ON b.event_type = a.event_type AND b.t > a.t
GROUP BY 1
"""


def q_conversion_lag(sf_dir: str):
    """Click→purchase conversion-lag distribution: for every user with
    both event types, the exact-microsecond lag between their first
    click and first purchase, summarized as linear-interpolated
    quartiles — the time-to-convert readout behind funnel SLAs.

    The distributed part is a per-(user, type) first-timestamp reduce;
    the per-user lag table that reaches the driver is bounded by the
    USER count, not the event count (and `price_quantiles_tdigest` is
    the in-repo swap when even that is too wide).  Both engines use
    the same linear interpolation (numpy 'linear' == DuckDB
    quantile_cont), negative lags (purchase-first users) included."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "ts"], split=True)

    def firsts(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {"user_id": batch["user_id"].to_numpy(zero_copy_only=False),
             "event_type": batch["event_type"].to_pandas(),
             "us": batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")}
        )
        df = df[df["event_type"].isin(("click", "purchase"))]
        return df.groupby(["user_id", "event_type"], as_index=False)["us"].min()

    per_user = (
        grouped_aggregate(
            ds.map_batches(firsts, batch_format="pyarrow"),
            ["user_id", "event_type"],
            {"us": ("min", "us")},
        )
        .to_pandas()
        .pivot(index="user_id", columns="event_type", values="us")
        .dropna()
    )
    if "purchase" not in per_user.columns or "click" not in per_user.columns:
        per_user = per_user.iloc[0:0].assign(purchase=[], click=[])
    lag = (per_user["purchase"] - per_user["click"]).to_numpy(np.int64)
    if len(lag) == 0:  # no converting user: quantiles are NULL/NaN on both engines
        qs = [float("nan")] * 3
    else:
        qs = [float(x) for x in np.percentile(lag, [25, 50, 75], method="linear")]
    return pd.DataFrame(
        {"n_users": np.array([len(lag)], dtype=np.int64),
         "p25_us": [round(qs[0], 2)],
         "median_us": [round(qs[1], 2)],
         "p75_us": [round(qs[2], 2)]}
    )


SQL_CONVERSION_LAG = """
WITH f AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS c,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1
),
lag AS (SELECT p - c AS l FROM f WHERE c IS NOT NULL AND p IS NOT NULL)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       round(quantile_cont(l, 0.25), 2) AS p25_us,
       round(quantile_cont(l, 0.50), 2) AS median_us,
       round(quantile_cont(l, 0.75), 2) AS p75_us
FROM lag
"""


# ---------------------------------------------------------------------------
# URL canonical dedupe + mutual information
# ---------------------------------------------------------------------------


def q_url_canonical_dedup(sf_dir: str):
    """URL-level dedup behind crawl-frontier canonicalization
    (functions/urls.py:canonicalize_url): four planted variants per
    logical page — host case + default port, fragment, trailing slash
    + utm params, tracking params in the middle of the query — must
    all collapse to ONE canonical form; the dedupe keeps the minimum
    doc_id per canonical URL and counts the collapsed variants.

    The canonical string is closed form over doc_id//4, so the SQL
    oracle catches a canonicalizer that mishandles ANY of the four
    rule families (group splits → counts and min-ids shift).  The
    dedupe itself is the exact-key shape: one candidate per key per
    batch leaves each worker."""
    from ...functions.urls import canonicalize_url

    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)

    def plant_and_canon(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        urls = []
        for i in ids:
            i = int(i)
            g, v = i // 4, i % 4
            if v == 0:
                urls.append(f"http://EXAMPLE{g}.COM:80/path{g}?b=2&a=1")
            elif v == 1:
                urls.append(f"http://example{g}.com/path{g}?a=1&b=2#frag")
            elif v == 2:
                urls.append(f"http://example{g}.com/path{g}/?utm_source=x&a=1&b=2")
            else:
                urls.append(f"http://example{g}.com:80/path{g}?a=1&utm_campaign=y&b=2")
        canon = [canonicalize_url(u) for u in urls]
        # per-batch combiner: one candidate row per canonical key
        return (
            pd.DataFrame({"url": canon, "doc_id": ids})
            .groupby("url", as_index=False)
            .agg(n_variants=("doc_id", "size"), min_doc_id=("doc_id", "min"))
        )

    out = grouped_aggregate(
        ds.map_batches(plant_and_canon, batch_format="pyarrow"),
        ["url"],
        {"n_variants": ("sum", "n_variants"), "min_doc_id": ("min", "min_doc_id")},
    )

    def typed(df: pd.DataFrame) -> pd.DataFrame:
        return df.astype({"n_variants": np.int64, "min_doc_id": np.int64})

    return out.map_batches(typed, batch_format="pandas")


SQL_URL_CANONICAL_DEDUP = """
SELECT 'http://example' || (doc_id // 4) || '.com/path' || (doc_id // 4)
         || '?a=1&b=2' AS url,
       CAST(count(*) AS BIGINT) AS n_variants,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id
FROM documents
GROUP BY doc_id // 4
"""


def q_mutual_information(sf_dir: str):
    """Mutual information (nats) between event type and hour-of-day,
    with the marginal entropies — the dependence readout that catches
    what `chi2_independence` only thresholds: HOW MUCH of the type
    signal the diurnal cycle explains.

    One streaming pass reduces the bounded 5×24 contingency table
    (exact integer counts); MI = Σ (n_xy/N)·ln(n_xy·N / (n_x·n_y))
    runs on the tiny table with the identical float expression as the
    SQL mirror; only the final values round (6 dp)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        return (
            pd.DataFrame(
                {"event_type": batch["event_type"].to_pandas(),
                 "hour": (us // 3_600_000_000) % 24}
            )
            .groupby(["event_type", "hour"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    cells = (
        grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["event_type", "hour"],
            {"n": ("sum", "n")},
            small_keys=True,
        )
        .to_pandas()
    )
    N = float(cells["n"].sum())
    nx = cells.groupby("event_type")["n"].sum()
    ny = cells.groupby("hour")["n"].sum()
    pxy = cells["n"].to_numpy(np.float64) / N
    px = cells["event_type"].map(nx).to_numpy(np.float64) / N
    py = cells["hour"].map(ny).to_numpy(np.float64) / N
    mi = float((pxy * np.log(pxy / (px * py))).sum())
    hx = float(-((nx.to_numpy(np.float64) / N) * np.log(nx.to_numpy(np.float64) / N)).sum())
    hy = float(-((ny.to_numpy(np.float64) / N) * np.log(ny.to_numpy(np.float64) / N)).sum())
    return pd.DataFrame(
        {"n": np.array([int(N)], dtype=np.int64),
         "mi_nats": [round(mi, 6)], "h_type": [round(hx, 6)], "h_hour": [round(hy, 6)]}
    )


SQL_MUTUAL_INFORMATION = """
WITH e AS (
  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hour FROM events
),
cell AS (SELECT event_type, hour, count(*) AS n FROM e GROUP BY 1, 2),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn FROM cell),
mx AS (SELECT event_type, sum(n) AS nx FROM cell GROUP BY 1),
my AS (SELECT hour, sum(n) AS ny FROM cell GROUP BY 1)
SELECT CAST(t.nn AS BIGINT) AS n,
       round(sum((c.n / t.nn) * ln(c.n * t.nn / (mx.nx * my.ny))), 6) AS mi_nats,
       (SELECT round(-sum((nx / t2.nn) * ln(nx / t2.nn)), 6)
        FROM mx, tot t2) AS h_type,
       (SELECT round(-sum((ny / t3.nn) * ln(ny / t3.nn)), 6)
        FROM my, tot t3) AS h_hour
FROM cell c
JOIN mx ON mx.event_type = c.event_type
JOIN my ON my.hour = c.hour
CROSS JOIN tot t
GROUP BY t.nn
"""


_IPACK_BUDGET = 2048
_IPACK_MEDIA_TOKENS = 64


def q_interleaved_pack(sf_dir: str):
    """Training-sample packing for an INTERLEAVED text+media corpus:
    each document's sequence cost is its text token count plus a fixed
    {mt}-token budget per media span (the vision-token allowance a
    multimodal trainer reserves per image), packed per source into
    {b}-token sequences in doc order via the same distributed two-pass
    prefix scan as `pack_sequences` (stages/scan.py) — bucket sums fold
    on the driver, offsets broadcast back, one coarse-bucket shuffle.

    Media-span counts are planted closed-form (doc_id % 5 — the
    testdata documents carry no media column) so the packing of the
    MIXED cost model is fully value-oracled; on the real interleaved
    corpus the count comes from the extracted spans' kind column."""
    import os

    import pyarrow.parquet as pq

    from ...stages.scan import pack_sequences

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"], split=True)

    def cost(batch: pa.Table) -> pa.Table:
        ntok = pa.compute.cast(
            pa.compute.list_value_length(pa.compute.split_pattern(batch["text"], " ")),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        total = ntok + _IPACK_MEDIA_TOKENS * (ids % 5)
        return pa.Table.from_arrays(
            [batch["doc_id"], batch["source"], pa.array(total, type=pa.int64())],
            names=["doc_id", "source", "n_tok"],
        )

    counted = ds.map_batches(cost, batch_format="pyarrow")
    meta = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata
    max_id = max(
        meta.row_group(i).column(0).statistics.max for i in range(meta.num_row_groups)
    )
    return pack_sequences(counted, _IPACK_BUDGET, max_order=int(max_id))


q_interleaved_pack.__doc__ = q_interleaved_pack.__doc__.format(
    mt=_IPACK_MEDIA_TOKENS, b=_IPACK_BUDGET
)


SQL_INTERLEAVED_PACK = f"""
WITH t AS (
  SELECT doc_id, source,
         len(string_split(text, ' ')) + {_IPACK_MEDIA_TOKENS} * (doc_id % 5) AS n_tok
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
  FROM t
)
SELECT doc_id, source, n_tok, cum_before,
       cum_before // {_IPACK_BUDGET} AS seq_id,
       cum_before % {_IPACK_BUDGET} AS seq_offset
FROM c
"""


def q_exact_median_2pass(sf_dir: str):
    """EXACT per-group median WITHOUT co-locating any group's values —
    the selection-by-histogram-drill-down plan for groups too large
    for one worker (where `grouped_quantiles`' one-shuffle plan stops
    working and t-digest would give up exactness):

    pass 1 reduces a (flag, bucket, count) histogram (4096 global
    cent-range buckets from the parquet footer's min/max — no data
    read to size them); the driver walks each flag's cumulative counts
    to find the ≤2 buckets holding the middle order statistics; pass 2
    reduces exact value counts ONLY inside those target buckets
    (support-bounded by the bucket width).  Every shuffle is a bounded
    count reduce — raw values never move.  Median = mean of the two
    middle cents (DuckDB median semantics for even counts)."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "lineitem.parquet")
    meta = pq.ParquetFile(path).metadata
    names = [meta.schema.column(i).name for i in range(meta.num_columns)]
    pi = names.index("l_extendedprice")
    lo = min(meta.row_group(g).column(pi).statistics.min for g in range(meta.num_row_groups))
    hi = max(meta.row_group(g).column(pi).statistics.max for g in range(meta.num_row_groups))
    cmin, cmax = int(round(lo * 100)), int(round(hi * 100))
    width = max(1, (cmax - cmin + 4096) // 4096)

    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"], split=True)

    def hist(batch: pa.Table) -> pd.DataFrame:
        cents = np.round(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return (
            pd.DataFrame(
                {"flag": batch["l_returnflag"].to_pandas(),
                 "b": (cents - cmin) // width}
            )
            .groupby(["flag", "b"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    h = (
        grouped_aggregate(
            ds.map_batches(hist, batch_format="pyarrow"),
            ["flag", "b"],
            {"n": ("sum", "n")},
            small_keys=True,
        )
        .to_pandas()
        .sort_values(["flag", "b"])
    )
    targets: dict[str, set[int]] = {}
    ranks: dict[str, tuple[int, int, int]] = {}
    for flag, grp in h.groupby("flag"):
        n = int(grp["n"].sum())
        k1, k2 = (n - 1) // 2, n // 2
        cum = grp["n"].cumsum().to_numpy()
        bs = grp["b"].to_numpy()
        t = {int(bs[np.searchsorted(cum, k + 1)]) for k in (k1, k2)}
        targets[flag] = t
        ranks[flag] = (n, k1, k2)
    # offsets: elements strictly below each flag's target buckets
    below: dict[str, dict[int, int]] = {}
    for flag, grp in h.groupby("flag"):
        cum = dict(zip(grp["b"], grp["n"].cumsum()))
        bs = sorted(targets[flag])
        below[flag] = {
            b: int(sum(v for bb, v in zip(grp["b"], grp["n"]) if bb < b)) for b in bs
        }
    bc = Broadcast(targets)

    def drill(batch: pa.Table) -> pd.DataFrame:
        tmap = bc.get()
        cents = np.round(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        flags = batch["l_returnflag"].to_pandas().to_numpy()
        b = (cents - cmin) // width
        keep = np.array([bb in tmap.get(f, ()) for f, bb in zip(flags, b)])
        if not keep.any():
            return pd.DataFrame({"flag": [], "c": [], "n": []})
        return (
            pd.DataFrame({"flag": flags[keep], "c": cents[keep], "n": 1})
            .groupby(["flag", "c"], as_index=False)["n"]
            .sum()
        )

    fine = (
        grouped_aggregate(
            ds.map_batches(drill, batch_format="pyarrow"),
            ["flag", "c"],
            {"n": ("sum", "n")},
            small_keys=True,
        )
        .to_pandas()
        .sort_values(["flag", "c"])
    )
    rows = []
    for flag, grp in fine.groupby("flag"):
        n, k1, k2 = ranks[flag]
        start = min(below[flag].values())  # elements below the lowest target bucket
        cum = start + grp["n"].cumsum().to_numpy()
        vals = grp["c"].to_numpy()
        v1 = int(vals[np.searchsorted(cum, k1 + 1)])
        v2 = int(vals[np.searchsorted(cum, k2 + 1)])
        rows.append(
            {"l_returnflag": flag, "n": n,
             "median_price": round((v1 + v2) / 2.0 / 100.0, 6)}
        )
    out = pd.DataFrame(rows).sort_values("l_returnflag").reset_index(drop=True)
    out["n"] = out["n"].astype(np.int64)
    return out


SQL_EXACT_MEDIAN_2PASS = """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       round(median(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 6)
         AS median_price
FROM lineitem GROUP BY 1
"""


def q_containment_pairs(sf_dir: str):
    """Asymmetric near-duplicate detection by SHINGLE CONTAINMENT
    C(A,B) = |A∩B| / |A| over token-trigram sets — the dedup family
    member symmetric Jaccard misses: a document WRAPPED inside a
    larger one (quoted, boilerplate-framed, concatenated) has high
    containment but low Jaccard.  Pairs with C ≥ 0.9 and |A| ≥ 5
    trigrams are reported in both directions.

    Plan: per-doc distinct trigram sets stream out of the scan (a doc
    lives in one row, so per-batch dedup is global); ONE shuffle on
    the shingle key generates co-occurring doc pairs (bounded by
    per-shingle document frequency — a df cap is the guard on
    adversarial hot shingles); the (a, b, common) reduce joins the
    broadcast size map and the ≥0.9 gate is an exact integer test
    (10·common ≥ 9·|A|) applied BEFORE anything reaches the driver."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def shingles(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        toks = pc.split_pattern(batch["text"], " ")
        la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = np.asarray(la.values.to_pylist(), dtype=object)
        lens = np.diff(la.offsets.to_numpy(zero_copy_only=False))
        if len(flat) < 3:
            return pd.DataFrame({"doc": [], "sh": []})
        docidx = np.repeat(np.arange(len(lens)), lens)
        valid = docidx[:-2] == docidx[2:]
        sh = flat[:-2][valid] + " " + flat[1:-1][valid] + " " + flat[2:][valid]
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        docs = ids[docidx[:-2][valid]]
        return (
            pd.DataFrame({"doc": docs.astype(np.int64), "sh": sh})
            .drop_duplicates()
        )

    doc_sh = ds.map_batches(shingles, batch_format="pyarrow").materialize()

    sizes = (
        grouped_aggregate(
            doc_sh.map_batches(
                lambda df: df.groupby("doc", as_index=False).size().rename(columns={"size": "sz"}),
                batch_format="pandas",
            ),
            ["doc"],
            {"sz": ("sum", "sz")},
        )
        .to_pandas()
    )
    szmap = Broadcast(dict(zip(sizes["doc"].astype(int), sizes["sz"].astype(int))))

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # coarse 64-bucket exchange on the shingle: one map_groups task
        # per bucket instead of one per shingle (the per-tiny-group
        # scheduling tax measured 9x on adamic_adar's identical shape)
        df["bkt"] = (pd.util.hash_array(df["sh"].to_numpy(object)) % 64).astype(np.int32)
        return df

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["doc", "sh"]]
        m = d.merge(d, on="sh", suffixes=("_a", "_b"))
        m = m[m["doc_a"] != m["doc_b"]]
        if not len(m):
            return pd.DataFrame(
                {c: pd.Series(dtype=np.int64) for c in ("a", "b", "common")}
            )
        return (
            m.groupby(["doc_a", "doc_b"], as_index=False)
            .size()
            .rename(columns={"doc_a": "a", "doc_b": "b", "size": "common"})
            .astype(np.int64)
        )

    common = grouped_aggregate(
        doc_sh.map_batches(add_bucket, batch_format="pandas")
        .groupby("bkt")
        .map_groups(pairs, batch_format="pandas"),
        ["a", "b"],
        {"common": ("sum", "common")},
    )

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        sz = szmap.get()
        szs = df["a"].map(sz).to_numpy(np.int64)
        keep = (szs >= 5) & (10 * df["common"].to_numpy(np.int64) >= 9 * szs)
        out = df[keep].copy()
        out["containment"] = np.round(
            out["common"].to_numpy(np.float64) / szs[keep], 6
        )
        return out.rename(columns={"a": "doc_a", "b": "doc_b"}).astype(
            {"doc_a": np.int64, "doc_b": np.int64, "common": np.int64}
        )

    return common.map_batches(gate, batch_format="pandas")


SQL_CONTAINMENT_PAIRS = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
tri AS (
  SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS sh
  FROM toks a
  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  GROUP BY 1, 2
),
sz AS (SELECT doc_id, count(*) AS sz FROM tri GROUP BY 1),
com AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
  FROM tri x JOIN tri y ON y.sh = x.sh AND y.doc_id <> x.doc_id
  GROUP BY 1, 2
)
SELECT a AS doc_a, b AS doc_b, CAST(common AS BIGINT) AS common,
       round(CAST(common AS DOUBLE) / sz, 6) AS containment
FROM com JOIN sz ON sz.doc_id = com.a
WHERE sz >= 5 AND 10 * common >= 9 * sz
"""


def q_quantile_normalize(sf_dir: str):
    """Quantile normalization of doc lengths ACROSS sources: each
    document's n_chars is replaced by the pooled distribution's value
    at the same within-source quantile — the cross-source alignment
    step that makes per-source quality thresholds comparable (the
    bioinformatics-standard transform, applied to corpus stats).

    Within-source rank r is deterministic (ORDER BY n_chars, doc_id);
    the normalized value interpolates the POOLED empirical
    distribution at h = (r−1)/(n_s−1)·(N−1).  The pooled distribution
    travels as a support-bounded (value, cumulative count) table —
    never the N-row sorted array — and the per-source ranking
    co-locates one source per group (20 sources here; the
    counts-based rank from `exact_median_2pass`'s histogram family is
    the swap when one source outgrows a worker)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "n_chars"], split=True)

    def counts(batch: pa.Table) -> pd.DataFrame:
        return (
            pd.DataFrame({"v": batch["n_chars"].to_numpy(zero_copy_only=False)})
            .groupby("v", as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )

    pool = (
        grouped_aggregate(
            ds.map_batches(counts, batch_format="pyarrow"),
            ["v"],
            {"c": ("sum", "c")},
        )
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    vs = pool["v"].to_numpy(np.int64)
    cum = np.cumsum(pool["c"].to_numpy(np.int64))  # cum[i] = # values <= vs[i]
    N = int(cum[-1])
    bc = Broadcast((vs, cum, N))

    def normalize(df: pd.DataFrame) -> pd.DataFrame:
        vs_, cum_, n_pool = bc.get()

        def value_at(idx: np.ndarray) -> np.ndarray:
            # pooled sorted multiset element at 0-based position idx
            pos = np.searchsorted(cum_, idx + 1, side="left")
            return vs_[pos]

        out = []
        for src, grp in df.groupby("source", sort=False):
            g = grp.sort_values(["n_chars", "doc_id"])
            ns = len(g)
            r = np.arange(1, ns + 1, dtype=np.float64)
            h = ((r - 1) / (ns - 1)) * (n_pool - 1) if ns > 1 else np.zeros(ns)
            lo = np.floor(h).astype(np.int64)
            hi = np.minimum(lo + 1, n_pool - 1)
            frac = h - lo
            v_lo = value_at(lo).astype(np.float64)
            v_hi = value_at(hi).astype(np.float64)
            norm = v_lo + (v_hi - v_lo) * frac
            out.append(
                pd.DataFrame(
                    {"doc_id": g["doc_id"].to_numpy(np.int64),
                     "source": src,
                     "n_chars": g["n_chars"].to_numpy(np.int64),
                     "normalized": np.round(norm, 6)}
                )
            )
        return pd.concat(out, ignore_index=True)

    # one shuffle co-locating each source (sources are few; the rank is
    # per-source sequential by definition)
    return ds.groupby("source").map_groups(normalize, batch_format="pandas")


SQL_QUANTILE_NORMALIZE = """
WITH r AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS ns
  FROM documents
),
pool AS (
  SELECT n_chars AS v,
         row_number() OVER (ORDER BY n_chars) - 1 AS idx
  FROM documents
),
n AS (SELECT count(*) AS n_pool FROM documents),
h AS (
  SELECT r.*,
         CASE WHEN r.ns > 1
              THEN (CAST(r.rn - 1 AS DOUBLE) / (r.ns - 1)) * (n.n_pool - 1)
              ELSE 0.0 END AS h,
         n.n_pool
  FROM r CROSS JOIN n
)
SELECT h.doc_id, h.source, h.n_chars,
       round(plo.v + (phi.v - plo.v) * (h.h - floor(h.h)), 6) AS normalized
FROM h
JOIN pool plo ON plo.idx = CAST(floor(h.h) AS BIGINT)
JOIN pool phi ON phi.idx = least(CAST(floor(h.h) AS BIGINT) + 1,
                                 h.n_pool - 1)
"""


def _mutual_nn_blocked(ds):
    """Above-budget mutual-NN: the exact top-1 graph comes from
    ``knn_graph_blocked`` (block-pair expansion, no driver matrix,
    same (sim desc, id asc) tie rule), then mutuality is a
    groupby(min-id) exchange of (lo, hi, fwd) int triples: the pair
    (a, b) is mutual iff its lo-group holds BOTH directions.  Nothing
    wider than 3 ints per vector ever moves after the matmuls."""
    from ...stages.similarity import knn_graph_blocked

    best = knn_graph_blocked(ds, k=1, n_blocks=8)

    def to_key(batch: pa.Table) -> pd.DataFrame:
        s = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {"lo": np.minimum(s, d), "hi": np.maximum(s, d), "fwd": s < d}
        )

    def mutual(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("hi")["fwd"].agg(["min", "max"])
        mut = np.sort(agg.index[(~agg["min"]) & (agg["max"])].to_numpy())
        return pd.DataFrame(
            {
                "vec_a": np.full(len(mut), int(g["lo"].iloc[0]), dtype=np.int64),
                "vec_b": mut.astype(np.int64),
            }
        )

    return (
        best.map_batches(to_key, batch_format="pyarrow")
        .groupby("lo")
        .map_groups(mutual, batch_format="pandas")
    )


def q_mutual_nn(sf_dir: str):
    """Reciprocal best matches (mutual nearest neighbors) over the
    embedding table: pairs where each vector is the OTHER's top-1
    cosine neighbor — the high-precision entity-matching rule (a
    one-directional top-1 is noisy; mutuality filters the noise).

    Two-tier router on the parquet footer row count (same shape as
    `knn_graph`): under the broadcast budget, each batch matmuls
    against the broadcast normalized matrix and mutuality folds on the
    driver over the id-bounded best-match table (2 ints/vector).
    Above it, `stages.similarity.knn_graph_blocked` computes the same
    exact top-1 with NO driver matrix, and mutuality becomes a
    groupby(min-id) exchange of (lo, hi, fwd) int triples — a pair is
    mutual iff its group holds both directions (pytest-equal to the
    broadcast path).  Ties break to the smaller vec_id on both engines
    (argmax returns the first maximum over the id-ordered matrix; SQL
    orders cos DESC, vec_id).  Output: each mutual pair once
    (vec_a < vec_b) — ids only, since DuckDB's list_cosine_similarity
    runs in float32 on FLOAT[] columns and the raw similarity would
    differ in the 7th decimal (the same ids-only convention as
    knn_graph / embedding_dup_pairs)."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True)

    if _emb_rows(sf_dir) > _EMB_BROADCAST_ROWS:
        return _mutual_nn_blocked(ds)

    mat_tbl = (
        read_table_arrow(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .sort_by("vec_id")
    )
    ids = mat_tbl["vec_id"].to_numpy()
    M = np.stack(mat_tbl["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    bc = Broadcast((ids, Mn))

    def best(batch: pa.Table) -> pd.DataFrame:
        ids_, Mn_ = bc.get()
        vid = batch["vec_id"].to_numpy(zero_copy_only=False)
        V = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        sims = Vn @ Mn_.T
        rows_pos = np.searchsorted(ids_, vid)
        sims[np.arange(len(vid)), rows_pos] = -np.inf  # mask self
        nn = np.argmax(sims, axis=1)  # first max = smallest vec_id on ties
        return pd.DataFrame(
            {"a": vid.astype(np.int64), "b": ids_[nn].astype(np.int64),
             "cos": sims[np.arange(len(vid)), nn]}
        )

    bests = ds.map_batches(best, batch_format="pyarrow").to_pandas()
    # mutuality on the id-bounded best-match table (2 ints + 1 float/vec)
    bmap = dict(zip(bests["a"], bests["b"]))
    rows = [
        {"vec_a": int(a), "vec_b": int(b)}
        for a, b in bmap.items()
        if a < b and bmap.get(b) == a
    ]
    return pd.DataFrame(rows).sort_values("vec_a").reset_index(drop=True).astype(
        {"vec_a": np.int64, "vec_b": np.int64}
    )


SQL_MUTUAL_NN = """
WITH nn AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         list_cosine_similarity(a.embedding, b.embedding) AS cos,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                                     b.vec_id) AS rk
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
),
best AS (SELECT a, b FROM nn WHERE rk = 1)
SELECT x.a AS vec_a, x.b AS vec_b
FROM best x JOIN best y ON y.a = x.b AND y.b = x.a
WHERE x.a < x.b
"""


def q_hard_negatives(sf_dir: str):
    """Hard-negative mining for contrastive training: for every vector,
    the most-similar vector with a DIFFERENT label (tie → smaller
    vec_id) — the standard way to upgrade random in-batch negatives to
    hard ones (the negative the model most confuses with the anchor).

    Two-tier router on the parquet footer row count: under the
    broadcast budget, the same broadcast-matmul shape as `mutual_nn`
    with the self-mask widened to a same-LABEL mask; above it,
    `knn_graph_blocked(k=1, exclude_same_attr=True)` computes the same
    exact different-label top-1 via block-pair expansion with NO
    driver matrix (the label rides the exchange; same-label sims mask
    to -inf BEFORE the partial top-k so a label-skewed block pair
    cannot flood the margin; pytest-equal).  Ids only (float32
    list_cosine_similarity parity, same convention as knn_graph);
    `knn_ivf`/`knn_lsh_shuffle` remain the sublinear approximate swaps
    past exact-O(N²) budgets."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"], split=True)

    if _emb_rows(sf_dir) > _EMB_BROADCAST_ROWS:
        from ...stages.similarity import knn_graph_blocked

        def rename(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "vec_id": g["src"].to_numpy().astype(np.int64),
                    "hard_neg": g["dst"].to_numpy().astype(np.int64),
                }
            )

        return knn_graph_blocked(
            ds, k=1, n_blocks=8, attr_col="label",
            exclude_same_attr=True, group_finalize=rename,
        )

    mat_tbl = (
        read_table_arrow(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])
        .sort_by("vec_id")
    )
    ids = mat_tbl["vec_id"].to_numpy()
    labels = mat_tbl["label"].to_numpy().astype(np.int64)
    M = np.stack(mat_tbl["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    bc = Broadcast((ids, labels, Mn))

    def best_other_label(batch: pa.Table) -> pd.DataFrame:
        ids_, labels_, Mn_ = bc.get()
        vid = batch["vec_id"].to_numpy(zero_copy_only=False)
        vlab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        sims = Vn @ Mn_.T
        sims[vlab[:, None] == labels_[None, :]] = -np.inf  # mask same label
        nn = np.argmax(sims, axis=1)  # first max = smallest vec_id on ties
        # degenerate guard: a label that covers the WHOLE corpus leaves
        # its rows all -inf (argmax would emit a bogus index-0 pair);
        # the SQL inner join emits no row for such a vec_id — drop to match
        has_other = np.isfinite(sims[np.arange(len(vid)), nn])
        return pd.DataFrame(
            {"vec_id": vid.astype(np.int64)[has_other],
             "hard_neg": ids_[nn].astype(np.int64)[has_other]}
        )

    return ds.map_batches(best_other_label, batch_format="pyarrow")


SQL_HARD_NEGATIVES = """
SELECT a.vec_id AS vec_id, b.vec_id AS hard_neg
FROM embeddings a JOIN embeddings b ON b.label <> a.label
QUALIFY row_number() OVER (
  PARTITION BY a.vec_id
  ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) = 1
"""


_FH_BUCKETS = 256  # hashing-trick feature dimensionality


class _FeatureHasher:
    """Stateful hashing-trick vectorizer (Weinberger et al., ICML'09):
    token → md5-derived bucket in [0, 256) with a ±1 sign bit, summed
    per (doc, bucket) with multiplicity.  The md5 memo over distinct
    tokens lives per actor (vocabulary-bounded), the per-doc fold is a
    single pandas groupby per batch — and because a document is one
    row, the (doc, bucket) aggregate COMPLETES inside its batch: the
    whole vectorizer is shuffle-free."""

    def __init__(self):
        self.memo: dict[str, int] = {}

    def _h(self, tok: str) -> int:
        v = self.memo.get(tok)
        if v is None:
            import hashlib

            v = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16)
            self.memo[tok] = v
        return v

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        doc_l, hv_l = [], []
        for i, t in enumerate(texts):
            toks = (t or "").split()
            if not toks:
                continue
            doc_l.append(np.full(len(toks), ids[i], dtype=np.int64))
            hv_l.append(np.fromiter((self._h(tk) for tk in toks), dtype=np.int64,
                                    count=len(toks)))
        if not doc_l:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "bucket": pd.Series(dtype=np.int64),
                                 "value": pd.Series(dtype=np.int64)})
        hv = np.concatenate(hv_l)
        return (
            pd.DataFrame(
                {"doc_id": np.concatenate(doc_l),
                 "bucket": hv % _FH_BUCKETS,
                 "value": np.where((hv >> 8) & 1 == 0, 1, -1).astype(np.int64)}
            )
            .groupby(["doc_id", "bucket"], as_index=False)["value"]
            .sum()
        )


def q_feature_hashing(sf_dir: str):
    """Hashing-trick sparse features over documents: (doc_id, bucket,
    value) triplets of the 256-dim signed-count vectorizer — the
    fixed-memory featurizer for open-vocabulary text (no vocabulary
    pass, no dictionary shipping).  Stateful actor-pool stage
    (per-actor md5 memo over distinct tokens), zero shuffle (a doc is
    one row, so its buckets fold inside the batch)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(_FeatureHasher, concurrency=(1, 8), batch_format="pyarrow")


SQL_FEATURE_HASHING = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents
), h AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hv FROM toks
)
SELECT doc_id, hv % {_FH_BUCKETS} AS bucket,
       CAST(sum(CASE WHEN (hv // 256) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS value
FROM h GROUP BY 1, 2
"""


_OOV_VOCAB = 500  # top-V corpus tokens form the in-vocabulary set


def q_oov_rate(sf_dir: str):
    """Vocabulary-coverage report: per document, the fraction of token
    OCCURRENCES outside the corpus's top-500 vocabulary — the tokenizer
    /domain-shift health check run before committing a corpus to an
    expensive tokenizer training.

    Two streaming passes: open-domain token-count fold → top-V cut
    (count DESC, token ASC — deterministic) with per-batch prefilter;
    then the vocab broadcasts as ONE Arrow value-set and the per-doc
    OOV fraction is a vectorized `pc.is_in` + segment sum (no shuffle).
    One float division at the end, mirrored in SQL."""
    import pyarrow.compute as pc

    from ..tabular import topk

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.asarray(pc.split_pattern_regex(col, r"\s+").values)
        flat = flat[flat != ""]
        vc = pd.Series(flat).value_counts()
        return pd.DataFrame({"token": vc.index, "cnt": vc.to_numpy()})

    counts = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), ["token"], {"cnt": ("sum", "cnt")}
    )
    top = topk(counts, ["cnt", "token"], _OOV_VOCAB, descending=[True, False]).to_pandas()
    vocab = Broadcast(pa.array(top["token"].to_numpy(dtype=object), type=pa.string()))

    def oov(batch: pa.Table) -> pd.DataFrame:
        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = pc.split_pattern_regex(col, r"\s+")
        flat = lists.values
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        inv = pc.is_in(flat, value_set=vocab.get()).to_numpy(zero_copy_only=False)
        offs = lists.offsets.to_numpy(zero_copy_only=False)
        lens = np.diff(offs)
        seg = np.repeat(np.arange(len(lens)), lens)
        n_tok = np.bincount(seg, weights=nonempty, minlength=len(lens)).astype(np.int64)
        n_in = np.bincount(seg, weights=inv & nonempty, minlength=len(lens)).astype(np.int64)
        keep = n_tok > 0
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(zero_copy_only=False)[keep],
             "n_tokens": n_tok[keep],
             "oov_rate": (n_tok[keep] - n_in[keep]) / n_tok[keep]}
        )

    return ds.map_batches(oov, batch_format="pyarrow")


SQL_OOV_RATE = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents
), v AS (
  SELECT tok FROM (SELECT tok, count(*) AS c FROM toks GROUP BY 1)
  QUALIFY row_number() OVER (ORDER BY c DESC, tok) <= {_OOV_VOCAB}
)
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) - count(v.tok) AS BIGINT) / CAST(count(*) AS BIGINT) AS oov_rate
FROM toks t LEFT JOIN v ON v.tok = t.tok
GROUP BY t.doc_id
"""


_LB_BAND = 64  # tokens per length band
_LB_BATCH = 32  # documents per trainer batch


def q_length_batching(sf_dir: str):
    """Length-bucketed trainer batch assignment: band documents by
    token count (band = n_tokens // 64), order each band by
    (n_tokens, doc_id) and chunk into fixed 32-doc batches — the
    padding-minimizing batching every seq2seq/encoder trainer runs
    (batchmates have near-equal lengths, so pad waste is bounded by
    the band width).

    Shape: streaming token counts (one Arrow regex kernel), ONE
    band exchange — bands are LENGTH-bounded (~n_max/64 of them),
    not row-bounded — and the in-band rank is a single vectorized
    sort.  At corpus scale the in-band rank swaps to the TeraSort
    `global_rank` offsets (64 ints per band), documented there."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def counts(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        n = pc.count_substring_regex(batch["text"], r"\S+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
             "n_tokens": n, "band": n // _LB_BAND}
        )

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n_tokens", "doc_id"]).reset_index(drop=True)
        rk = np.arange(len(df), dtype=np.int64)
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy().astype(np.int64),
             "band": df["band"].to_numpy().astype(np.int64),
             "batch_id": df["band"].to_numpy().astype(np.int64) * 1_000_000
                         + rk // _LB_BATCH}
        )

    return (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby("band")
        .map_groups(assign, batch_format="pandas")
    )


SQL_LENGTH_BATCHING = f"""
WITH t AS (
  SELECT doc_id,
         CAST(coalesce(array_length(regexp_extract_all(text, '\\S+')), 0) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens // {_LB_BAND} AS band,
       (n_tokens // {_LB_BAND}) * 1000000
       + (row_number() OVER (PARTITION BY n_tokens // {_LB_BAND}
                             ORDER BY n_tokens, doc_id) - 1) // {_LB_BATCH} AS batch_id
FROM t
"""


def q_decision_stump(sf_dir: str):
    """Optimal decision stump: the single value-threshold split that
    maximizes information gain for predicting 'purchase' — the
    first-split probe every tree ensemble and every feature-triage
    pass computes.

    One streaming pass reduces the support-bounded (cent, n, n_pos)
    table; cumulative sums give every candidate split's left/right
    class counts at once, gains evaluate vectorized with the entropy
    convention 0·ln0 = 0, and the argmax breaks ties to the SMALLEST
    threshold after 9-dp gain rounding (identically in SQL, so a
    1-ulp gain difference cannot flip the chosen split)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        cents = np.round(batch["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        pos = (batch["event_type"].to_pandas() == "purchase").to_numpy().astype(np.int64)
        return (
            pd.DataFrame({"s": cents, "n": 1, "pos": pos})
            .groupby("s", as_index=False)
            .agg(n=("n", "sum"), pos=("pos", "sum"))
        )

    t = (
        grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["s"],
            {"n": ("sum", "n"), "pos": ("sum", "pos")},
        )
        .to_pandas()
        .sort_values("s")
        .reset_index(drop=True)
    )
    n = t["n"].to_numpy(np.float64)
    pos = t["pos"].to_numpy(np.float64)
    N, P = float(n.sum()), float(pos.sum())

    def ent(p_arr: np.ndarray, n_arr: np.ndarray) -> np.ndarray:
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.where(n_arr > 0, p_arr / np.where(n_arr > 0, n_arr, 1.0), 0.0)
            h = -(
                np.where(q > 0, q * np.log(q), 0.0)
                + np.where(q < 1, (1 - q) * np.log(np.where(q < 1, 1 - q, 1.0)), 0.0)
            )
        return np.where(n_arr > 0, h, 0.0)

    nl = np.cumsum(n)[:-1]  # split AFTER each candidate (x <= s)
    pl = np.cumsum(pos)[:-1]
    nr, pr = N - nl, P - pl
    h_parent = ent(np.array([P]), np.array([N]))[0]
    gain = h_parent - (nl / N) * ent(pl, nl) - (nr / N) * ent(pr, nr)
    gain_r = np.round(gain, 9)
    k = int(np.lexsort((t["s"].to_numpy()[:-1], -gain_r))[0])
    return pd.DataFrame(
        {"threshold_cents": np.array([int(t["s"][k])], dtype=np.int64),
         "gain": [round(float(gain_r[k]), 6)],
         "n_left": np.array([int(nl[k])], dtype=np.int64),
         "n_right": np.array([int(nr[k])], dtype=np.int64)}
    )


SQL_DECISION_STUMP = """
WITH b AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS s, count(*) AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos
  FROM events GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn, CAST(sum(pos) AS DOUBLE) AS pp FROM b),
c AS (
  SELECT s,
         CAST(sum(n) OVER (ORDER BY s) AS DOUBLE) AS nl,
         CAST(sum(pos) OVER (ORDER BY s) AS DOUBLE) AS pl
  FROM b
),
g AS (
  SELECT c.s, c.nl, t.nn - c.nl AS nr, c.pl, t.pp - c.pl AS pr, t.nn, t.pp
  FROM c CROSS JOIN tot t
  WHERE c.nl < t.nn
),
gain AS (
  SELECT s, CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
         round(
           (CASE WHEN pp > 0 AND pp < nn
                 THEN -(pp / nn) * ln(pp / nn) - (1 - pp / nn) * ln(1 - pp / nn)
                 ELSE 0 END)
           - (nl / nn) * (CASE WHEN pl > 0 AND pl < nl
                 THEN -(pl / nl) * ln(pl / nl) - (1 - pl / nl) * ln(1 - pl / nl)
                 ELSE 0 END)
           - (nr / nn) * (CASE WHEN pr > 0 AND pr < nr
                 THEN -(pr / nr) * ln(pr / nr) - (1 - pr / nr) * ln(1 - pr / nr)
                 ELSE 0 END), 9) AS g9
  FROM g
)
SELECT s AS threshold_cents, round(g9, 6) AS gain, n_left, n_right
FROM gain ORDER BY g9 DESC, s LIMIT 1
"""


def q_cohort_ltv(sf_dir: str):
    """Cohort lifetime-value curve: cumulative revenue per signup
    cohort (first-order month) by months-since-first-order — the
    revenue sibling of `cohort_retention`'s count matrix, the curve
    every LTV model calibrates against.

    Two bounded reduces: per-customer first-order month (customer-
    bounded), then exact integer-cent revenue per (cohort, age) cell
    (months² cells); the cumulative sum runs over that tiny matrix.
    Month arithmetic is calendar-exact on both engines (year·12 +
    month)."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"], split=True)

    def prep(batch: pa.Table) -> pd.DataFrame:
        ts = pd.to_datetime(
            pd.Series(batch["o_orderdate"].to_numpy(zero_copy_only=False))
        )
        mon = (ts.dt.year * 12 + (ts.dt.month - 1)).to_numpy(np.int64)
        return pd.DataFrame(
            {"k": batch["o_custkey"].to_numpy(zero_copy_only=False),
             "mon": mon,
             "cents": np.round(
                 batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100
             ).astype(np.int64)}
        )

    rows = ds.map_batches(prep, batch_format="pyarrow")
    firsts = grouped_aggregate(
        rows.map_batches(
            lambda df: df.groupby("k", as_index=False)["mon"].min().rename(columns={"mon": "c0"}),
            batch_format="pandas",
        ),
        ["k"],
        {"c0": ("min", "c0")},
    ).to_pandas()
    cmap = Broadcast(dict(zip(firsts["k"].astype(int), firsts["c0"].astype(int))))

    def cell(df: pd.DataFrame) -> pd.DataFrame:
        c0 = df["k"].map(cmap.get()).to_numpy(np.int64)
        return (
            pd.DataFrame(
                {"cohort": c0, "age": df["mon"].to_numpy(np.int64) - c0,
                 "cents": df["cents"].to_numpy(np.int64)}
            )
            .groupby(["cohort", "age"], as_index=False)["cents"]
            .sum()
        )

    cells = (
        grouped_aggregate(
            rows.map_batches(cell, batch_format="pandas"),
            ["cohort", "age"],
            {"cents": ("sum", "cents")},
            small_keys=True,
        )
        .to_pandas()
        .sort_values(["cohort", "age"])
    )
    cells["cum_cents"] = cells.groupby("cohort")["cents"].cumsum()
    out = pd.DataFrame(
        {"cohort": cells["cohort"], "age_months": cells["age"],
         "revenue": np.round(cells["cents"].to_numpy(np.float64) / 100.0, 2),
         "cum_revenue": np.round(cells["cum_cents"].to_numpy(np.float64) / 100.0, 2)}
    ).reset_index(drop=True)
    out[["cohort", "age_months"]] = out[["cohort", "age_months"]].astype(np.int64)
    return out


SQL_COHORT_LTV = """
WITH o AS (
  SELECT o_custkey AS k,
         year(o_orderdate) * 12 + (month(o_orderdate) - 1) AS mon,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
f AS (SELECT k, min(mon) AS c0 FROM o GROUP BY 1),
cell AS (
  SELECT f.c0 AS cohort, o.mon - f.c0 AS age, sum(o.cents) AS cents
  FROM o JOIN f ON f.k = o.k
  GROUP BY 1, 2
)
SELECT CAST(cohort AS BIGINT) AS cohort, CAST(age AS BIGINT) AS age_months,
       round(cents / 100.0, 2) AS revenue,
       round(sum(cents) OVER (PARTITION BY cohort ORDER BY age
                              ROWS UNBOUNDED PRECEDING) / 100.0, 2) AS cum_revenue
FROM cell
"""


def q_new_returning_users(sf_dir: str):
    """Weekly new-vs-returning active users over the event stream: per
    ISO-ish week (epoch-day // 7), how many active users are seen for
    the FIRST time vs returning — the growth-accounting readout.

    Per-user first-activity week and per-(user, week) activity both
    reduce distributed (user- and user×week-bounded); the weekly
    split is a tiny driver fold.  Exact integer week arithmetic on
    both engines."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"], split=True)

    def prep(batch: pa.Table) -> pd.DataFrame:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        return (
            pd.DataFrame(
                {"u": batch["user_id"].to_numpy(zero_copy_only=False),
                 "w": us // (7 * 86_400_000_000)}
            )
            .drop_duplicates()
        )

    uw = grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["u", "w"],
        {"one": ("count", None)},
    ).to_pandas()
    first = uw.groupby("u")["w"].min()
    uw["is_new"] = (uw["u"].map(first) == uw["w"]).astype(np.int64)
    out = (
        uw.groupby("w", as_index=False)
        .agg(n_new=("is_new", "sum"), n_active=("is_new", "size"))
        .sort_values("w")
        .reset_index(drop=True)
    )
    out["n_returning"] = out["n_active"] - out["n_new"]
    out = out.rename(columns={"w": "week"})
    return out[["week", "n_active", "n_new", "n_returning"]].astype(np.int64)


SQL_NEW_RETURNING = """
WITH uw AS (
  SELECT DISTINCT user_id AS u, epoch_us(ts) // (7 * 86400000000) AS w
  FROM events
),
f AS (SELECT u, min(w) AS w0 FROM uw GROUP BY 1)
SELECT CAST(uw.w AS BIGINT) AS week,
       CAST(count(*) AS BIGINT) AS n_active,
       CAST(sum(CASE WHEN uw.w = f.w0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(count(*) - sum(CASE WHEN uw.w = f.w0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returning
FROM uw JOIN f ON f.u = uw.u
GROUP BY 1
"""


def q_jaccard_weeks(sf_dir: str):
    """Week-over-week audience overlap: Jaccard similarity of the
    active-user sets of consecutive epoch-weeks — the churn-shape
    readout that `new_returning_users` counts can't give (returning
    users may be returning from ANY past week; this measures adjacent
    retention directly).

    Distinct (user, week) pairs reduce distributed; the consecutive-
    week intersection sizes reduce from the user-bounded pair table
    (each user contributes |their weeks|−1 adjacent hits); Jaccard is
    exact integers until the final 6-dp division."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"], split=True)

    def prep(batch: pa.Table) -> pd.DataFrame:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        return (
            pd.DataFrame(
                {"u": batch["user_id"].to_numpy(zero_copy_only=False),
                 "w": us // (7 * 86_400_000_000)}
            )
            .drop_duplicates()
        )

    uw = grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["u", "w"],
        {"one": ("count", None)},
    ).to_pandas()
    per_week = uw.groupby("w")["u"].agg(set)
    weeks = sorted(per_week.index)
    rows = []
    for w0, w1 in zip(weeks, weeks[1:]):
        if w1 != w0 + 1:
            # a gap week: the SQL oracle's b.w = a.w + 1 join emits no
            # row across it — pairing list-adjacent weeks would diverge
            continue
        a, b = per_week[w0], per_week[w1]
        inter, union = len(a & b), len(a | b)
        rows.append(
            {"week": int(w1), "n_prev": len(a), "n_curr": len(b),
             "n_common": inter,
             "jaccard": round(inter / union, 6) if union else float("nan")}
        )
    cols = ["week", "n_prev", "n_curr", "n_common"]
    out = pd.DataFrame(rows, columns=cols + ["jaccard"])
    out[cols] = out[cols].astype(np.int64)
    out["jaccard"] = out["jaccard"].astype(np.float64)
    return out


SQL_JACCARD_WEEKS = """
WITH uw AS (
  SELECT DISTINCT user_id AS u, epoch_us(ts) // (7 * 86400000000) AS w
  FROM events
),
wk AS (SELECT w, count(*) AS n FROM uw GROUP BY 1),
pairs AS (
  SELECT b.w AS week, a.n AS n_prev, b.n AS n_curr
  FROM wk a JOIN wk b ON b.w = a.w + 1
),
common AS (
  SELECT y.w AS week, count(*) AS n_common
  FROM uw x JOIN uw y ON y.u = x.u AND y.w = x.w + 1
  GROUP BY 1
)
SELECT CAST(p.week AS BIGINT) AS week,
       CAST(p.n_prev AS BIGINT) AS n_prev, CAST(p.n_curr AS BIGINT) AS n_curr,
       CAST(coalesce(c.n_common, 0) AS BIGINT) AS n_common,
       round(coalesce(c.n_common, 0)
             / CAST(p.n_prev + p.n_curr - coalesce(c.n_common, 0) AS DOUBLE), 6)
         AS jaccard
FROM pairs p LEFT JOIN common c ON c.week = p.week
"""


def q_gdpr_delete(sf_dir: str):
    """Copy-on-write deletion lifecycle (state/deletes.py): documents
    are committed as a 4-file snapshot table partitioned by doc_id
    range, then every doc_id ≡ 0 (mod 7) is erased.  Footer-stat
    pruning must rewrite ONLY the files that can contain targets (all
    4 here — the ids span the range — but the carried/rewritten split
    is asserted in pytest on a range-limited delete); the new version
    commits atomically and v0 stays time-travel readable.

    Output: per-version (rows, sum of surviving doc_ids) — closed form
    over the documents table, so a delete that drops a wrong row or
    leaks a target reds the value hash."""
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from ...state.deletes import delete_rows
    from ...state.snapshots import commit_snapshot, read_snapshot

    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)
    table = Path(tempfile.mkdtemp(prefix="ae_gdpr_"))
    try:
        ds.repartition(4).write_parquet(str(table / "base"))
        files = sorted(
            os.path.join("base", f)
            for f in os.listdir(table / "base")
            if f.endswith(".parquet")
        )
        commit_snapshot(table, files, op="append")
        max_id = int(ds.max("doc_id"))
        targets = list(range(0, max_id + 1, 7))
        delete_rows(table, "doc_id", targets)

        rows = []
        for v in (0, 1):
            snap = read_snapshot(table, v)
            rows.append(
                {"version": v, "n_rows": int(snap.count()),
                 "sum_doc_id": int(snap.sum("doc_id"))}
            )
        return pd.DataFrame(rows).astype(np.int64)
    finally:
        shutil.rmtree(table, ignore_errors=True)


SQL_GDPR_DELETE = """
SELECT CAST(0 AS BIGINT) AS version, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
FROM documents
UNION ALL
SELECT 1, count(*), sum(doc_id) FROM documents WHERE doc_id % 7 <> 0
ORDER BY version
"""


def q_stream_sessionize(sf_dir: str):
    """Micro-batch streaming sessionization (pipelines/streaming.py):
    the events table processed as week-long arrival-time windows with
    carried keyed state (open session + permanent per-user session
    counter), watermark-closed emission, and per-batch snapshot
    checkpoints.  The output contract is IDENTICAL to the batch
    `sessionize` query — micro-batching is an execution strategy, not
    a semantics change — so this runs against the same SQL oracle;
    crash-resume parity is pytest-verified (test_streaming.py)."""
    import shutil
    import tempfile

    from ..streaming import read_emitted_sessions, run_sessionized_stream

    out = tempfile.mkdtemp(prefix="ae_stream_sess_")
    try:
        run_sessionized_stream(sf_dir, out, batch_hours=168)
        return read_emitted_sessions(out)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_incremental_ingest(sf_dir: str):
    """Incremental-ingestion lifecycle (pipelines/incremental.py): a
    sharded corpus arrives in two drops; each ``ingest_increment``
    extracts ONLY the new shards and publishes an atomic snapshot
    version whose manifest records the covered inputs.  Returns the
    per-version ledger (version, new_shards, delta rows, cumulative
    snapshot rows) plus an idempotency row (re-run with nothing new
    must be a no-op).  Rows-only at the driver gate; bit-exact
    equality of the final snapshot vs a from-scratch full extraction
    is pytest-verified (test_incremental.py)."""
    import shutil
    import tempfile
    from pathlib import Path

    from ...sources.synth import ensure_corpus_parquet
    from ...state.snapshots import read_snapshot
    from ..incremental import ingest_increment

    corpus = ensure_corpus_parquet("/tmp/ae_corpora", 2000, 42)
    shards = sorted(p for p in Path(corpus).iterdir() if p.suffix == ".parquet")
    staged = Path(tempfile.mkdtemp(prefix="ae_inc_staged_"))
    table = Path(tempfile.mkdtemp(prefix="ae_inc_table_"))
    try:
        rows = []
        for batch_shards, label in ((shards[: len(shards) // 2], "drop1"),
                                    (shards, "drop2"), (shards, "noop")):
            for s in batch_shards:
                if not (staged / s.name).exists():
                    shutil.copy(s, staged / s.name)
            s_i = ingest_increment(str(staged), table)
            total = (
                int(read_snapshot(table).count()) if s_i["version"] is not None else 0
            )
            rows.append(
                {"step": label, "version": s_i["version"],
                 "new_shards": s_i["new_shards"], "delta_rows": s_i["rows"],
                 "snapshot_rows": total}
            )
        out = pd.DataFrame(rows)
        for c in ("version", "new_shards", "delta_rows", "snapshot_rows"):
            out[c] = out[c].astype(np.int64)
        return out
    finally:
        shutil.rmtree(staged, ignore_errors=True)
        shutil.rmtree(table, ignore_errors=True)


# ---------------------------------------------------------------------------
# Content-addressed media-blob dedup across the interleaved corpus
# ---------------------------------------------------------------------------

#: distinct blob contents planted in the synthetic media corpus
_BLOB_GROUPS = 40
_MBD_BUCKETS = 16


def q_media_blob_dedup(sf_dir: str):
    """Content-addressed media deduplication across documents — the
    storage op an interleaved text+media corpus runs before anything
    else: identical image payloads referenced by many documents are
    stored ONCE, every ``media_ref`` remaps to the canonical blob, and
    the report quantifies bytes reclaimed per blob.

    Each document carries one real 24-bit BMP (``make_bmp``) whose
    content is a deterministic function of ``doc_id % _BLOB_GROUPS`` —
    exact cross-document duplicates, like a hotlinked logo on a crawl.
    The engine is plant-blind: every blob is sha256-hashed from its
    ACTUAL bytes and sized with ``len`` (no closed form on the Ray
    side); only the SQL oracle uses the planted arithmetic, so a single
    corrupted byte or mis-measured length flips the hash check.

    Scale shape: blobs never shuffle — each batch reduces to one
    ``(digest, min_ref, n, nbytes)`` candidate per distinct blob, and
    only those 72-byte rows move through a digest-bucket reduce (the
    :func:`..pipelines.tabular.dedup_exact_min` geometry).  Shuffle
    volume is bounded by blocks × distinct-blobs, independent of
    payload size."""
    import hashlib

    from ...stages.multimodal import make_bmp

    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)

    def blob_partials(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        dig = np.empty(len(ids), dtype=object)
        nbytes = np.empty(len(ids), dtype=np.int64)
        for j, i in enumerate(ids):
            g = int(i) % _BLOB_GROUPS
            w, h = 4 * (g % 8 + 1), g % 5 + 1
            blob = make_bmp(w, h, str(g).encode())
            dig[j] = hashlib.sha256(blob).hexdigest()
            nbytes[j] = len(blob)
        df = pd.DataFrame({"digest": dig, "ref": ids, "nbytes": nbytes})
        part = df.groupby("digest", as_index=False).agg(
            ref=("ref", "min"), n=("ref", "size"), nbytes=("nbytes", "first")
        )
        part["__bucket"] = pd.util.hash_array(part["digest"].to_numpy()) % _MBD_BUCKETS
        return part

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("digest", as_index=False).agg(
            canonical_ref=("ref", "min"), n_refs=("n", "sum"), blob_bytes=("nbytes", "first")
        )
        out["bytes_saved"] = (out["n_refs"] - 1) * out["blob_bytes"]
        for c in ("canonical_ref", "n_refs", "blob_bytes", "bytes_saved"):
            out[c] = out[c].astype(np.int64)
        return out[["canonical_ref", "n_refs", "blob_bytes", "bytes_saved"]]

    partials = ds.map_batches(blob_partials, batch_format="pyarrow")
    return partials.groupby("__bucket").map_groups(finalize, batch_format="pandas")

SQL_MEDIA_BLOB_DEDUP = """
WITH g AS (SELECT doc_id, doc_id % 40 AS grp FROM documents)
SELECT MIN(doc_id) AS canonical_ref,
       CAST(COUNT(*) AS BIGINT) AS n_refs,
       CAST(54 + 3 * (4 * (grp % 8 + 1)) * (grp % 5 + 1) AS BIGINT) AS blob_bytes,
       CAST((COUNT(*) - 1) * (54 + 3 * (4 * (grp % 8 + 1)) * (grp % 5 + 1)) AS BIGINT)
           AS bytes_saved
FROM g
GROUP BY grp
"""


_MDG_MIN_SIDE = 16
_MDG_MAX_ASPECT = 3


def q_media_dims_gate(sf_dir: str):
    """LAION-style image geometry gate: drop images whose shorter side
    is under ``_MDG_MIN_SIDE`` px or whose aspect ratio exceeds
    ``_MDG_MAX_ASPECT`` — the first filter every image-text corpus runs
    (LAION-5B used min-side and aspect cuts before any model scoring),
    with the verdict kept per ref so the drop set is reviewable.

    Plant-blind like :func:`q_media_blob_dedup`: each document's image
    is a REAL PNG built at dims that vary with doc_id, and the engine
    reads width/height by walking the actual IHDR chunk
    (:func:`..stages.multimodal.probe_png` verifies signature, layout
    and CRC — a corrupt byte raises rather than emitting garbage);
    only the SQL oracle uses the planted closed form.  ``too_small``
    outranks ``bad_aspect`` (a tiny skewed image reports the cheaper
    check, as the real pipelines short-circuit).  Stateless header
    probe → fully fused single scan, no shuffle; payload bytes never
    leave the task."""
    from ...stages.multimodal import make_png, probe_png

    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)

    def gate(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        w = np.empty(len(ids), dtype=np.int64)
        h = np.empty(len(ids), dtype=np.int64)
        for i, d in enumerate(ids):
            png = make_png(int(4 * (d % 23 + 1)), int(4 * (d * 7 % 19 + 1)))
            w[i], h[i], _, _ = probe_png(png)
        short, long_ = np.minimum(w, h), np.maximum(w, h)
        verdict = np.where(
            short < _MDG_MIN_SIDE,
            "too_small",
            np.where(long_ > _MDG_MAX_ASPECT * short, "bad_aspect", "ok"),
        )
        return pd.DataFrame(
            {"doc_id": ids.astype(np.int64), "width": w, "height": h,
             "verdict": verdict}
        )

    return ds.map_batches(gate, batch_format="pyarrow")


SQL_MEDIA_DIMS_GATE = f"""
WITH d AS (SELECT doc_id,
                  4 * ((doc_id % 23) + 1) AS width,
                  4 * (((doc_id * 7) % 19) + 1) AS height
           FROM documents)
SELECT doc_id, CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
       CASE WHEN least(width, height) < {_MDG_MIN_SIDE} THEN 'too_small'
            WHEN greatest(width, height) > {_MDG_MAX_ASPECT} * least(width, height)
                 THEN 'bad_aspect'
            ELSE 'ok' END AS verdict
FROM d
"""


# ---------------------------------------------------------------------------
# Curriculum ordering: difficulty-phased, in-phase hash-shuffled
# ---------------------------------------------------------------------------

_CURR_PHASES = 4
_CURR_BUCKETS = 64


def q_curriculum_order(sf_dir: str):
    """Curriculum data ordering (Bengio et al. 2009 shape): documents are
    globally ranked by a difficulty proxy (``n_chars``, tie → doc_id),
    cut into ``_CURR_PHASES`` equal phases (easy → hard, exact NTILE
    semantics), then deterministically shuffled WITHIN each phase by an
    md5 key so a trainer streaming phase-by-phase sees difficulty-
    homogeneous but content-mixed batches.

    Two bucketed rank passes, rows cross the wire once each and the
    driver only ever folds bucket COUNTS:

    1. global difficulty rank — the TeraSort shape of
       :func:`q_global_rank`: linspace value buckets over ``n_chars``
       (equal keys share a bucket, so cross-bucket ties are impossible),
       per-bucket counts → prefix-sum offsets broadcast back, in-bucket
       vectorized sort assigns ``rank``; ``phase`` is pure arithmetic on
       the rank (NTILE boundary table).  At web scale the linspace
       bounds become sampled quantiles (``sortmerge_join``'s sampler).
    2. in-phase shuffle rank — same geometry keyed on the md5 digest's
       top bits, which are uniform by construction, so the second pass
       is skew-proof at ANY corpus shape."""
    from ray.data.aggregate import Max, Min

    from ..tabular import md5_digest_words

    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"], split=True)
    rng = ds.aggregate(Min("n_chars"), Max("n_chars"))
    bounds = np.linspace(rng["min(n_chars)"], rng["max(n_chars)"], _CURR_BUCKETS + 1)[1:-1]

    def bucket_of(batch: pa.Table) -> pa.Table:
        v = batch["n_chars"].to_numpy(zero_copy_only=False)
        b = np.searchsorted(bounds, v, side="right").astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    bucketed = ds.map_batches(bucket_of, batch_format="pyarrow")
    counts = (
        bucketed.map_batches(
            lambda t: pd.DataFrame(
                {
                    "__bucket": pd.Series(
                        t["__bucket"].to_numpy(zero_copy_only=False)
                    ).value_counts().index,
                    "n": pd.Series(
                        t["__bucket"].to_numpy(zero_copy_only=False)
                    ).value_counts().to_numpy(),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby("__bucket")["n"]
        .sum()
    )
    full = counts.reindex(range(_CURR_BUCKETS), fill_value=0).to_numpy()
    offsets = np.concatenate([[0], np.cumsum(full)[:-1]])
    n_total = int(full.sum())  # total rows fall out of the same fold — no extra job
    # NTILE(k): first n%k tiles get ceil(n/k) rows
    base, rem = divmod(n_total, _CURR_PHASES)
    tile_ends = np.cumsum([base + (1 if t < rem else 0) for t in range(_CURR_PHASES)])
    off_bc = Broadcast((offsets, tile_ends))

    def rank_phase(df: pd.DataFrame) -> pd.DataFrame:
        offs, ends = off_bc.get()
        b = int(df["__bucket"].iloc[0])
        df = df.sort_values(["n_chars", "doc_id"], kind="stable")
        rank = offs[b] + np.arange(1, len(df) + 1, dtype=np.int64)
        df["phase"] = (np.searchsorted(ends, rank - 1, side="right") + 1).astype(np.int64)
        return df[["doc_id", "n_chars", "phase"]]

    phased = bucketed.groupby("__bucket").map_groups(rank_phase, batch_format="pandas")

    # pass 2: in-phase md5-shuffle rank, bucketed on the digest's top bits
    def hash_bucket(batch: pa.Table) -> pa.Table:
        hi, lo = md5_digest_words(batch["doc_id"])
        hi, lo = hi.astype(np.uint64), lo.astype(np.uint64)  # native-endian view
        ph = batch["phase"].to_numpy(zero_copy_only=False)
        hb = (hi >> np.uint64(58)).astype(np.int64)  # top 6 bits → 64 buckets
        return pa.Table.from_arrays(
            [
                batch["doc_id"],
                batch["n_chars"],
                batch["phase"],
                pa.array(hi),
                pa.array(lo),
                pa.array(ph * _CURR_BUCKETS + hb),
            ],
            names=["doc_id", "n_chars", "phase", "__hi", "__lo", "__pb"],
        )

    hb_ds = phased.map_batches(hash_bucket, batch_format="pyarrow")
    hb_counts = (
        hb_ds.map_batches(
            lambda t: pd.DataFrame(
                {
                    "__pb": pd.Series(t["__pb"].to_numpy(zero_copy_only=False))
                    .value_counts()
                    .index,
                    "n": pd.Series(t["__pb"].to_numpy(zero_copy_only=False))
                    .value_counts()
                    .to_numpy(),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby("__pb")["n"]
        .sum()
        .sort_index()
    )
    # per-phase prefix offsets over that phase's hash buckets
    pb_offsets: dict[int, int] = {}
    seen_per_phase: dict[int, int] = {}
    for pb, n in hb_counts.items():
        ph = int(pb) // _CURR_BUCKETS
        pb_offsets[int(pb)] = seen_per_phase.get(ph, 0)
        seen_per_phase[ph] = pb_offsets[int(pb)] + int(n)
    pbo_bc = Broadcast(pb_offsets)

    def rank_in_phase(df: pd.DataFrame) -> pd.DataFrame:
        pb = int(df["__pb"].iloc[0])
        df = df.sort_values(["__hi", "__lo", "doc_id"], kind="stable")
        df["phase_rank"] = pbo_bc.get()[pb] + np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["doc_id", "n_chars", "phase", "phase_rank"]]

    return hb_ds.groupby("__pb").map_groups(rank_in_phase, batch_format="pandas")


SQL_CURRICULUM_ORDER = f"""
WITH ranked AS (
  SELECT doc_id, n_chars,
         NTILE({_CURR_PHASES}) OVER (ORDER BY n_chars, doc_id) AS phase
  FROM documents)
SELECT doc_id, n_chars, CAST(phase AS BIGINT) AS phase,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY phase
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS phase_rank
FROM ranked
"""


