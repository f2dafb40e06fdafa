"""The driver that records BENCH_r{N}.json keeps only a ~2000-char
stdout tail and json-parses from it — round 3's 105-query line
overflowed it and was recorded unparsed.  These pin the budget logic
without running the bench."""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def _fit(base: dict, timings: dict, budget: int) -> dict:
    # mirror of bench.run_bench's fitting loop
    fitted: dict[str, float] = {}
    for name, sec in timings.items():
        fitted[name] = sec
        if len(json.dumps(dict(base, queries=fitted))) > budget:
            del fitted[name]
            break
    return dict(base, queries=fitted)


def _base(n: int) -> dict:
    return {
        "metric": "flagship_extraction_sec",
        "value": 2.671,
        "unit": "sec",
        "sf": "sf0.1",
        "num_cpus": 32,
        "docs": 100000,
        "rows_out": 94761,
        "docs_per_sec": 37442.29,
        "queries_n": n,
        "queries_sum_sec": 99.46,
        "queries_full": "BENCH_FULL.json",
    }


def test_line_never_exceeds_budget_even_with_many_queries():
    import bench

    timings = {q: 123.456 for q in bench.BENCH_QUERIES}
    line = json.dumps(_fit(_base(len(timings)), timings, 1800))
    assert len(line) <= 1800
    parsed = json.loads(line)
    assert parsed["value"] == 2.671 and parsed["queries"]


def test_all_fit_when_under_budget():
    timings = {f"q{i}": 1.0 for i in range(10)}
    out = _fit(_base(10), timings, 1800)
    assert len(out["queries"]) == 10


def test_priority_order_is_preserved():
    import bench

    timings = {q: 1.234 for q in bench.BENCH_QUERIES}
    out = _fit(_base(len(timings)), timings, 1800)
    kept = list(out["queries"])
    assert kept == bench.BENCH_QUERIES[: len(kept)]  # prefix, no gaps
