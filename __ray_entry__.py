"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in the library) initializes/shuts down Ray.

- ``entry()`` — flagship extraction pipeline over a deterministic
  synthetic interleaved text+media corpus (the BASELINE.json input_hint
  shape; /root/testdata has no such table, so it is synthesized to /tmp
  once, seed=42).
- ``queries()`` — one callable per implemented operator from SURVEY.md §2
  (plus the scale ops: dedup, similarity search, text analysis).
- ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible
  query; non-SQL-expressible ops (extraction, fuzzy JW paths, sketches)
  are covered by pytest goldens instead and get rows-only checks here.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

_CORPUS_CACHE = "/tmp/ae_corpora"
_ENTRY_DOCS = 500
_SEED = 42


def _corpus_docs_for(sf_dir: str) -> int:
    """Deterministic corpus size per scale factor directory name."""
    name = Path(sf_dir).name  # e.g. "sf0.01"
    try:
        sf = float(name.replace("sf", ""))
    except ValueError:
        sf = 0.001
    return max(500, int(sf * 1_000_000))


def entry() -> Any:
    """Flagship pipeline on a sf0.001-sized synthetic corpus."""
    from article_extraction_ray.pipelines.flagship import run_flagship
    from article_extraction_ray.sources.synth import ensure_corpus_parquet

    corpus = ensure_corpus_parquet(_CORPUS_CACHE, _ENTRY_DOCS, _SEED)
    return run_flagship(corpus, out_dir=None, mode="hybrid")


def _flagship_query(mode: str):
    def run(sf_dir: str) -> Any:
        from article_extraction_ray.pipelines.flagship import run_flagship
        from article_extraction_ray.sources.synth import ensure_corpus_parquet

        corpus = ensure_corpus_parquet(_CORPUS_CACHE, _corpus_docs_for(sf_dir), _SEED)
        return run_flagship(corpus, out_dir=None, mode=mode)

    return run


def queries() -> dict[str, Callable[[str], Any]]:
    from article_extraction_ray.pipelines import queries as q

    out: dict[str, Callable[[str], Any]] = dict(q.QUERIES)
    out["flagship_extract"] = _flagship_query("hybrid")
    return out


def oracle_sql() -> dict[str, str]:
    from article_extraction_ray.pipelines import queries as q

    return dict(q.ORACLE_SQL)
