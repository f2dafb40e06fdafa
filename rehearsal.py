"""Size rehearsal: run the headline pipelines at millions-of-docs scale
on this box and record wall time, driver RSS high-water and object-store
spill — the evidence BASELINE.md cites that the engine's shapes hold
when the toy corpus is replaced by something that no longer fits in one
worker's lap.

Phases (each timed separately):
  1. corpus-gen   — distributed synthesis + partitioned parquet write
  2. flagship     — full extraction pipeline, hybrid mode, resumable sink
  3. near-dedup   — text derivation + exact-prepass + budget-routed
                    MinHash pair path + connected components + loser
                    count, over a corpus with a planted 50% exact-dup
                    rate (every doc duplicated once) so the pre-pass and
                    the Dataset pair route do real work
  4. training-mix — the training-ordering kernels (TeraSort md5 rank +
                    distributed prefix-scan packing) over N synthetic
                    rows

Usage: python rehearsal.py [num_docs]   (default 8_000_000)
Owns its Ray session (script entry point, not library code).
"""

from __future__ import annotations

import json
import resource
import shutil
import sys
import time


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def spilled_mb() -> float:
    try:
        from ray._private.internal_api import memory_summary

        s = memory_summary(stats_only=True)
        for line in s.splitlines():
            if "Spilled" in line:
                # e.g. "Spilled 1234 MiB, ..."
                return float(line.split("Spilled")[1].split("MiB")[0].strip())
    except Exception:
        pass
    return 0.0


def main() -> None:
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data as rd

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from article_extraction_ray.pipelines.flagship import run_flagship
    from article_extraction_ray.sources.synth import ensure_corpus_parquet

    report: dict = {"num_docs": n_docs}

    t0 = time.monotonic()
    corpus = ensure_corpus_parquet("/tmp/ae_big", n_docs, 7)
    report["gen_sec"] = round(time.monotonic() - t0, 1)

    out = "/tmp/ae_big_out"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.monotonic()
    summary = run_flagship(corpus, out, mode="hybrid", num_partitions=256)
    report["flagship_sec"] = round(time.monotonic() - t0, 1)
    report["flagship_rows"] = summary["rows"]
    report["flagship_docs_per_sec"] = round(n_docs / report["flagship_sec"], 0)
    report["rss_gb_after_flagship"] = round(rss_gb(), 2)
    shutil.rmtree(out, ignore_errors=True)

    # --- near-dedup over a controlled-dup text corpus ------------------
    # (the flagship span corpus is built from a shared sentence pool, so
    # almost every doc pair is a TRUE near-dup of every other — a
    # quadratic pair list by construction, wrong for a throughput
    # rehearsal.  Generate a web-crawl-shaped corpus instead: unique
    # word-salad bodies, 25% exact dups (i%4==3 copies i-1), ~14%
    # near-dups (i%7==6 truncates i-2 by two words) — all deterministic
    # and distributed, no driver loop.)
    dedup_docs = min(n_docs, 4_000_000)

    def synth_text(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = ids.copy()
        base[ids % 4 == 3] -= 1  # exact dup of predecessor
        trunc = (ids % 7 == 6) & (ids % 4 != 3)
        base[trunc] = np.maximum(ids[trunc] - 2, 0)
        L = 60
        j = np.arange(L, dtype=np.uint64)
        with np.errstate(over="ignore"):  # wrapping uint64 mix is the point
            h = (base.astype(np.uint64)[:, None] * np.uint64(0x9E3779B97F4A7C15)) ^ (
                (j[None, :] + np.uint64(1)) * np.uint64(0xC2B2AE3D27D4EB4F)
            )
            h = (h ^ (h >> np.uint64(29))) * np.uint64(0xBF58476D1CE4E5B9)
        tok = (h % np.uint64(50021)).astype(np.int64)
        texts = [
            " ".join(f"w{t}" for t in row[: L - 2 if cut else L])
            for row, cut in zip(tok, trunc)
        ]
        return pa.table({"doc_id": pa.array(ids), "text": pa.array(texts, type=pa.string())})

    from article_extraction_ray.stages.dedup import near_dedup_edges

    t0 = time.monotonic()
    text_ds = (
        rd.range(dedup_docs, override_num_blocks=64)
        .map_batches(synth_text, batch_format="pyarrow")
        .materialize()
    )
    report["dedup_corpus_sec"] = round(time.monotonic() - t0, 1)
    t0 = time.monotonic()
    edges = near_dedup_edges(text_ds, threshold=0.8, bands=8).materialize()
    report["near_dedup_sec"] = round(time.monotonic() - t0, 1)
    report["near_dedup_input_docs"] = dedup_docs
    report["near_dedup_edges"] = edges.count()
    report["rss_gb_after_dedup"] = round(rss_gb(), 2)

    # --- training-order kernels over n_docs rows ----------------------
    from article_extraction_ray.stages.scan import grouped_prefix_sum

    t0 = time.monotonic()
    rows = rd.range(n_docs, override_num_blocks=64)

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tok = (ids % 409) + 16
        return pa.table({
            "doc_id": pa.array(ids),
            "split": pa.array((ids % 4).astype(np.int64)),
            "n_tokens": pa.array(tok),
        })

    toks = rows.map_batches(keyed, batch_format="pyarrow")
    scanned = grouped_prefix_sum(
        toks, order_col="doc_id", group_col="split", value_col="n_tokens",
        max_order=n_docs - 1,
    )
    total = scanned.sum("n_tokens")
    report["training_scan_sec"] = round(time.monotonic() - t0, 1)
    report["training_scan_token_sum"] = int(total)

    report["rss_gb_final"] = round(rss_gb(), 2)
    report["spilled_mb"] = spilled_mb()
    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
