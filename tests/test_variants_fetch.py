"""Named output-table variants (reference paper_information_table.py:359-363)
and the S1 fetch-stage actor contract (paper_document_table.py:60-106)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _gold_rows(n=20, offset=0):
    import pyarrow as pa

    from article_extraction_ray.schema import PAPER_INFORMATION_SCHEMA

    cols = {}
    for f in PAPER_INFORMATION_SCHEMA:
        if f.type == pa.string():
            cols[f.name] = [f"s{i}" for i in range(n)]
        elif f.type == pa.int64():
            cols[f.name] = list(range(offset, offset + n))
        else:
            cols[f.name] = [float(i) for i in range(n)]
    return pa.table(cols, schema=PAPER_INFORMATION_SCHEMA)


class TestVariants:
    def test_side_by_side_write_read_list(self, ray_session, tmp_path):
        import ray.data as rd

        from article_extraction_ray.state.variants import (
            list_variants,
            read_variant,
            write_variant,
        )

        root = tmp_path / "tables"
        for name, off in (("paper_information", 0), ("paper_information_llm", 100),
                          ("paper_information_qa", 200)):
            write_variant(rd.from_arrow(_gold_rows(offset=off)), root, name, num_partitions=4)
        assert list_variants(root) == [
            "paper_information", "paper_information_llm", "paper_information_qa"
        ]
        llm = read_variant(root, "paper_information_llm").to_pandas()
        assert len(llm) == 20
        assert llm["id_paper"].min() == 100

    def test_schema_drift_rejected(self, ray_session, tmp_path):
        import ray.data as rd

        from article_extraction_ray.state.variants import write_variant

        bad = rd.from_arrow(pa.table({"id_paper": [1, 2], "wrong": ["a", "b"]}))
        with pytest.raises(Exception):
            write_variant(bad, tmp_path / "tables", "paper_information_bad")

    def test_bad_name_rejected(self, tmp_path):
        from article_extraction_ray.state.variants import variant_path

        with pytest.raises(ValueError):
            variant_path(tmp_path, "../escape")


class TestFetchStage:
    def test_content_type_routing(self):
        from article_extraction_ray.sources.fetch import doc_type_from_content_type as f

        assert f("application/pdf") == "pdf"
        assert f("text/html; charset=utf-8") == "html"
        assert f("application/xml") == "html"
        assert f("text/plain") == "txt"
        assert f("application/json") == "json"
        assert f("application/octet-stream") == "bin"
        assert f("") == "bin"

    def test_batch_contract_and_row_isolation(self, ray_session):
        import ray.data as rd

        from article_extraction_ray.sources.fetch import FETCHED_SCHEMA, FetchStage

        urls = ["http://x/a.pdf", "http://x/b.html", "http://x/c.json", "http://x/raw"]
        ds = rd.from_items([{"url": u} for u in urls])
        out = ds.map_batches(FetchStage, batch_format="pyarrow", concurrency=1).to_pandas()
        assert len(out) == 4
        # the streaming executor does not guarantee block order — compare
        # per-url, not positionally
        by_url = out.set_index("url")
        assert by_url.loc[urls, "doc_type"].tolist() == ["pdf", "html", "json", "bin"]
        assert (out["status"] == "ok").all()
        # deterministic payloads
        stage = FetchStage()
        again = stage(pa.table({"url": urls}))
        assert again["payload"].to_pylist() == [
            bytes(b) for b in by_url.loc[urls, "payload"]
        ]
        assert again.schema.equals(FETCHED_SCHEMA)

    def test_real_backend_constructs_offline(self):
        """Session construction is per-actor __init__ work — it must
        succeed offline (the live GET path is pytest -m real)."""
        from article_extraction_ray.sources.fetch import FetchStage

        assert FetchStage(backend="real")._opener is not None
        with pytest.raises(ValueError):
            FetchStage(backend="bogus")
