"""Lance-branch contract tests for the corpus I/O facade.

SURVEY §1 / BASELINE.json name Lance tables as the production corpus
format; ``pylance`` is absent in this sandbox, so these tests pin the
DISPATCH CONTRACT with a fake backend instead of the real reader: a
``.lance`` path must route to ``ray.data.read_lance`` /
``Dataset.write_lance`` with the documented arguments (columns pruned,
filter as a SQL string, block-count override), and whatever the Lance
branch serves must be indistinguishable from the Parquet branch on the
same rows — same schema, same data — so swapping the storage format
cannot change pipeline semantics.  If the facade drifts (argument
renames, a lost filter, a schema-mangling wrapper), these fail without
pylance ever being installed.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from article_extraction_ray.sources.io import read_corpus, write_corpus


@pytest.fixture()
def corpus_file(ray_session, tmp_path):
    """A tiny DOCUMENT_SCHEMA-shaped corpus as a parquet file (the fake
    lance backend serves these same rows)."""
    tbl = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c"]),
            "spans": pa.array(
                [
                    [{"kind": "html", "text": "<p>x</p>", "media_ref": "", "offset": 0}],
                    [{"kind": "media", "text": "", "media_ref": "m1", "offset": 0}],
                    [{"kind": "text", "text": "plain", "media_ref": "", "offset": 0}],
                ],
                type=pa.list_(
                    pa.struct(
                        [
                            pa.field("kind", pa.string()),
                            pa.field("text", pa.string()),
                            pa.field("media_ref", pa.string()),
                            pa.field("offset", pa.int32()),
                        ]
                    )
                ),
            ),
            "n_bytes": pa.array([8, 0, 5], type=pa.int64()),
        }
    )
    f = tmp_path / "corpus.parquet"
    pq.write_table(tbl, f)
    return str(f)


class TestReadDispatch:
    def test_lance_branch_serves_identical_schema_and_rows(
        self, corpus_file, monkeypatch
    ):
        """read_corpus('.lance') must call ray.data.read_lance with the
        documented signature AND produce data identical to the parquet
        branch reading the same rows."""
        import ray.data as rd

        calls = []

        def fake_read_lance(path, *, columns=None, filter=None, override_num_blocks=None):
            calls.append(
                {"path": path, "columns": columns, "filter": filter,
                 "override_num_blocks": override_num_blocks}
            )
            # the fake backend serves the SAME rows from parquet, with the
            # column pruning a real Lance scan would apply
            return rd.read_parquet(corpus_file, columns=columns)

        monkeypatch.setattr(rd, "read_lance", fake_read_lance)

        got = read_corpus(
            "/data/corpus.lance", columns=["doc_id", "n_bytes"],
            filter_sql="n_bytes > 0",
        ).to_pandas()
        want = read_corpus(corpus_file, columns=["doc_id", "n_bytes"]).to_pandas()

        assert len(calls) == 1
        assert calls[0]["path"] == "/data/corpus.lance"
        assert calls[0]["columns"] == ["doc_id", "n_bytes"]
        assert calls[0]["filter"] == "n_bytes > 0"  # SQL string, not an expr
        assert calls[0]["override_num_blocks"] is not None

        pd.testing.assert_frame_equal(
            got.sort_values("doc_id").reset_index(drop=True),
            want.sort_values("doc_id").reset_index(drop=True),
        )

    def test_pyarrow_filter_without_sql_raises(self):
        """A pyarrow expression can't push into a Lance scan; silently
        full-scanning would be wrong, so the facade must refuse."""
        import pyarrow.dataset as pads

        with pytest.raises(ValueError, match="filter_sql"):
            read_corpus("/data/corpus.lance", filter=pads.field("n_bytes") > 0)

    def test_missing_pylance_is_a_clear_error(self, monkeypatch):
        import ray.data as rd

        def boom(*a, **k):
            raise ImportError("No module named 'lance'")

        monkeypatch.setattr(rd, "read_lance", boom)
        with pytest.raises(RuntimeError, match="pylance"):
            read_corpus("/data/corpus.lance")


class TestWriteDispatch:
    def test_lance_branch_called_with_path(self, corpus_file, monkeypatch):
        import ray.data as rd

        ds = read_corpus(corpus_file)
        calls = []
        monkeypatch.setattr(
            rd.Dataset, "write_lance",
            lambda self, path, **kw: calls.append((path, kw)),
        )
        write_corpus(ds, "/data/out.lance")
        assert calls == [("/data/out.lance", {})]

    def test_parquet_branch_roundtrips(self, corpus_file, tmp_path):
        """The parquet branch (the sandbox-exercised one) must write a
        directory read_corpus reads back with the identical schema."""
        ds = read_corpus(corpus_file)
        out = tmp_path / "out_pq"
        write_corpus(ds, str(out))
        back = read_corpus(str(out))
        assert back.schema().names == ds.schema().names
        a = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = back.to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
