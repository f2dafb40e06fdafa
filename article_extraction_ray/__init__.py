"""article_extraction_ray — a Ray-Data-native main-content extraction engine.

A brand-new engine with the query/data-processing capabilities of the
reference repo ``opalien/article_extraction`` (studied read-only at
/root/reference), re-expressed Ray-Data-first:

- input corpora are Lance/Parquet tables of interleaved text+media
  documents ``(doc_id: string, spans: list<struct<kind, text, media_ref,
  offset:int32>>)``;
- every stage is a ``ray.data.Dataset`` transform (``map_batches`` over
  zero-copy Arrow batches; actor pools for stateful parser stages);
- per-document span reconstruction uses a salted ``groupby(doc_id)``
  shuffle for giant documents and a fused no-shuffle path for small ones;
- output is partitioned Parquet with per-partition lineage manifests for
  checkpoint/resume.

Nothing here imports from the reference; semantics are re-derived from
its public behavior (file:line citations live in the docstrings).
"""

__version__ = "0.1.0"

# Close a thread-race in ray.data's lazy fsspec-http import before any
# driver thread can hit it (see _compat module docstring).
from ._compat import install_fsspec_http_stub as _install_fsspec_http_stub

_install_fsspec_http_stub()
del _install_fsspec_http_stub
