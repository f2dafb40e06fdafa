"""S1 — HTTP document fetcher as an actor-pool stage (reference
/root/reference/tables/paper_document_table.py:60-106).

Offline sandbox: ``backend="real"`` raises (no network here); the
deterministic fake backend exercises every piece the distributed engine
owns — the actor signature (session built once per actor), the batch
contract (urls in → doc_type + binary payload + status out), content-type
routing, and the per-row error isolation (one bad URL nulls its row, it
never kills the batch).  Production swaps ``backend="real"`` in and the
``__init__`` builds the HTTP session/pool exactly where the comment
marks it.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

#: reference HEADERS/TIMEOUT (paper_document_table.py:24-30)
DEFAULT_TIMEOUT = 30.0
DEFAULT_USER_AGENT = "article-extraction-ray/1.0"


def doc_type_from_content_type(content_type: str) -> str:
    """Content-Type → doc_type routing (paper_document_table.py:59-70)."""
    ct = (content_type or "").lower()
    if "pdf" in ct:
        return "pdf"
    if "html" in ct or "xml" in ct:
        return "html"
    if ct.startswith("text/") or "charset" in ct:
        return "txt"
    if "json" in ct:
        return "json"
    return "bin"


FETCHED_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("doc_type", pa.string()),
        pa.field("payload", pa.large_binary()),
        pa.field("status", pa.string()),  # "ok" | error repr
    ]
)


class FetchStage:
    """Actor-pool batch fn: rows with a ``url`` column → FETCHED_SCHEMA.

    Use as ``ds.map_batches(FetchStage, concurrency=N, batch_size=B,
    num_cpus=0.25)`` — fetching is I/O-bound, so fractional CPUs let one
    node host many fetch actors without starving compute stages.
    """

    def __init__(self, *, backend: str = "fake", timeout: float = DEFAULT_TIMEOUT,
                 user_agent: str = DEFAULT_USER_AGENT, url_col: str = "url"):
        self.backend = backend
        self.timeout = timeout
        self.user_agent = user_agent
        self.url_col = url_col
        self._opener = None
        if backend == "real":
            # the session/pool is built ONCE PER ACTOR here (the reference
            # uses a requests.Session; the stdlib opener carries the same
            # per-actor-connection semantics without extra deps).  This
            # container has no network, so construction succeeds but every
            # fetch rows an error — pytest -m real exercises the live path
            # when a network exists.
            import urllib.request

            self._opener = urllib.request.build_opener()
            self._opener.addheaders = [("User-Agent", user_agent)]
        elif backend != "fake":
            raise ValueError(f"unknown backend {backend!r}")

    def _fetch_real(self, url: str) -> tuple[str, bytes, str]:
        """Live GET: raise-for-status via urlopen's HTTPError, doc_type
        from the response Content-Type (paper_document_table.py:72-77)."""
        with self._opener.open(url, timeout=self.timeout) as resp:
            ct = resp.headers.get("Content-Type", "")
            payload = resp.read()
        return doc_type_from_content_type(ct), payload, "ok"

    def _fetch_one(self, url: str) -> tuple[str, bytes, str]:
        """One URL → (doc_type, payload, status); reference semantics:
        raise_for_status, doc_type from Content-Type
        (paper_document_table.py:72-77)."""
        if self.backend == "real":
            return self._fetch_real(url)
        # deterministic fake: content type keyed on the url suffix, payload
        # a reproducible digest-seeded blob
        if url.endswith(".pdf"):
            ct = "application/pdf"
        elif url.endswith((".html", ".htm", "/")):
            ct = "text/html; charset=utf-8"
        elif url.endswith(".json"):
            ct = "application/json"
        elif url.endswith(".txt"):
            ct = "text/plain"
        else:
            ct = "application/octet-stream"
        payload = hashlib.blake2b(url.encode("utf-8"), digest_size=32).digest()
        return doc_type_from_content_type(ct), payload, "ok"

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch[self.url_col].to_pylist()
        types, payloads, statuses = [], [], []
        for url in urls:
            try:
                t, p, s = self._fetch_one(url or "")
            except Exception as exc:  # per-row isolation: a bad URL nulls
                t, p, s = None, None, f"error: {exc!r}"  # its row only
            types.append(t)
            payloads.append(p)
            statuses.append(s)
        return pa.Table.from_arrays(
            [
                pa.array(urls, type=pa.string()),
                pa.array(types, type=pa.string()),
                pa.array(payloads, type=pa.large_binary()),
                pa.array(statuses, type=pa.string()),
            ],
            names=["url", "doc_type", "payload", "status"],
        )
