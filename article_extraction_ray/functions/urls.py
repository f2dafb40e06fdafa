"""URL resolution/normalization (reference S2).

Re-derived semantics from /root/reference/tables/other/url_solver.py:
- arXiv abs/pdf/html links canonicalize to the pdf URL;
- Wiley ``/doi/full/`` rewrites to ``/doi/pdf/`` (first occurrence);
- trailing punctuation stripped; multi-line cells take the first line;
- fallback: first plausible URL found anywhere in the cell;
- a "plausible" URL is http(s), has a netloc, no whitespace, no commas.

The patterns below are assembled from named pieces so the matching rule
each piece encodes (new-style arXiv id = YYMM.number + optional short
version tag; a URL token stops at whitespace/comma/semicolon) is explicit
and independently testable.
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

__all__ = ["resolve_url", "find_urls"]

# new-style arXiv identifier: 4-digit YYMM, dot, 4-5 digit number, and an
# optional "v" + up-to-2-digit version suffix
_YYMM = "[0-9]{4}"
_NUMBER = "[0-9]{4,5}"
_VERSION = "(?:v[0-9]{0,2})?"
_ARXIV_ID = re.compile(
    "arxiv" + re.escape(".org/") + "(?:abs|pdf|html)/" + f"({_YYMM}\\.{_NUMBER}{_VERSION})"
)
# a bare link that already points at a .pdf (query string / fragment ok)
_DIRECT_PDF = re.compile("^https?://" + ".+" + re.escape(".pdf") + "(?:$|[?#])", re.IGNORECASE)
# URL tokens end at whitespace or the list separators the sheets use
_STOP_CHARS = r"\s,;"
_ANY_URL = re.compile(f"https?://[^{_STOP_CHARS}]+", re.IGNORECASE)
_TRAILING = " \t\r\n).,;:!?]"


def _plausible(url: str) -> bool:
    parsed = urlparse(url)
    if parsed.scheme.lower() not in ("http", "https") or not parsed.netloc:
        return False
    if any(c.isspace() for c in url):
        return False
    return "," not in url


def _arxiv_candidate(aid: str) -> str:
    tail = aid if aid.lower().endswith(".pdf") else f"{aid}.pdf"
    return f"https://arxiv.org/pdf/{tail}"


def find_urls(text: str) -> list[str]:
    out: list[str] = []
    for m in _ANY_URL.finditer(text or ""):
        cand = m.group(0).rstrip(_TRAILING)
        if _plausible(cand) and cand not in out:
            out.append(cand)
    return out


def resolve_url(raw: str) -> str | None:
    """Canonical fetchable URL for a 'Link' cell, or None when no valid
    URL exists (the reference raises; a batch engine returns a null and
    lets the caller filter — row-level skip semantics, SURVEY §4)."""
    cleaned = (raw or "").strip().rstrip(_TRAILING)
    if not cleaned:
        return None
    if "onlinelibrary.wiley.com/doi/full/" in cleaned:
        cleaned = cleaned.replace("/doi/full/", "/doi/pdf/", 1)

    ids = _ARXIV_ID.findall(cleaned)
    if ids:
        candidate = _arxiv_candidate(ids[0])
    elif _DIRECT_PDF.match(cleaned):
        candidate = cleaned
    else:
        candidate = cleaned.splitlines()[0]

    if candidate and _plausible(candidate):
        return candidate
    found = find_urls(cleaned)
    return found[0] if found else None


# ---------------------------------------------------------------------------
# Crawl-frontier canonicalization (beyond the reference: the dedupe key
# a web-scale crawler computes before URL-level dedup)
# ---------------------------------------------------------------------------

#: tracking parameters dropped during canonicalization
_TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "msclkid")

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str) -> str:
    """Canonical form for URL-level dedup:

    - scheme and host lowercased;
    - default port stripped (``:80`` http, ``:443`` https);
    - fragment dropped;
    - tracking params dropped (``utm_*``, ``fbclid``, ``gclid``,
      ``msclkid``), remaining query params sorted by (key, value);
    - trailing slash stripped from non-root paths; empty path → ``/``.

    Deterministic and idempotent: canonicalize(canonicalize(u)) ==
    canonicalize(u) (property-tested)."""
    from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path.rstrip("/") or "/"
    keep = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if not (k.startswith("utm_") or k in _TRACKING_PARAMS[1:])
    ]
    query = urlencode(sorted(keep))
    return urlunsplit((scheme, netloc, path, query, ""))
