"""String similarity + normalization kernels (reference §2h).

Re-derived semantics (not copied code) from:
- Jaro / Jaro-Winkler: /root/reference/tables/paper_information_table.py:464-521
  and /root/reference/results/t1/scores.py:222-294 (two byte-identical
  algorithms; the only textual difference — clamping the match window to
  ≥0 — is unreachable behavior, so one implementation serves both).
- Levenshtein: /root/reference/results/t1/scores.py:190-219.
- country/hardware normalizers: paper_information_table.py:434-443,553-562
  (identical bodies: lowercase, non-alnum→space, collapse whitespace).
- token splitters: paper_information_table.py:446-461 (country: , ; /)
  and :565-582 (hardware: additionally + & " and ").
- eval cell normalizer: /root/reference/results/t1/scores.py:175-187.
"""

from __future__ import annotations

import math
import re

__all__ = [
    "jaro_similarity",
    "jaro_winkler_similarity",
    "jaro_winkler_distance",
    "levenshtein_distance",
    "normalized_levenshtein_distance",
    "normalize_name",
    "split_list_tokens",
    "normalise_cell",
]


def jaro_similarity(a: str, b: str) -> float:
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(max(la, lb) // 2 - 1, 0)

    a_hit = bytearray(la)
    b_hit = bytearray(lb)
    m = 0
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(i + window + 1, lb)
        for j in range(lo, hi):
            if not b_hit[j] and b[j] == ca:
                a_hit[i] = b_hit[j] = 1
                m += 1
                break
    if m == 0:
        return 0.0

    t = 0
    j = 0
    for i in range(la):
        if not a_hit[i]:
            continue
        while not b_hit[j]:
            j += 1
        if a[i] != b[j]:
            t += 1
        j += 1
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler_similarity(a: str, b: str, prefix_scale: float = 0.1) -> float:
    j = jaro_similarity(a, b)
    prefix = 0
    for ca, cb in zip(a, b):
        if ca != cb:
            break
        prefix += 1
        if prefix == 4:
            break
    return j + prefix * prefix_scale * (1.0 - j)


def jaro_winkler_distance(a: str, b: str) -> float:
    return 1.0 - jaro_winkler_similarity(a, b)


def levenshtein_distance(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def normalized_levenshtein_distance(a: str, b: str) -> float:
    if not a and not b:
        return 0.0
    return levenshtein_distance(a, b) / max(len(a), len(b))


def normalize_name(value: str) -> str:
    """Lowercase, map non-alphanumeric (except whitespace) to space,
    collapse runs of whitespace — the shared country/hardware normalizer."""
    lowered = value.strip().lower()
    mapped = "".join(ch if (ch.isalnum() or ch.isspace()) else " " for ch in lowered)
    return " ".join(mapped.split())


def split_list_tokens(raw: object, *, hardware: bool = False) -> list[str]:
    """Split a multi-valued cell into stripped, order-preserving-deduped
    fragments.  Separators: ``, ; /`` always; hardware cells additionally
    split on ``+ &`` and the word ``and``."""
    if raw is None:
        return []
    value = str(raw).strip()
    if not value or value.lower() == "nan":
        return []
    tmp = value.replace("/", ",").replace(";", ",")
    if hardware:
        tmp = tmp.replace("+", ",").replace("&", ",").replace(" and ", ",")
    seen: set[str] = set()
    out: list[str] = []
    for frag in tmp.split(","):
        frag = frag.strip()
        if not frag:
            continue
        key = frag.lower()
        if key not in seen:
            seen.add(key)
            out.append(frag)
    return out


_WS = re.compile(r"\s+")
_NULLISH = {"nan", "none", "null", ""}


def normalise_cell(value: object) -> str:
    """Eval-harness cell normalizer: None/NaN/'nan'/'null' → "", collapse
    whitespace (/root/reference/results/t1/scores.py:175-187)."""
    if value is None:
        return ""
    if isinstance(value, (int, float)):
        if isinstance(value, float) and math.isnan(value):
            return ""
        return str(value)
    text = _WS.sub(" ", str(value)).strip()
    return "" if text.lower() in _NULLISH else text
