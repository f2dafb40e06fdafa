"""Fuzzy broadcast lookups: country and hardware (reference J3/J4).

Re-derived semantics from /root/reference/tables/paper_information_table.py:
- country (``:524-549``): split multi-valued cell → normalize → alias map
  (``:426-431``) → skip ignore-tokens (``:416-424``) → vs every country:
  substring containment (either direction) ⇒ distance 0, else
  Jaro-Winkler distance; argmin wins (strictly-less update, so the first
  catalog entry wins ties).
- hardware (``:617-647``): tokens (also split on + & "and") → containment
  ⇒ similarity 1.0 else JW similarity; argmax (strictly-greater update);
  the caller applies HARDWARE_MATCH_THRESHOLD = 0.90
  (/root/reference/config.py:7).

These are classic broadcast joins with a non-equi similarity predicate:
the dimension tables are small (~100s of rows), so they are shipped once
via ``ray.put`` and scanned per token inside ``map_batches`` — never a
distributed shuffle join.
"""

from __future__ import annotations

from typing import Optional, Sequence

from .strings import jaro_winkler_distance, jaro_winkler_similarity, normalize_name, split_list_tokens

HARDWARE_MATCH_THRESHOLD = 0.90

IGNORED_COUNTRY_TOKENS = frozenset(
    {"multinational", "multiple countries", "various", "global", "unspecified", "unknown", "n a"}
)

COUNTRY_ALIASES = {
    "korea republic of": "korea republic of",
    "republic of korea": "korea republic of",
    "south korea": "korea republic of",
    "korea": "korea republic of",
}

__all__ = [
    "HARDWARE_MATCH_THRESHOLD",
    "IGNORED_COUNTRY_TOKENS",
    "COUNTRY_ALIASES",
    "build_country_index",
    "build_hardware_catalog",
    "select_country_id",
    "select_hardware_info",
]


def build_country_index(ids: Sequence[int], names: Sequence[str]) -> list[tuple[int, str]]:
    """(id, normalized-name) pairs; empty normalizations dropped."""
    out = []
    for i, name in zip(ids, names):
        norm = normalize_name(str(name))
        if norm:
            out.append((int(i), norm))
    return out


def build_hardware_catalog(
    ids: Sequence[int],
    names: Sequence[str],
    computes: Sequence[Optional[float]],
    powers: Sequence[Optional[float]],
) -> list[tuple[int, str, Optional[float], Optional[float]]]:
    out = []
    for i, name, c, p in zip(ids, names, computes, powers):
        out.append(
            (
                int(i),
                normalize_name(str(name)),
                None if c is None else float(c),
                None if p is None else float(p),
            )
        )
    return out


def select_country_id(raw: object, countries: Sequence[tuple[int, str]]) -> Optional[int]:
    best_id: Optional[int] = None
    best_dist = float("inf")
    for token in split_list_tokens(raw):
        norm = normalize_name(token)
        if not norm:
            continue
        norm = COUNTRY_ALIASES.get(norm, norm)
        if norm in IGNORED_COUNTRY_TOKENS:
            continue
        for cid, cname in countries:
            if norm in cname or cname in norm:
                dist = 0.0
            else:
                dist = jaro_winkler_distance(norm, cname)
            if dist < best_dist:
                best_dist = dist
                best_id = cid
    return best_id


def select_hardware_info(
    raw: object,
    catalog: Sequence[tuple[int, str, Optional[float], Optional[float]]],
) -> tuple[Optional[int], Optional[float], Optional[float], Optional[float]]:
    """(id, compute, power, similarity) of the best-matching hardware, or
    all-None when the cell has no tokens / the catalog is empty."""
    tokens = split_list_tokens(raw, hardware=True)
    if not tokens or not catalog:
        return None, None, None, None
    best: tuple[Optional[int], Optional[float], Optional[float]] = (None, None, None)
    best_sim = 0.0
    for token in tokens:
        norm = normalize_name(token)
        if not norm:
            continue
        for hid, hname, compute, power in catalog:
            if not hname:
                continue
            if norm in hname or hname in norm:
                sim = 1.0
            else:
                sim = jaro_winkler_similarity(norm, hname)
            if sim > best_sim:
                best_sim = sim
                best = (hid, compute, power)
    if best[0] is None:
        return None, None, None, None
    return best[0], best[1], best[2], best_sim
