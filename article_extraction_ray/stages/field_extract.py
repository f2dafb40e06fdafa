"""Pluggable field extraction: the reference's ``extract_fn`` plugin API
re-expressed as an actor-pool stage.

Reference semantics re-derived (not copied):

- **Plugin protocol** (§2j): ``extract_fn(text, field) -> Any`` injected
  into the extraction loop (/root/reference/tables/paper_information_table.py:152,200;
  curried in run.py:16-24).  Here the same callable plugs into
  :class:`FieldExtractionStage`.
- **Prompt templating**: literal ``{article_text}`` substring replacement
  (/root/reference/models/llm.py:102-103); field→template map
  (llm.py:15-21) including the quirk that the ``hardware_text`` template
  is EMPTY — the prompt is the bare article window (documented at
  SURVEY §2h).
- **Token windowing with first-hit early exit** (llm.py:155-185,229-258):
  non-overlapping windows when stride==0; the first window whose
  extraction returns a non-empty string wins.  The sandbox has no HF
  tokenizer, so the tokenizer is pluggable with a whitespace default
  (window = token span joined by single spaces).
- **QA-style windowed extraction** (models/qa_squad.py): char windows
  (window/stride, qa_squad.py:27-37), per-window candidate lists,
  global dedupe-by-answer-keep-best-score (qa_squad.py:155-161, the G3
  aggregate), aggregation mode best/longest/concat (qa_squad.py:40-48),
  and the fallback "first 200 chars" when nothing answered
  (qa_squad.py:224-226).
- **Per-cell store coercion** (paper_information_table.py:221-246):
  numeric targets {parameters, h_number, year} coerce via suffix-aware
  parsing; blank strings → None; non-numeric fields stored as str.
- **Hardware enrichment** (paper_information_table.py:248-267): when the
  ``hardware_text`` field extracts non-empty, fuzzy-match it against the
  broadcast hardware catalog and attach id/compute/power if similarity ≥
  0.90 (config.py:7).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Iterable, Optional

import pyarrow as pa

from ..functions.matching import HARDWARE_MATCH_THRESHOLD, select_hardware_info
from ..functions.numeric import coerce_value
from ..state.broadcast import Broadcast

EXTRACT_FIELDS = ("model", "parameters", "h_number", "year", "hardware_text")
NUMERIC_TARGETS = frozenset({"parameters", "h_number", "year"})

#: field → prompt template; {article_text} is replaced literally.  The
#: hardware_text template is intentionally empty (reference quirk: the
#: mapped file questions/hardware.txt is 0 bytes, llm.py:20).
DEFAULT_TEMPLATES: dict[str, str] = {
    "model": "What is the name of the model described below?\n{article_text}\nAnswer:",
    "parameters": "How many parameters does the model have?\n{article_text}\nAnswer:",
    "h_number": "How many accelerators were used for training?\n{article_text}\nAnswer:",
    "year": "In which year was the work published?\n{article_text}\nAnswer:",
    "hardware_text": "{article_text}",
}


def render_prompt(template: str, article_text: str) -> str:
    """Literal substring replacement — no format() escaping semantics."""
    return template.replace("{article_text}", article_text)


def whitespace_tokenize(text: str) -> list[str]:
    return text.split()


def iter_token_windows(
    text: str,
    window_tokens: int,
    stride_tokens: int,
    tokenize: Callable[[str], list[str]] = whitespace_tokenize,
) -> Iterable[str]:
    """Token windows over the article; stride<=0 ⇒ non-overlapping.

    Mirrors llm.py:155-185: empty/short texts yield one window; windows
    re-materialize to text (whitespace join for the default tokenizer).
    """
    if not text:
        yield ""
        return
    toks = tokenize(text)
    if not toks:
        yield ""
        return
    if window_tokens <= 0 or window_tokens >= len(toks):
        yield " ".join(toks)
        return
    stride = stride_tokens if stride_tokens > 0 else window_tokens
    start, total = 0, len(toks)
    while start < total:
        end = min(start + window_tokens, total)
        yield " ".join(toks[start:end])
        if end >= total:
            break
        start += stride


def windowed_first_hit(
    text: str,
    field: str,
    window_fn: Callable[[str, str], Optional[str]],
    *,
    window_tokens: int = 100_000,
    stride_tokens: int = 0,
) -> Optional[str]:
    """Apply ``window_fn(window_text, field)`` across windows; return the
    first non-empty result (llm.py:257-258), else None."""
    for window in iter_token_windows(text, window_tokens, stride_tokens):
        out = window_fn(window, field)
        if out is not None and str(out).strip():
            return str(out)
    return None


# ---------------------------------------------------------------------------
# QA-style windowed extraction (A3)
# ---------------------------------------------------------------------------


def iter_char_windows(text: str, window: int, stride: int) -> Iterable[str]:
    if window <= 0 or stride <= 0:
        yield text
        return
    n, i = len(text), 0
    while i < n:
        yield text[i : i + window]
        if i + window >= n:
            break
        i += stride


def aggregate_answers(answers: list[tuple[str, float]], mode: str) -> str:
    if not answers:
        return ""
    if mode == "concat":
        return " ".join(a for a, _ in answers if a)
    if mode == "longest":
        return max(answers, key=lambda x: len(x[0]))[0]
    return max(answers, key=lambda x: x[1])[0]  # "best"


def dedupe_keep_best(answers: list[tuple[str, float]]) -> list[tuple[str, float]]:
    """Per answer text keep the max score; rank by score desc (G3)."""
    best: dict[str, float] = {}
    for a, s in answers:
        if a not in best or s > best[a]:
            best[a] = s
    return sorted(best.items(), key=lambda x: x[1], reverse=True)


def qa_extract(
    text: str,
    field: str,
    call_qa: Callable[[str, str], list[tuple[str, float]]],
    *,
    question_map: Optional[dict[str, str]] = None,
    window: int = 500,
    stride: int = 200,
    max_answer_chars: int = 200,
    n_best: int = 3,
    aggregator: str = "best",
) -> Optional[str]:
    """Windowed QA extraction: candidates per window via ``call_qa``,
    trimmed/deduped/aggregated with reference semantics; falls back to
    the first ``max_answer_chars`` of the text when nothing answered."""
    if not text or not field:
        return ""
    qm = question_map or {}
    if field not in qm:
        return None  # unmapped fields → NULL
    question = qm[field]
    answers: list[tuple[str, float]] = []
    for chunk in iter_char_windows(text, window, stride):
        for ans, score in call_qa(question, chunk)[: max(1, n_best)]:
            ans = (ans or "").strip()[:max_answer_chars]
            if ans:
                answers.append((ans, float(score)))
    if not answers:
        return (text or "").strip()[:max_answer_chars]
    return aggregate_answers(answers, aggregator)


# ---------------------------------------------------------------------------
# deterministic rule-based "model" (hermetic stand-in for A2's LLM)
# ---------------------------------------------------------------------------

_RULES: dict[str, re.Pattern] = {
    # capitalized token after the word "model" (prose is lowercase)
    "model": re.compile(r"\bmodel\s+([A-Z][\w.-]*)"),
    "parameters": re.compile(
        r"\b(\d+(?:\.\d+)?)\s*(billion|million|thousand|[bmkt])\s+parameters\b", re.I
    ),
    "h_number": re.compile(
        r"\bon\s+(\d+)\s+(?:[A-Za-z0-9-]+\s+)*?(?i:gpus?|chips?|tpus?|accelerators?)\b"
    ),
    "year": re.compile(r"\b(19|20)\d{2}\b"),
    "hardware_text": re.compile(r"\b\d+\s+((?:[A-Z][A-Za-z0-9-]*\s*)+?)(?i:gpus?|chips?)\b"),
}

_WORD_SUFFIX = {"billion": "b", "million": "m", "thousand": "k"}


def rule_extract_fn(text: str, field: str) -> Optional[str]:
    """Regex-rule extractor implementing the extract_fn protocol —
    deterministic, hermetic, used for tests/bench (the stub extractor
    the reference sketches at create_tables.py:53-58, made real)."""
    pattern = _RULES.get(field)
    if pattern is None or not text:
        return None
    m = pattern.search(text)
    if not m:
        return None
    if field == "parameters":
        unit = m.group(2).lower()
        return m.group(1) + _WORD_SUFFIX.get(unit, unit if len(unit) == 1 else "")
    if field == "year":
        return m.group(0)
    return m.group(1).strip()


# ---------------------------------------------------------------------------
# the Ray stage
# ---------------------------------------------------------------------------


class FieldExtractionStage:
    """Actor-pool batch fn: (id, text) rows → paper-information rows.

    ``extract_fn`` is any plugin following the reference protocol; the
    hardware catalog arrives as a :class:`Broadcast` handle and is
    resolved once per actor.
    """

    def __init__(
        self,
        extract_fn: Callable[[str, str], Any] = rule_extract_fn,
        *,
        fields: tuple[str, ...] = EXTRACT_FIELDS,
        hardware_catalog: Optional[Broadcast] = None,
        id_col: str = "id_paper",
        text_col: str = "text",
        window_tokens: int = 100_000,
        stride_tokens: int = 0,
    ):
        self.extract_fn = extract_fn
        self.fields = fields
        self.catalog = hardware_catalog.get() if hardware_catalog is not None else None
        self.id_col, self.text_col = id_col, text_col
        self.window_tokens, self.stride_tokens = window_tokens, stride_tokens

    def _store_value(self, field: str, raw: Any) -> Any:
        if raw is None:
            return None
        if isinstance(raw, str):
            if raw.strip() == "":
                return None
            if field in NUMERIC_TARGETS:
                return coerce_value(raw, int)
            return raw
        if field in NUMERIC_TARGETS:
            return coerce_value(raw, int)
        return str(raw)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        cols: dict[str, list] = {f: [] for f in self.fields}
        hw_cols: dict[str, list] = {"id_hardware": [], "h_compute": [], "h_power": []}
        for text in texts:
            article = "" if text is None else str(text)
            hw_id = hw_compute = hw_power = None
            for field in self.fields:
                raw = windowed_first_hit(
                    article,
                    field,
                    self.extract_fn,
                    window_tokens=self.window_tokens,
                    stride_tokens=self.stride_tokens,
                )
                value = self._store_value(field, raw)
                cols[field].append(value)
                if field == "hardware_text" and isinstance(raw, str) and raw.strip() and self.catalog:
                    hid, hc, hp, sim = select_hardware_info(raw, self.catalog)
                    if hid is not None and sim is not None and sim >= HARDWARE_MATCH_THRESHOLD:
                        hw_id, hw_compute, hw_power = hid, hc, hp
            hw_cols["id_hardware"].append(hw_id)
            hw_cols["h_compute"].append(hw_compute)
            hw_cols["h_power"].append(hw_power)

        arrays = [pa.array(ids)]
        names = [self.id_col]
        for f in self.fields:
            typ = pa.int64() if f in NUMERIC_TARGETS else pa.string()
            arrays.append(pa.array(cols[f], type=typ))
            names.append(f)
        arrays += [
            pa.array(hw_cols["id_hardware"], type=pa.int64()),
            pa.array(hw_cols["h_compute"], type=pa.float64()),
            pa.array(hw_cols["h_power"], type=pa.float64()),
        ]
        names += ["id_hardware", "h_compute", "h_power"]
        return pa.Table.from_arrays(arrays, names=names)


def extract_information(ds, extract_fn: Callable[[str, str], Any] = rule_extract_fn, *,
                        hardware_catalog=None, concurrency=None, batch_size: int = 128,
                        id_col: str = "id_paper", text_col: str = "text", **kw):
    """E2-equivalent pipeline stage: texts Dataset → information Dataset."""
    handle = Broadcast(hardware_catalog) if hardware_catalog is not None else None
    if concurrency is None:
        from ..pipelines.flagship import _default_pool

        concurrency = _default_pool()
    return ds.map_batches(
        FieldExtractionStage,
        fn_constructor_kwargs=dict(
            extract_fn=extract_fn, hardware_catalog=handle, id_col=id_col, text_col=text_col, **kw
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
