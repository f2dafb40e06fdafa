"""Unit goldens for the scalar function library (SURVEY §2h, §2b)."""

from __future__ import annotations

import math
from datetime import date

import numpy as np
import pytest

from article_extraction_ray.functions.matching import (
    HARDWARE_MATCH_THRESHOLD,
    build_country_index,
    build_hardware_catalog,
    select_country_id,
    select_hardware_info,
)
from article_extraction_ray.functions.numeric import (
    clean_value,
    coerce_value,
    parse_numeric,
    to_boolean,
    to_date,
    to_float,
    to_int,
    to_year,
)
from article_extraction_ray.functions.physics import DEFAULT_MFU, DEFAULT_PUE, derive_physics_arrays
from article_extraction_ray.functions.strings import (
    jaro_similarity,
    jaro_winkler_similarity,
    levenshtein_distance,
    normalise_cell,
    normalize_name,
    normalized_levenshtein_distance,
    split_list_tokens,
)
from article_extraction_ray.functions.urls import find_urls, resolve_url


class TestJaroWinkler:
    def test_classic_goldens(self):
        assert jaro_similarity("MARTHA", "MARHTA") == pytest.approx(17 / 18)
        assert jaro_winkler_similarity("MARTHA", "MARHTA") == pytest.approx(0.9611111111)
        assert jaro_similarity("DIXON", "DICKSONX") == pytest.approx(0.7666666667)
        assert jaro_winkler_similarity("DIXON", "DICKSONX") == pytest.approx(0.8133333333)
        assert jaro_similarity("CRATE", "TRACE") == pytest.approx(0.7333333333)

    def test_identity_and_empty(self):
        assert jaro_winkler_similarity("abc", "abc") == 1.0
        assert jaro_similarity("", "abc") == 0.0
        assert jaro_similarity("a", "b") == 0.0

    def test_prefix_capped_at_4(self):
        # shared prefix of 5 counts as 4
        s = jaro_similarity("abcdeX", "abcdeY")
        assert jaro_winkler_similarity("abcdeX", "abcdeY") == pytest.approx(s + 4 * 0.1 * (1 - s))


class TestLevenshtein:
    def test_goldens(self):
        assert levenshtein_distance("kitten", "sitting") == 3
        assert levenshtein_distance("", "abc") == 3
        assert levenshtein_distance("abc", "abc") == 0
        assert normalized_levenshtein_distance("", "") == 0.0
        assert normalized_levenshtein_distance("ab", "abcd") == 0.5


class TestNormalizers:
    def test_normalize_name(self):
        assert normalize_name("  NVIDIA-A100 (80GB)! ") == "nvidia a100 80gb"
        assert normalize_name("***") == ""

    def test_split_tokens_country(self):
        assert split_list_tokens("USA / China; Korea, usa") == ["USA", "China", "Korea"]

    def test_split_tokens_hardware(self):
        assert split_list_tokens("A100 + H100 & TPU and V100", hardware=True) == [
            "A100",
            "H100",
            "TPU",
            "V100",
        ]

    def test_normalise_cell(self):
        assert normalise_cell(None) == ""
        assert normalise_cell(float("nan")) == ""
        assert normalise_cell(" NaN ") == ""
        assert normalise_cell("  a \n b ") == "a b"
        assert normalise_cell(3) == "3"


class TestNumeric:
    def test_suffix_parsing(self):
        assert parse_numeric("175B") == 175e9
        assert parse_numeric("1.5m") == 1.5e6
        assert parse_numeric("2 k") == 2000.0
        assert parse_numeric("1,234") == 1234.0
        assert parse_numeric("12t") == 12e12
        # word multipliers are declared but never applied in the reference
        # (paper_information_table.py:682-687) — quirk preserved
        assert parse_numeric("1.5 million") is None
        assert parse_numeric("abc") is None
        assert parse_numeric(None) is None
        assert parse_numeric(7) == 7.0

    def test_clean_value(self):
        assert clean_value("  x ") == "x"
        assert clean_value("   ") is None
        assert clean_value(float("nan")) is None
        assert clean_value(5) == "5"

    def test_to_float_int_year(self):
        assert to_float("1,234.5") == 1234.5
        assert to_float("175B") is None  # no suffixes on this path
        assert to_int("42.9") == 42
        assert to_year("2021-06-03") == 2021
        assert to_year(date(1999, 1, 2)) == 1999
        assert to_year("junk") is None

    def test_to_boolean(self):
        assert to_boolean("Yes") is True
        assert to_boolean("f") is False
        assert to_boolean(1) is True
        assert to_boolean("maybe") is None
        assert to_boolean(float("nan")) is None

    def test_to_date(self):
        assert to_date("2020-05-06") == date(2020, 5, 6)
        assert to_date(None) is None

    def test_coerce(self):
        assert coerce_value("175B", int) == 175_000_000_000
        assert coerce_value(" ", str) is None
        assert coerce_value("3.5k", float) == 3500.0
        assert coerce_value("x", int) is None
        assert coerce_value(12, str) == "12"


class TestUrls:
    def test_arxiv_forms(self):
        for form in ("abs", "pdf", "html"):
            assert (
                resolve_url(f"https://arxiv.org/{form}/2101.12345")
                == "https://arxiv.org/pdf/2101.12345.pdf"
            )

    def test_arxiv_versioned(self):
        assert resolve_url("http://arxiv.org/abs/2101.12345v2") == "https://arxiv.org/pdf/2101.12345v2.pdf"

    def test_wiley_rewrite(self):
        assert (
            resolve_url("https://onlinelibrary.wiley.com/doi/full/10.1/x")
            == "https://onlinelibrary.wiley.com/doi/pdf/10.1/x"
        )

    def test_direct_pdf(self):
        assert resolve_url("https://a.com/p.pdf?x=1") == "https://a.com/p.pdf?x=1"

    def test_trailing_punct(self):
        assert resolve_url("https://a.com/x).") == "https://a.com/x"

    def test_fallback_first_url(self):
        assert resolve_url("see here: https://b.com/y and more") == "https://b.com/y"

    def test_no_url(self):
        assert resolve_url("no links here") is None
        assert resolve_url("") is None

    def test_find_urls_dedup(self):
        assert find_urls("https://a.com https://a.com, https://b.com") == [
            "https://a.com",
            "https://b.com",
        ]


class TestPhysics:
    def test_derive_hours_energy_co2(self):
        # one row: hours derived from compute, energy via h_power, co2 via factor
        out = derive_physics_arrays(
            training_compute=np.array([3.6e21]),
            h_compute=np.array([100.0]),  # TFLOP/s-ish
            h_number=np.array([10.0]),
            training_time_hours=np.array([np.nan]),
            power_draw=np.array([np.nan]),
            h_power=np.array([0.4]),  # kW
            co2eq=np.array([np.nan]),
            gco2_kwh=np.array([500.0]),
        )
        hours = 3.6e21 / (10 * 100.0 * 1e12 * DEFAULT_MFU) / 3600.0
        assert out["training_time_hours"][0] == pytest.approx(hours)
        energy = (0.4 * 10) * hours * DEFAULT_PUE
        assert out["energy_kwh"][0] == pytest.approx(energy)
        assert out["co2eq"][0] == pytest.approx(energy * 0.5)

    def test_power_draw_precedence(self):
        out = derive_physics_arrays(
            training_compute=np.array([np.nan]),
            h_compute=np.array([np.nan]),
            h_number=np.array([4.0]),
            training_time_hours=np.array([10.0]),
            power_draw=np.array([2000.0]),  # W
            h_power=np.array([0.3]),
            co2eq=np.array([np.nan]),
            gco2_kwh=np.array([100.0]),
        )
        assert out["energy_kwh"][0] == pytest.approx((2000.0 / 1000.0) * 10.0 * DEFAULT_PUE)

    def test_existing_values_untouched(self):
        out = derive_physics_arrays(
            training_compute=np.array([1e20]),
            h_compute=np.array([50.0]),
            h_number=np.array([8.0]),
            training_time_hours=np.array([123.0]),  # already present
            power_draw=np.array([np.nan]),
            h_power=np.array([np.nan]),
            co2eq=np.array([7.0]),  # already present
            gco2_kwh=np.array([100.0]),
        )
        assert out["training_time_hours"][0] == 123.0
        assert out["co2eq"][0] == 7.0

    def test_guards_block_derivation(self):
        out = derive_physics_arrays(
            training_compute=np.array([0.0]),  # not > 0
            h_compute=np.array([50.0]),
            h_number=np.array([8.0]),
            training_time_hours=np.array([np.nan]),
            power_draw=np.array([np.nan]),
            h_power=np.array([np.nan]),
            co2eq=np.array([np.nan]),
            gco2_kwh=np.array([100.0]),
        )
        assert math.isnan(out["training_time_hours"][0])
        assert math.isnan(out["co2eq"][0])


COUNTRIES = build_country_index([1, 2, 3], ["United States", "China", "Korea (Republic of)"])
HARDWARE = build_hardware_catalog(
    [1, 2, 3],
    ["NVIDIA A100 80GB", "NVIDIA V100", "Google TPU v4"],
    [312.0, 125.0, 275.0],
    [0.4, 0.3, 0.2],
)


class TestCountryMatch:
    def test_exact_containment(self):
        assert select_country_id("United States", COUNTRIES) == 1

    def test_alias_south_korea(self):
        assert select_country_id("South Korea", COUNTRIES) == 3

    def test_ignore_tokens(self):
        assert select_country_id("Multinational", COUNTRIES) is None

    def test_multi_value_picks_best(self):
        assert select_country_id("Unspecified / China", COUNTRIES) == 2

    def test_empty(self):
        assert select_country_id(None, COUNTRIES) is None
        assert select_country_id("  ", COUNTRIES) is None


class TestHardwareMatch:
    def test_containment_hits(self):
        hid, compute, power, sim = select_hardware_info("A100", HARDWARE)
        assert (hid, compute, power, sim) == (1, 312.0, 0.4, 1.0)

    def test_threshold_reject(self):
        hid, _, _, sim = select_hardware_info("Cerebras WSE-2", HARDWARE)
        assert sim is None or sim < HARDWARE_MATCH_THRESHOLD

    def test_multi_token_and_separator(self):
        hid, *_ = select_hardware_info("2048 chips of TPU v4 and misc", HARDWARE)
        assert hid == 3

    def test_near_miss_jw(self):
        hid, _, _, sim = select_hardware_info("NVIDIA V-100", HARDWARE)
        assert hid == 2
        assert sim >= HARDWARE_MATCH_THRESHOLD

    def test_empty_inputs(self):
        assert select_hardware_info("", HARDWARE) == (None, None, None, None)
        assert select_hardware_info("A100", []) == (None, None, None, None)


class TestCanonicalizeUrl:
    """Crawl-frontier canonicalization rules + idempotence."""

    CASES = [
        ("http://EXAMPLE.COM:80/p?b=2&a=1", "http://example.com/p?a=1&b=2"),
        ("http://example.com/p?a=1#frag", "http://example.com/p?a=1"),
        ("http://example.com/p/?utm_source=x&a=1", "http://example.com/p?a=1"),
        ("https://a.com:443/", "https://a.com/"),
        ("https://a.com:8443/x/", "https://a.com:8443/x"),
        ("http://a.com", "http://a.com/"),
        ("http://a.com/x?fbclid=z&gclid=q&k=v", "http://a.com/x?k=v"),
        ("http://a.com/x?b=&a=", "http://a.com/x?a=&b="),  # blank values kept
    ]

    def test_rules(self):
        from article_extraction_ray.functions.urls import canonicalize_url

        for raw, want in self.CASES:
            assert canonicalize_url(raw) == want, raw

    def test_idempotent(self):
        from article_extraction_ray.functions.urls import canonicalize_url

        for raw, _ in self.CASES:
            once = canonicalize_url(raw)
            assert canonicalize_url(once) == once, raw


class TestCanonicalizeUrlProperties:
    """Hypothesis: canonicalization is total and idempotent on a broad
    class of syntactically plausible URLs."""

    def test_idempotent_and_total(self):
        from hypothesis import given, settings, strategies as st

        from article_extraction_ray.functions.urls import canonicalize_url

        host = st.from_regex(r"[A-Za-z0-9](?:[A-Za-z0-9.-]{0,20}[A-Za-z0-9])?", fullmatch=True)
        path = st.from_regex(r"(?:/[A-Za-z0-9._~%-]{0,8}){0,4}/?", fullmatch=True)
        key = st.from_regex(r"[A-Za-z0-9_]{1,8}", fullmatch=True)
        val = st.from_regex(r"[A-Za-z0-9_]{0,8}", fullmatch=True)
        query = st.lists(st.tuples(key, val), max_size=4).map(
            lambda kvs: "&".join(f"{k}={v}" for k, v in kvs)
        )

        @given(
            scheme=st.sampled_from(["http", "https", "HTTP", "Https"]),
            host=host,
            port=st.sampled_from(["", ":80", ":443", ":8080"]),
            path=path,
            q=query,
            frag=st.sampled_from(["", "#x", "#frag-1"]),
        )
        @settings(max_examples=200, deadline=None)
        def check(scheme, host, port, path, q, frag):
            url = f"{scheme}://{host}{port}{path}"
            if q:
                url += f"?{q}"
            url += frag
            once = canonicalize_url(url)
            assert canonicalize_url(once) == once
            assert once.startswith(("http://", "https://"))
            assert "#" not in once

        check()
