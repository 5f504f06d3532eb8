"""Unit tests for the scalar/batch operator library (SURVEY.md §2.2) —
pinning the reference's helper.py semantics, including its quirks."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spider_ray import canon, extract
from spider_ray.hashing import splitmix64, xxh64, xxh64_many


# ---------------------------------------------------------------- hashing
def test_xxh64_spec_vectors():
    # Published XXH64 test vectors (xxHash spec / library sanity strings)
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    assert xxh64("abc") == xxh64(b"abc")  # str → utf-8
    assert xxh64(b"abc", seed=1) != xxh64(b"abc")
    # >32-byte path (stripe loop + merge)
    assert xxh64(b"x" * 100) == 0x92F0DE5A88A3C094


def test_xxh64_many():
    vals = ["", "a", "abc", "http://h0.test/list?page=1"]
    out = xxh64_many(vals)
    assert out.dtype == np.uint64
    assert [int(x) for x in out] == [xxh64(v) for v in vals]


def test_xxh64_many_bit_identical_exhaustive_lengths():
    """The vectorized batch path (r4) must agree with the scalar spec
    implementation at EVERY length class: empty, tail-bytes-only,
    4-byte chunk, 8-byte chunks, stripes, and every alignment 0..200,
    plus the >16th-longest scalar-outlier escape path."""
    import random

    from spider_ray.hashing import _xxh64_py

    rng = random.Random(13)
    vals = [bytes(rng.randrange(256) for _ in range(L))
            for L in list(range(201)) + [255, 256, 1000, 4096]]
    rng.shuffle(vals)
    for seed in (0, 7, 2**31):
        got = xxh64_many(vals, seed)
        assert [int(x) for x in got] == [_xxh64_py(v, seed) for v in vals]
    # outlier escape: a few huge inputs among many small ones
    vals2 = [b"u" * 40] * 50 + [bytes(rng.randrange(256) for _ in range(200_000))] * 2
    assert [int(x) for x in xxh64_many(vals2)] == [_xxh64_py(v) for v in vals2]


@given(
    st.lists(st.binary(min_size=0, max_size=300), min_size=0, max_size=30),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_xxh64_many_bit_identical_property(vals, seed):
    from spider_ray.hashing import _xxh64_py

    got = xxh64_many(vals, seed)
    assert [int(x) for x in got] == [_xxh64_py(v, seed) for v in vals]


def test_xxh64_u64_many_matches_scalar():
    import struct

    from spider_ray.hashing import xxh64_u64_many

    vals = np.array(
        [0, 1, 2**63, 2**64 - 1, 0xDEADBEEFCAFEBABE, 12345678901234567],
        dtype=np.uint64,
    )
    got = xxh64_u64_many(vals)
    assert got.dtype == np.uint64
    assert [int(x) for x in got] == [
        xxh64(struct.pack("<Q", int(v))) for v in vals
    ]
    # signed view and seed both match the byte-level scalar path
    got_s = xxh64_u64_many(vals.view(np.int64), seed=7)
    assert [int(x) for x in got_s] == [
        xxh64(struct.pack("<Q", int(v)), seed=7) for v in vals
    ]


def test_splitmix64_deterministic():
    assert splitmix64(42) == splitmix64(42)
    arr = splitmix64(np.array([1, 2, 3], dtype=np.uint64))
    assert arr.dtype == np.uint64 and len(set(arr.tolist())) == 3


# ---------------------------------------------------------------- canon (M28)
def test_canonicalize():
    c = canon.canonicalize
    assert c("HTTP://H0.Example.COM:80/a/./b/../c?b=2&a=1#frag") == \
        "http://h0.example.com/a/c?a=1&b=2"
    assert c("https://X.com:443/") == "https://x.com/"
    assert c("http://x.com") == "http://x.com/"
    assert c("/rel/path?z=1", base="http://h.test/dir/page") == \
        "http://h.test/rel/path?z=1"
    assert c("../up", base="http://h.test/a/b/c") == "http://h.test/a/up"


def test_canonicalize_batch_hashes():
    urls = ["http://A.test/x", "http://a.test/x", "http://b.test/y"]
    cu, hosts, uh, hh = canon.canonicalize_batch(urls)
    assert cu[0] == cu[1] and uh[0] == uh[1]
    assert hosts == ["a.test", "a.test", "b.test"]
    assert hh[0] == hh[1] != hh[2]


# ---------------------------------------------------------------- M2-M7
def test_strip_and_whitespace():
    assert extract.strip_tags("<p>hi <b>there</b></p>") == "hi there"
    assert extract.remove_white_spaces("  a \n\t b  ") == "a b"
    # helper.py:85 substitutes ' ' per non-ASCII char and strips
    assert extract.remove_unicode_char("ab€cd") == "ab cd"
    assert extract.remove_unicode_char("naïve") == "na ve"
    assert extract.remove_unicode_char("€abc€") == "abc"


def test_extract_number_only():
    # helper.py:88-103 semantics: strip separators, first number, 0 if none
    assert extract.extract_number_only("€ 1.234,56 pm", ".", ",") == 1234.56
    assert extract.extract_number_only("$1,234.56", ",", ".") == 1234.56
    assert extract.extract_number_only("no digits") == 0.0
    assert extract.extract_last_number_only("3 rooms 120 sqm", ".", ",") == 120.0


def test_get_price_dual_separator():
    # helper.py:47-61: min of both parses, max when min < 10
    assert extract.get_price("1.234") == 1234  # min parse 1.234 < 10 → take max
    assert extract.get_price("1,50") == 150  # min=1.5<10 → max=150
    assert extract.get_price("850") == 850


def test_extract_rent_currency():
    rent, cur = extract.extract_rent_currency("€ 1.250 per month", "h.test", ".", ",")
    assert rent == 1250 and cur == "EUR"
    rent, cur = extract.extract_rent_currency("$ 2,000 pw", "site-australia", ",", ".")
    assert rent == 2000 and cur == "AUD"


# ---------------------------------------------------------------- M8
def test_currency_parser():
    f = extract.currency_parser
    assert f("€1000", "x") == "EUR"
    assert f("£99", "x") == "GBP"
    assert f("₺5", "x") == "TRY"
    assert f("CHF 12", "x") == "CHF"
    # $ → AUD iff source mentions australia (helper.py:140-169)
    assert f("$100", "realestate-australia.com") == "AUD"
    assert f("$100", "example.com") == "USD"
    assert f("plain", "x") is None


# ---------------------------------------------------------------- M10-M14
def test_convert_numeric():
    assert extract.convert_to_numeric("3.0") == 3
    assert isinstance(extract.convert_to_numeric("3.0"), int)
    assert extract.convert_to_numeric("3.5") == 3.5
    assert extract.convert_to_numeric("x") is None
    assert extract.convert_string_to_numeric("ca. 1.250 EUR", ".", ",") == 1250


def test_dates():
    assert extract.format_date("05/03/2026", "%d/%m/%Y") == "2026-03-05"
    assert extract.format_date("garbage") == "garbage"  # pass-through
    assert extract.extract_date("verfügbar ab 3. März 2026") == "2026-03-03"
    assert extract.extract_date("from 12 October 2025") == "2025-10-12"
    # es / tr (reference dateparser languages=[en,es,fr,nl,tr], helper.py:596)
    assert extract.extract_date("disponible 5 enero 2026") == "2026-01-05"
    assert extract.extract_date("1 septiembre 2025") == "2025-09-01"
    assert extract.extract_date("15 Ağustos 2025 tarihinde") == "2025-08-15"
    assert extract.extract_date("2 Şubat 2026") == "2026-02-02"
    assert extract.extract_date("9 eylul 2025") == "2025-09-09"  # ASCII-folded
    assert extract.extract_date("3 Mayıs 2026") == "2026-05-03"
    # year bump (helper.py:593-605): before REF_TODAY ⇒ +1 year
    assert extract.parse_date_with_year_bump("01/06/2025") == "2026-06-01"
    assert extract.parse_date_with_year_bump("01/06/2026") == "2026-06-01"
    assert extract.parse_date_with_year_bump("bad") is None


# ---------------------------------------------------------------- M15-M17
def test_sqft_two_conversions():
    # two DISTINCT roundings preserved on purpose (helper.py:36-44 vs 646-648)
    assert extract.sq_feet_to_meters(1000) == 92      # int(1000/10.764)
    assert extract.sq_feet_to_meters_itemclear(1000) == 92  # int(1000*0.09290304)
    assert extract.sq_feet_to_meters(500) == 46
    assert extract.sq_feet_to_meters_itemclear(500) == 46
    assert extract.per_week_to_month(250) == 1000


def test_energy_label_bins():
    cases = [(95, "A"), (92, "A"), (91, "B"), (81, "B"), (80, "C"), (69, "C"),
             (68, "D"), (55, "D"), (54, "E"), (39, "E"), (38, "F"), (21, "F"),
             (20, "G"), (1, "G"), (0, None)]
    for kwh, lab in cases:
        assert extract.energy_label(kwh) == lab, kwh
    arr = extract.energy_label_batch(np.array([95, 70, 10, 0]))
    assert list(arr) == ["A", "C", "G", None]


# ---------------------------------------------------------------- M18-M19
def test_string_found_and_amenities():
    assert extract.string_found(["balcony"], "Big Balcony!") is True
    assert extract.string_found(["pool"], "poolside") is False  # word boundary
    flags = extract.amenity_flags(pd.Series(["has balcony and lift", "nothing"]))
    assert flags["balcony"].tolist() == [True, None]
    assert flags["elevator"].tolist() == [True, None]
    # True-or-None, never False (helper.py:390-434)
    assert flags["parking"].tolist() == [None, None]
    # default mode is helper.py containment: 'pet' hits 'carpet',
    # 'pool' hits 'poolside'; word mode keeps the stricter boundary
    sub = extract.amenity_flags(pd.Series(["new carpet, poolside view"]))
    assert sub["pets_allowed"].tolist() == [True]
    assert sub["swimming_pool"].tolist() == [True]
    word = extract.amenity_flags(pd.Series(["new carpet, poolside view"]),
                                 mode="word")
    assert word["pets_allowed"].tolist() == [None]
    assert word["swimming_pool"].tolist() == [None]


def test_amenity_table_pins_reference_exactly():
    """helper.py:390-401 `Amenties`, byte-for-byte — incl. the
    'MÖBLIERTES'.lower() entry, the leading-space ' washer' (so
    'dishwasher' text never trips washing_machine) and the inert
    capital-W 'Wasch' (the reference lowercases the text but not the
    keyword, so it can never match)."""
    assert extract.AMENITY_KEYWORDS == {
        "pets_allowed": ["pet", "haustiere"],
        "furnished": ["furnish", "möbliertes"],
        "parking": ["parking", "garage", "parcheggio", "stellplatz"],
        "elevator": ["elevator", "aufzug", "ascenseur", "lift", "aufzüg",
                     "fahrstuhl"],
        "balcony": ["balcon", "balkon"],
        "terrace": ["terrace", "terrazz", "terras", "terrass"],
        "swimming_pool": ["pool", "piscine", "schwimmbad"],
        "washing_machine": [" washer", "laundry", "washing_machine",
                            "waschmaschine", "laveuse", "Wasch"],
        "dishwasher": ["dishwasher", "geschirrspüler", "lave-vaiselle",
                       "lave vaiselle"],
    }
    # scalar get_amenities parity: helper.py:404-424 return order
    got = extract.get_amenities(
        "MÖBLIERTES Apartment mit Fahrstuhl und Terrazza", "piscine privée"
    )
    assert got == (None, True, None, True, None, True, True, None, None)
    # ' washer' needs its leading space: 'dishwasher' must flag only
    # dishwasher; a real ' washer' mention flags washing_machine
    assert extract.get_amenities("has a dishwasher", "")[7:] == (None, True)
    assert extract.get_amenities("has a washer", "")[7:] == (True, None)
    # the inert 'Wasch': capital-W keyword vs lowered text never hits,
    # so 'Waschküche' flags nothing (exactly like the reference)
    assert extract.get_amenities("Waschküche im Keller", "") == (
        None, None, None, None, None, None, None, None, None)


# ---------------------------------------------------------------- M20-M24
def test_description_cleaner():
    s = "<p>Nice flat</p> see https://x.test/a email me@x.test Contact us at +31 20 123 4567"
    out = extract.description_cleaner(s)
    assert "http" not in out and "@" not in out and "Contact" not in out
    assert out.startswith("Nice flat")


def test_property_type_lookup():
    assert extract.property_type_lookup("Mooie wohnung in centrum") == "apartment"
    assert extract.property_type_lookup("maison de ville") == "house"
    assert extract.property_type_lookup("kamer te huur") == "room"
    assert extract.property_type_lookup("studio") == "studio"
    assert extract.property_type_lookup("warehouse2") == "house"  # substring quirk preserved
    assert extract.property_type_lookup("office") is None


def test_word_to_num():
    assert extract.word_to_num("two bedrooms") == 2
    assert extract.word_to_num("twelve") == 12
    assert extract.word_to_num("none here") is None
    # w2n-style compounds (helper.py:567-575 imports word2number)
    assert extract.word_to_num("twenty two") == 22
    assert extract.word_to_num("twenty-two") == 22
    assert extract.word_to_num("one hundred forty five") == 145
    assert extract.word_to_num("two thousand and five") == 2005
    assert extract.word_to_num("hundred") is None  # bare scale, no digit word
    assert extract.word_to_num("nineteen ninety") == 109  # w2n-additive
    assert extract.word_to_num("three million two hundred thousand") == 3_200_000


def test_dedup_list_keep_order():
    assert extract.dedup_list_keep_order(["b", "a", "b", "c", "a"]) == ["b", "a", "c"]
    assert extract.dedup_list_keep_order(None) == []


# ---------------------------------------------------------------- parsers/filters
def test_parse_listing_and_detail():
    body = b'<html><body><a class="listing" href="/prop/1">x</a>\n<a class="next" href="/list?page=2">n</a></body></html>'
    links, nxt, _featured = extract.parse_listing_links(body)
    assert links == ["/prop/1"] and nxt == "/list?page=2"

    from spider_ray.synth import World, WorldConfig

    w = World(WorldConfig(num_hosts=1), ["cap"])
    page = w.resolve("http://h0.test/prop/0", attempt=1)
    raw = extract.parse_detail_page(page.body)
    assert raw["external_id"] == "0"
    assert raw["rent_raw"] and raw["images"]
    assert raw["latitude"] is not None


def test_filter_valid_items():
    df = pd.DataFrame(
        {
            "external_link": ["a", "b", "c", None],
            "address": ["x", "x", "x", "x"],
            "property_type": ["apartment", None, "house", "house"],
            "square_meters": pd.array([50, 60, 70, 80], dtype="Int64"),
            "room_count": pd.array([2, 2, 2, 2], dtype="Int64"),
            "rent": pd.array([900, 900, 50000, 900], dtype="Int64"),
            "currency": ["EUR"] * 4,
        }
    )
    out = extract.filter_valid_items(df)
    # b: missing property_type; c: rent > 40000 (basic.tmpl:44-46); d: no link
    assert out["external_link"].tolist() == ["a"]


def test_extract_utilities():
    """M22 — helper.py:492-497: 6-char window after the LAST currency
    symbol, None when absent."""
    from spider_ray import extract

    d = "Rent € 900 per month, utilities €120,50 extra"
    assert extract.extract_utilities("€", d) == "120,50"
    assert extract.extract_utilities("$", d) is None
    assert extract.extract_utilities("€", "") is None


def test_property_type_full_reference_map():
    """M23 — the complete helper.py:273-304 dictionary, including the
    'attico'(room) vs 'attic'(apartment) ordering trap."""
    from spider_ray import extract

    cases = {
        "Dachgeschosswohnung in Mitte": "apartment",
        "Schöne Etagenwohnung": "apartment",
        "Einfamilienhaus am See": "house",
        "Doppelhaushälfte": "house",
        "Porzione di casa storica": "house",
        "Terratetto ristrutturato": "house",
        "Colonica in campagna": "house",
        "Posto letto in centro": "room",
        "Bel attico con terrazza": "room",
        "Cozy attic conversion": "apartment",
        "Camera singola": "room",
        "Loft moderno": "apartment",
    }
    for raw, want in cases.items():
        assert extract.property_type_lookup(raw) == want, raw


def test_batch_kernels_match_scalar_forms():
    """The vectorized normalize kernels (r4) must agree element-for-
    element with their scalar reference forms on nulls, empties,
    separators, currencies, dates and mixed junk."""
    import numpy as np
    import pandas as pd

    from spider_ray.extract import (
        _area_to_sqm,
        _area_to_sqm_batch,
        currency_parser,
        currency_parser_batch,
        extract_number_only,
        extract_number_only_batch,
        extract_rent_currency,
        extract_rent_currency_batch,
        get_price,
        get_price_batch,
        parse_date_with_year_bump,
        parse_date_with_year_bump_batch,
        property_type_lookup,
        property_type_lookup_batch,
    )

    vals = [None, "", "1.234,56 EUR", "950", "  12/05/2020 ", "no digits",
            "2.500", "1,5 rooms", "$ 800 pw", "£1,200", "450 sq. ft",
            "85 m²", "0", "9", "10", "Apartment in city", "student room",
            "villa with pool", "TL 3.000", "chf 12", "29/02/2020"]
    s = pd.Series(vals, dtype=object)
    hosts = pd.Series((["rent.australia.example", "x.example"] * 11)[: len(vals)])

    got = extract_number_only_batch(s, ".", ",")
    exp = [extract_number_only(v or "", ".", ",") for v in vals]
    np.testing.assert_allclose(got, exp)

    np.testing.assert_array_equal(
        get_price_batch(s), [get_price(v) if v else 0 for v in vals]
    )

    assert list(currency_parser_batch(s, hosts)) == [
        currency_parser(v or "", h) if v else None
        for v, h in zip(vals, hosts)
    ]

    assert list(property_type_lookup_batch(s)) == [
        property_type_lookup(v or "") for v in vals
    ]

    dates = pd.Series([None, "", "12/05/2020", "01/01/2030", "31/12/2019",
                       "junk", " 05/03/2020 ", "15/08/2026"])
    got_d = list(parse_date_with_year_bump_batch(dates))
    exp_d = [parse_date_with_year_bump(v) if v else None for v in dates]
    assert got_d == exp_d

    areas = pd.Series([None, "", "450 sq. ft", "85 m²", "0 m²", "1.200,5"])
    got_a = list(_area_to_sqm_batch(areas))
    exp_a = [_area_to_sqm(v) for v in areas]
    assert [None if pd.isna(x) else int(x) for x in got_a] == exp_a

    ts = pd.Series(["."] * 3 + [","] * 3)
    ss = pd.Series([","] * 3 + ["."] * 3)
    rents = pd.Series(["1.234,56", None, "$900", "2,500.75", "", "eur 12"])
    rh = pd.Series(["a.example"] * 6)
    gr, gc = extract_rent_currency_batch(rents, rh, ts, ss)
    exp_rc = [
        extract_rent_currency(r, h, t, c)
        for r, h, t, c in zip(rents, rh, ts, ss)
    ]
    assert [None if pd.isna(x) else int(x) for x in gr] == [e[0] for e in exp_rc]
    assert list(gc) == [e[1] for e in exp_rc]
