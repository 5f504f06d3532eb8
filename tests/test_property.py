"""Property-based engine-vs-oracle equivalence (SURVEY.md §5): random
small world configurations (seeded by hypothesis) must always produce
identical per-round fetch sets and seen-sets."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spider_ray.frontier import Crawler
from spider_ray.synth import WorldConfig

from .oracle import OracleCrawler

CAPTIONS = ["prop caption one", "prop caption two"]


@st.composite
def world_cfgs(draw):
    return WorldConfig(
        num_hosts=draw(st.integers(1, 4)),
        max_pages_per_host=draw(st.integers(1, 3)),
        details_per_page=draw(st.integers(1, 5)),
        images_per_detail=draw(st.integers(1, 2)),
        fail_pct=draw(st.sampled_from([0, 10, 50])),
        notfound_pct=draw(st.sampled_from([0, 10])),
        private_pct=draw(st.sampled_from([0, 20])),
        api_host_pct=draw(st.sampled_from([0, 50, 100])),
        sitemap_host_pct=draw(st.sampled_from([0, 60])),
        # final-r4 surfaces: cookies, redirects, dont_filter featured
        # strips, per-spider politeness settings, form tokens
        cookie_host_pct=draw(st.sampled_from([0, 60])),
        redirect_pct=draw(st.sampled_from([0, 40])),
        featured_pct=draw(st.sampled_from([0, 60])),
        custom_politeness_pct=draw(st.sampled_from([0, 70])),
        viewstate_pct=draw(st.sampled_from([0, 100])),
        # DUPEFILTER-off hosts + the related-anchor repeats that make
        # them observable, and per-host HTTPERROR_ALLOWED_CODES
        dedup_off_pct=draw(st.sampled_from([0, 50])),
        related_pct=draw(st.sampled_from([0, 70])),
        soft401_pct=draw(st.sampled_from([0, 40])),
        httperror_allowed_pct=draw(st.sampled_from([0, 60])),
        # request-header surfaces: content negotiation, hotlinked
        # images, XHR gates and JSON request bodies
        lang_host_pct=draw(st.sampled_from([0, 60])),
        hotlink_pct=draw(st.sampled_from([0, 60])),
        xhr_api_pct=draw(st.sampled_from([0, 100])),
        json_api_pct=draw(st.sampled_from([0, 100])),
        form_pag_pct=draw(st.sampled_from([0, 60])),
        slow_pct=draw(st.sampled_from([0, 40])),
        download_timeout_ms=draw(st.sampled_from([180_000, 20_000])),
        timeout_host_pct=draw(st.sampled_from([0, 60])),
        # pinned USER_AGENT / UA-strict WAFs + dont_redirect dead
        # listings (flag False = landing page downloaded instead)
        ua_strict_pct=draw(st.sampled_from([0, 60])),
        dead_detail_pct=draw(st.sampled_from([0, 40])),
        dont_redirect_details=draw(st.booleans()),
        seed=draw(st.integers(1, 10_000)),
    )


@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(cfg=world_cfgs(), window=st.sampled_from([3_000, 60_000]))
def test_engine_equals_oracle_on_random_worlds(ray_session, cfg, window):
    eng = Crawler(cfg, CAPTIONS, num_dedup_shards=2, obey_robots=True,
                  round_window_ms=window)
    eng.crawl(cfg.seeds())
    ora = OracleCrawler(cfg, CAPTIONS, round_window_ms=window).crawl(cfg.seeds())

    from .test_frontier import _fetch_sets, _oracle_fetch_sets

    assert _fetch_sets(eng) == _oracle_fetch_sets(ora)
    eng_seen = set()
    for snap in eng.dedup.snapshot():
        eng_seen.update(int(x) for x in snap)
    assert eng_seen == ora.seen


# ---------------------------------------------------------------- kernels
@settings(max_examples=50, deadline=None, derandomize=True)
@given(st.lists(st.integers(0, 2**64 - 1), max_size=400),
       st.lists(st.integers(0, 2**64 - 1), max_size=100))
def test_sorted_set64_equals_python_set(inserts, probes):
    """SortedSet64 must be observationally identical to a Python set
    under arbitrary insert/probe interleavings (incl. the merge
    threshold boundary)."""
    import numpy as np

    from spider_ray.dedup import SortedSet64

    s = SortedSet64()
    s.MERGE_THRESHOLD = 16  # force merges at test scale
    ref: set[int] = set()
    for i in range(0, len(inserts), 7):  # chunked inserts
        chunk = np.array(inserts[i : i + 7], dtype=np.uint64)
        fresh = s.add_many(chunk)
        expect_new = {int(x) for x in chunk} - ref
        assert {int(x) for x in fresh} == expect_new
        ref |= expect_new
    assert len(s) == len(ref)
    if probes:
        got = s.contains_many(np.array(probes, dtype=np.uint64))
        assert got.tolist() == [int(p) in ref for p in probes]
    rt = SortedSet64.from_array(s.to_array())
    assert len(rt) == len(ref)


@settings(max_examples=80, deadline=None, derandomize=True)
@given(st.text(max_size=200))
def test_word_to_num_and_selectors_total(s):
    """Total functions on arbitrary text: word_to_num never raises and
    returns int|None; the HTML parser accepts any input; selectors
    never raise on any tree."""
    from spider_ray.extract import word_to_num
    from spider_ray.htmlsel import parse_html, select

    n = word_to_num(s)
    assert n is None or isinstance(n, int)
    root = parse_html(s)  # arbitrary text as (non-)markup
    assert select(root, "div.x > a[href]::attr(href)") == [] or True
    assert isinstance(select(root, "*::text"), list)


@settings(max_examples=40, deadline=None, derandomize=True)
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1,
                max_size=12))
def test_shingle_jaccard_matches_string_sets(texts):
    """Hashed shingle sets must reproduce string-shingle Jaccard
    exactly (the property the minhash SQL oracle relies on)."""
    from spider_ray.ops.dedup_text import _shingle_hashes, jaccard

    def str_shingles(t, k=3):
        toks = t.split()
        if len(toks) < k:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    for a in texts:
        for b in texts:
            ha, hb = _shingle_hashes(a), _shingle_hashes(b)
            sa, sb = str_shingles(a), str_shingles(b)
            inter = len(sa & sb)
            union = len(sa | sb)
            want = inter / union if union else 1.0
            assert abs(jaccard(ha, hb) - want) < 1e-12
            assert len(ha) == len(sa)
