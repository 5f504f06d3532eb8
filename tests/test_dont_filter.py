"""dont_filter semantics (the reference's most-used request flag —
810 spiders pass dont_filter=True on requests they know repeat,
spiders/15walmer.py:112): featured-strip links bypass the dupe filter
(fetched even though the normal listing link to the same URL also
fetches) and are never fingerprinted into the seen set."""

from collections import Counter

import pytest

from spider_ray.extract import parse_listing_links
from spider_ray.synth import World, WorldConfig

from .oracle import OracleCrawler
from .test_frontier import (
    CAPTIONS,
    _cfg,
    _fetch_sets,
    _oracle_fetch_sets,
    _run_engine,
)


def _engine_fetch_multisets(eng):
    from .test_frontier import _strip_trailing_empty

    return _strip_trailing_empty(
        [Counter(int(h) for h in arr) for arr in eng.fetched_hashes])


def _oracle_fetch_multisets(ores):
    from .test_frontier import _strip_trailing_empty

    rounds = {}
    for r, _url, fp in ores.fetch_log:
        rounds.setdefault(r, Counter())[fp] += 1
    return _strip_trailing_empty(
        [rounds.get(i, Counter()) for i in range(max(rounds) + 1)]
        if rounds else [])


def test_parse_listing_links_featured():
    cfg = WorldConfig(num_hosts=2, featured_pct=100)
    page = World(cfg).resolve("http://h0.test/list?page=1")
    details, nxt, featured = parse_listing_links(page.body)
    assert len(featured) == 1
    assert featured[0] == details[0]  # the page's own slot-0 detail
    # and with the knob off, no featured strip exists (byte-stable)
    plain = World(WorldConfig(num_hosts=2)).resolve("http://h0.test/list?page=1")
    assert parse_listing_links(plain.body)[2] == []


def test_featured_fetches_twice_matches_oracle(ray_session):
    """The same URL downloads TWICE in one round (normal link + the
    dont_filter featured link) — engine = oracle down to per-round
    fetch multisets, and the seen sets still agree."""
    cfg = _cfg(featured_pct=100, fail_pct=0, notfound_pct=0)
    eng, _ = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    e_ms, o_ms = _engine_fetch_multisets(eng), _oracle_fetch_multisets(ora)
    assert e_ms == o_ms
    # at least one hash genuinely fetched twice within a round
    assert any(max(c.values()) == 2 for c in e_ms if c)
    eng_seen = set()
    for snap in eng.dedup.snapshot():
        eng_seen.update(int(x) for x in snap)
    assert eng_seen == ora.seen


@pytest.mark.parametrize("obey", [True, False])
def test_featured_partial_worlds_match_oracle(ray_session, obey):
    cfg = _cfg(featured_pct=50, private_pct=30)
    eng, _ = _run_engine(cfg, obey=obey, window=3_000)
    ora = OracleCrawler(cfg, CAPTIONS, obey_robots=obey,
                        round_window_ms=3_000).crawl(cfg.seeds())
    assert _engine_fetch_multisets(eng) == _oracle_fetch_multisets(ora)


def test_featured_through_redirects_matches_oracle(ray_session):
    """dont_filter survives a 301 (Scrapy's request.replace copies the
    flag): featured links that are /go/ aliases still double-fetch the
    canonical detail."""
    cfg = _cfg(featured_pct=100, redirect_pct=60, fail_pct=0,
               notfound_pct=0)
    eng, _ = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _engine_fetch_multisets(eng) == _oracle_fetch_multisets(ora)
    e_ms = _engine_fetch_multisets(eng)
    assert any(max(c.values()) == 2 for c in e_ms if c)


def test_featured_streaming_equal_driver(ray_session, tmp_path):
    from .test_streaming import _driver_run, _stream_run

    cfg = WorldConfig(num_hosts=3, max_pages_per_host=2, details_per_page=4,
                      fail_pct=10, notfound_pct=5, private_pct=15,
                      featured_pct=60)
    dc, dres, dseen = _driver_run(cfg)
    sc, sres, sseen = _stream_run(cfg, tmp_path)
    assert sseen == dseen
    assert sres["fetched"] == dres["fetched"]
    assert sres["items"] == dres["items"]
    assert [r["rows_admitted"] for r in sc.lineage] == [
        r["rows_admitted"] for r in dc.lineage
    ]


def test_featured_items_duplicate_positions(ray_session):
    """Scrapy parses the doubled detail twice: two item rows for the
    same external_link with distinct positions (the reference's
    position counter increments per item, not per URL)."""
    cfg = _cfg(featured_pct=100, fail_pct=0, notfound_pct=0)
    eng, _ = _run_engine(cfg)
    items = eng.items_table()
    if items.num_rows == 0:
        pytest.skip("validity filter left no items in this tiny world")
    links = items.column("external_link").to_pylist()
    dup = [u for u, n in Counter(links).items() if n == 2]
    assert dup, "featured details should yield duplicate item rows"
    pos = items.column("position").to_pylist()
    by_link = {}
    for u, p in zip(links, pos):
        by_link.setdefault(u, []).append(p)
    for u in dup:
        assert len(set(by_link[u])) == 2  # distinct positions


def test_featured_survives_resume(ray_session, tmp_path):
    """dont_filter rows live in the checkpointed frontier like any
    other; a resumed crawl reproduces the full run's per-round fetch
    MULTISETS (double-fetches included) exactly."""
    from spider_ray.frontier import Crawler

    cfg = _cfg(featured_pct=100, fail_pct=0, notfound_pct=0)
    full_eng, full_res = _run_engine(cfg)
    ck = str(tmp_path / "ck")
    _run_engine(cfg, checkpoint_dir=ck, max_rounds=2)
    resumed = Crawler(cfg, CAPTIONS, checkpoint_dir=ck, num_dedup_shards=4,
                      obey_robots=True, round_window_ms=60_000)
    assert resumed.resume()
    res = resumed.crawl([])
    assert res["fetched"] == full_res["fetched"]
    assert _engine_fetch_multisets(resumed) == _engine_fetch_multisets(full_eng)
