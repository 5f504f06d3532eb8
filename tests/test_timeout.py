"""DOWNLOAD_TIMEOUT semantics (17 reference spiders set the
``download_timeout`` attribute — logerim_com.py:20 = 180,
agenceatauxreduits_fr.py:32 = 120; 2 more the custom_setting —
WagnerHausverwaltung.py:19 = 10, DH_Immobilienservice.py:22 = 25):
the downloader aborts any response slower than the spider's budget.
Scrapy raises TimeoutError — an exception, not a response — so the
request is retried like a retryable status (EXCEPTIONS_TO_RETRY) and,
exhausted, simply dies: no Set-Cookie is learned, nothing is cached,
and handle_httpstatus_list cannot rescue it."""

from collections import Counter

import pytest

from spider_ray.frontier import Crawler
from spider_ray.synth import (
    SLOW_LATENCY_MS,
    TIMEOUT_EXC_STATUS,
    World,
    WorldConfig,
)

from .oracle import OracleCrawler
from .test_dont_filter import _engine_fetch_multisets, _oracle_fetch_multisets
from .test_frontier import CAPTIONS, _cfg, _fetch_sets, _oracle_fetch_sets, _run_engine


def test_host_download_timeout_palette():
    """Pure-function contract: default = the spider-wide budget
    (Scrapy's 180 s); with the knob on, draws come from the
    census-weighted palette and both short entries (10 s / 25 s)
    actually occur."""
    cfg = WorldConfig(num_hosts=64)
    assert cfg.host_download_timeout_ms("h0.test") == 180_000
    short = WorldConfig(num_hosts=64, download_timeout_ms=20_000)
    assert short.host_download_timeout_ms("h0.test") == 20_000
    drawn = WorldConfig(num_hosts=64, timeout_host_pct=100)
    vals = {drawn.host_download_timeout_ms(drawn.host(i)) for i in range(64)}
    assert vals <= {10_000, 25_000, 60_000, 120_000, 180_000, 200_000, 300_000}
    assert vals & {10_000, 25_000}, "no short-timeout host drawn in 64"
    assert 120_000 in vals  # the census-dominant attribute value


def test_slow_latency_only_is_byte_stable(ray_session):
    """slow_pct with every timeout at the 180 s default changes ONLY
    the latency_ms lineage column — fetch sets, items and images are
    byte-identical to the slow_pct=0 world."""
    eng_a, _ = _run_engine(_cfg(slow_pct=60))
    eng_b, _ = _run_engine(_cfg())
    assert _fetch_sets(eng_a) == _fetch_sets(eng_b)
    assert eng_a.items_table().equals(eng_b.items_table())
    assert eng_a.images_table().equals(eng_b.images_table())
    # and the world really does serve slow pages in world A
    cfg = _cfg(slow_pct=60)
    w = World(cfg)
    lats = {w.resolve(f"http://h0.test/prop/{k}").latency_ms for k in range(12)}
    assert SLOW_LATENCY_MS in lats


def test_short_timeout_kills_slow_pages_matches_oracle(ray_session):
    """Spider-wide short budget (the WagnerHausverwaltung shape): every
    slow detail times out on every attempt — fetched exactly
    retry_times+1 times, then dead. Engine = oracle down to per-round
    fetch multisets and the seen set; no slow page ever yields an item
    or image."""
    cfg = _cfg(slow_pct=100, download_timeout_ms=10_000, fail_pct=0,
               notfound_pct=0)
    eng, _ = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _engine_fetch_multisets(eng) == _oracle_fetch_multisets(ora)
    eng_seen = set()
    for snap in eng.dedup.snapshot():
        eng_seen.update(int(x) for x in snap)
    assert eng_seen == ora.seen
    assert eng.items_table().num_rows == 0
    assert eng.images_table().num_rows == 0
    # every detail fingerprint appears exactly retry_times+1 times
    # across the whole crawl (initial attempt + retries to exhaustion)
    total = Counter()
    for c in _engine_fetch_multisets(eng):
        total.update(c)
    detail_counts = [n for n in total.values() if n > 1]
    assert detail_counts and set(detail_counts) == {cfg.retry_times + 1}


@pytest.mark.parametrize("obey", [True, False])
def test_timeout_hosts_match_oracle(ray_session, obey):
    """Per-host palette draws (timeout_host_pct) over a slow world:
    short-budget hosts lose their slow details, long-budget hosts keep
    them — engine = oracle either way."""
    cfg = _cfg(num_hosts=8, slow_pct=50, timeout_host_pct=100)
    eng, _ = _run_engine(cfg, obey=obey)
    ora = OracleCrawler(cfg, CAPTIONS, obey_robots=obey).crawl(cfg.seeds())
    assert _engine_fetch_multisets(eng) == _oracle_fetch_multisets(ora)
    assert _fetch_sets(eng) == _oracle_fetch_sets(ora)


def test_timeout_streaming_equals_driver(ray_session, tmp_path):
    from .test_streaming import _driver_run, _stream_run

    cfg = WorldConfig(num_hosts=4, max_pages_per_host=2, details_per_page=4,
                      fail_pct=10, notfound_pct=5, slow_pct=50,
                      download_timeout_ms=10_000)
    dc, dres, dseen = _driver_run(cfg)
    sc, sres, sseen = _stream_run(cfg, tmp_path)
    assert sseen == dseen
    assert sres["fetched"] == dres["fetched"]
    assert sres["items"] == dres["items"]


def test_timeouts_never_cached(ray_session, tmp_path):
    """HttpCacheMiddleware stores RESPONSES; a timeout has none. A warm
    re-run over the same cache dir serves every completed download from
    the store but must RE-ATTEMPT (and re-time-out) the slow pages —
    the only non-robots downloads left."""
    cfg = _cfg(num_hosts=3, slow_pct=40, download_timeout_ms=10_000,
               fail_pct=0, notfound_pct=0)
    cache_dir = str(tmp_path / "hc")
    cold = Crawler(cfg, CAPTIONS, num_dedup_shards=4, obey_robots=True,
                   round_window_ms=60_000, http_cache_dir=cache_dir)
    cold.crawl(cfg.seeds())
    cold.close()

    ocache: dict = {}
    o1 = OracleCrawler(cfg, CAPTIONS, http_cache=ocache)
    r1 = o1.crawl(cfg.seeds())
    assert _fetch_sets(cold) == _oracle_fetch_sets(r1)
    assert ocache, "oracle cache stayed empty"

    o2 = OracleCrawler(cfg, CAPTIONS, http_cache=ocache)
    timeouts = 0
    orig_resolve = o2.world.resolve

    def counting_resolve(url, *a, **kw):
        nonlocal timeouts
        page = orig_resolve(url, *a, **kw)
        if "/robots.txt" not in url:
            # every remaining download must be one that times out
            assert page.latency_ms > cfg.host_download_timeout_ms(
                url.split("/")[2])
            timeouts += 1
        return page

    o2.world.resolve = counting_resolve
    r2 = o2.crawl(cfg.seeds())
    assert timeouts > 0, "warm run should still re-attempt timeouts"

    warm = Crawler(cfg, CAPTIONS, num_dedup_shards=4, obey_robots=True,
                   round_window_ms=60_000, http_cache_dir=cache_dir)
    warm.crawl(cfg.seeds())
    warm.close()
    assert _fetch_sets(warm) == _oracle_fetch_sets(r2)
    assert warm.images_table().num_rows == cold.images_table().num_rows


def test_timeout_status_never_reaches_parse(ray_session):
    """handle_httpstatus_list can't rescue a timeout (no response
    exists): even a world allowing every world-served error status
    parses nothing from timed-out pages."""
    cfg = _cfg(slow_pct=100, download_timeout_ms=10_000, fail_pct=0,
               notfound_pct=0, handle_httpstatus_list=(401, 403, 404, 503))
    eng, _ = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _engine_fetch_multisets(eng) == _oracle_fetch_multisets(ora)
    assert eng.items_table().num_rows == 0
    assert TIMEOUT_EXC_STATUS not in (401, 403, 404, 503)
