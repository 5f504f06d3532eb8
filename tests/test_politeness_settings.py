"""Per-spider politeness custom_settings — DOWNLOAD_DELAY,
AUTOTHROTTLE_ENABLED/START_DELAY/MAX_DELAY, CONCURRENT_REQUESTS — and
the per-spider RETRY_HTTP_CODES list.

Reference surface: python_spiders/spiders/*.py custom_settings — the
2nd–5th most-used keys after HTTPCACHE_ENABLED (DOWNLOAD_DELAY 129
spiders, AUTOTHROTTLE_* ~120, CONCURRENT_REQUESTS 131,
RETRY_HTTP_CODES 20). In the graft one spider ≈ one host, so these
are per-host knobs: ``WorldConfig.host_settings`` (pure function of
seed+host) feeds the politeness delay/budget in the engine's three
admission paths AND the sequential oracle."""

import numpy as np
import pytest

from spider_ray.politeness import (
    AUTOTHROTTLE_MAX_DELAY_MS,
    AUTOTHROTTLE_START_DELAY_MS,
    PER_DOMAIN_CONCURRENCY,
    PolitenessAdmit,
    autothrottle_delay_ms,
    host_budget,
    max_host_budget,
)
from spider_ray.synth import (
    _POLITENESS_PROFILES,
    DEFAULT_HOST_SETTINGS,
    HostSettings,
    WorldConfig,
)

from .oracle import OracleCrawler
from .test_frontier import (
    CAPTIONS,
    _cfg,
    _fetch_sets,
    _oracle_fetch_sets,
    _run_engine,
)


# ------------------------------------------------------------- unit


def test_default_hosts_get_default_settings():
    cfg = WorldConfig(custom_politeness_pct=0)
    for i in range(8):
        assert cfg.host_settings(cfg.host(i)) is DEFAULT_HOST_SETTINGS
    # and the default settings ARE the reference's global settings.py
    assert DEFAULT_HOST_SETTINGS == HostSettings(0, True, 100, 2000, 16)


def test_profile_selection_deterministic_and_mixed():
    cfg = WorldConfig(num_hosts=64, custom_politeness_pct=100)
    got = {cfg.host_settings(cfg.host(i)) for i in range(64)}
    # every palette profile is reachable at pct=100 over 64 hosts
    assert got == {hs for _w, hs in _POLITENESS_PROFILES}
    # repeatable: pure function of (seed, host)
    assert cfg.host_settings("h3.test") == cfg.host_settings("h3.test")
    # pct=50 leaves a mix of default and custom hosts
    half = WorldConfig(num_hosts=64, custom_politeness_pct=50)
    kinds = {half.host_settings(half.host(i)) is DEFAULT_HOST_SETTINGS
             for i in range(64)}
    assert kinds == {True, False}


def test_autothrottle_defaults_unchanged():
    """With no custom settings the adapted delay must equal the
    pre-surface formula bit-for-bit (byte-stable crawl outputs)."""
    cfg = WorldConfig()
    for host in ["h0.test", "h1.test", "h2.test"]:
        lat = cfg.host_latency_ms(host)
        for r in [0, 1, 3, 10, 40]:
            d = float(AUTOTHROTTLE_START_DELAY_MS)
            for _ in range(min(r, 32)):
                d = (d + lat) / 2.0
                d = min(max(d, AUTOTHROTTLE_START_DELAY_MS),
                        AUTOTHROTTLE_MAX_DELAY_MS)
            assert autothrottle_delay_ms(cfg, host, r) == int(d)


def test_autothrottle_custom_semantics():
    cfg = WorldConfig(custom_politeness_pct=100)
    # find hosts drawing each profile kind
    by_profile = {}
    for i in range(256):
        hs = cfg.host_settings(cfg.host(i))
        by_profile.setdefault(hs, cfg.host(i))
    fixed = next(h for hs, h in by_profile.items() if not hs.at_enabled)
    # AUTOTHROTTLE_ENABLED False → fixed DOWNLOAD_DELAY at every round
    hs = cfg.host_settings(fixed)
    for r in [0, 5, 50]:
        assert autothrottle_delay_ms(cfg, fixed, r) == hs.download_delay_ms
    # AT on with DOWNLOAD_DELAY above the start delay: the slot starts
    # at max(dd, start) and never drops below it (Scrapy's mindelay)
    gentle = next(h for hs, h in by_profile.items()
                  if hs.at_enabled and hs.download_delay_ms == 1000)
    ghs = cfg.host_settings(gentle)
    assert autothrottle_delay_ms(cfg, gentle, 0) == 1000
    for r in [1, 4, 32]:
        d = autothrottle_delay_ms(cfg, gentle, r)
        assert ghs.download_delay_ms <= d <= ghs.at_max_ms
    # fast profile: the .3 s ceiling binds even for slow hosts
    fast = next((h for hs, h in by_profile.items() if hs.at_max_ms == 300),
                None)
    if fast is not None:
        for r in [8, 32]:
            assert autothrottle_delay_ms(cfg, fast, r) <= 300


def test_host_budget_concurrency_cap():
    # default: unchanged signature behavior
    assert host_budget(100, 60_000) == min(600, PER_DOMAIN_CONCURRENCY * 60)
    # CONCURRENT_REQUESTS=4 binds when the delay would allow more
    assert host_budget(1, 60_000, concurrency=4) == 240
    # delay binds when it is the tighter constraint
    assert host_budget(1000, 60_000, concurrency=4) == 60
    assert host_budget(3000, 60_000, concurrency=2) == 20


@pytest.mark.parametrize("obey", [True, False])
def test_max_host_budget_contains_every_host(obey):
    cfg = WorldConfig(num_hosts=64, custom_politeness_pct=100)
    window = 60_000
    bound = max_host_budget(cfg, window, obey)
    admit = PolitenessAdmit(cfg, round_window_ms=window, obey_robots=obey)
    for i in range(64):
        assert admit.budget_for(cfg.host(i)) <= bound


# -------------------------------------------- engine = oracle


@pytest.mark.parametrize("obey,pct", [(True, 100), (False, 100), (True, 50)])
def test_engine_matches_oracle_custom_politeness(ray_session, obey, pct):
    cfg = _cfg(custom_politeness_pct=pct)
    eng, _ = _run_engine(cfg, obey=obey, window=3_000)
    ora = OracleCrawler(cfg, CAPTIONS, obey_robots=obey,
                        round_window_ms=3_000).crawl(cfg.seeds())
    assert _fetch_sets(eng) == _oracle_fetch_sets(ora)
    eng_seen = set()
    for snap in eng.dedup.snapshot():
        eng_seen.update(int(x) for x in snap)
    assert eng_seen == ora.seen


def test_custom_politeness_actually_paces(ray_session):
    """The knob must change pacing, not just exist: a 3 s window gives
    default hosts a budget of 30 but a DD=1 s spider only 3 — a
    custom-politeness world needs MORE rounds to drain the same
    frontier (same final fetch set)."""
    base = _cfg(fail_pct=0, notfound_pct=0)
    slow = _cfg(fail_pct=0, notfound_pct=0, custom_politeness_pct=100)
    eng_b, _ = _run_engine(base, obey=False, window=3_000)
    eng_s, _ = _run_engine(slow, obey=False, window=3_000)
    all_b = frozenset().union(*_fetch_sets(eng_b))
    all_s = frozenset().union(*_fetch_sets(eng_s))
    assert all_b == all_s  # same world, same total crawl
    assert len(_fetch_sets(eng_s)) > len(_fetch_sets(eng_b))
    assert sum(r["rows_deferred"] for r in eng_s.lineage) > sum(
        r["rows_deferred"] for r in eng_b.lineage
    )


def test_streaming_custom_politeness_equal_driver(ray_session, tmp_path):
    from .test_streaming import _driver_run, _stream_run

    cfg = WorldConfig(num_hosts=3, max_pages_per_host=2, details_per_page=4,
                      fail_pct=10, notfound_pct=5, private_pct=15,
                      custom_politeness_pct=100)
    dc, dres, dseen = _driver_run(cfg, window=3_000)
    sc, sres, sseen = _stream_run(cfg, tmp_path, window=3_000)
    assert sseen == dseen
    assert sres["fetched"] == dres["fetched"]
    assert [r["rows_admitted"] for r in sc.lineage] == [
        r["rows_admitted"] for r in dc.lineage
    ]


# -------------------------------------------- RETRY_HTTP_CODES


def test_retry_codes_override_matches_oracle(ray_session):
    """An empty RETRY_HTTP_CODES list: flaky 503 pages and 404s die on
    first sight instead of being re-fetched (engine = oracle), and the
    total download count drops by exactly the removed retries."""
    noretry = _cfg(retry_http_codes=())
    eng_n, _ = _run_engine(noretry)
    ora_n = OracleCrawler(noretry, CAPTIONS).crawl(noretry.seeds())
    assert _fetch_sets(eng_n) == _oracle_fetch_sets(ora_n)

    default = _cfg()
    ora_d = OracleCrawler(default, CAPTIONS).crawl(default.seeds())
    # strictly fewer downloads without retries (and fewer distinct URLs
    # too: a 503 detail that retries never recover loses its image
    # children — retrying changes discovery, not just re-fetch counts)
    assert len(ora_n.fetch_log) < len(ora_d.fetch_log)
    from collections import Counter

    counts = Counter(fp for _r, _u, fp in ora_n.fetch_log)
    assert max(counts.values()) == 1  # nothing is ever re-downloaded


def test_retry_codes_drop_404_matches_oracle(ray_session):
    """The reference's custom list (404 removed, 307 added —
    spiders/*.py RETRY_HTTP_CODES): permanent 404s are fetched exactly
    once instead of RETRY_TIMES+1 times."""
    codes = (500, 503, 504, 400, 401, 403, 405, 407, 408, 416, 456, 502,
             429, 307)
    cfg = _cfg(retry_http_codes=codes, notfound_pct=30, fail_pct=0)
    eng, _ = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _fetch_sets(eng) == _oracle_fetch_sets(ora)
    # every fingerprint is downloaded exactly once (no retryable rows)
    from collections import Counter

    counts = Counter(fp for _r, _u, fp in ora.fetch_log)
    assert counts and max(counts.values()) == 1
