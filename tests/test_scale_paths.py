"""Exercise the at-scale code paths that the default test configs skip:
the groupby(host_hash) politeness shuffle + skew prefilter (used when a
round's frontier exceeds prefilter_threshold) must produce results
identical to the shuffle-free host-aligned path and to the oracle."""

import numpy as np

from spider_ray.frontier import Crawler
from spider_ray.synth import WorldConfig

from .oracle import OracleCrawler

CAPTIONS = [f"caption {i}" for i in range(5)]


def _fetch_sets(crawler):
    return [frozenset(int(h) for h in arr) for arr in crawler.fetched_hashes]


def _run(cfg, **kw):
    defaults = dict(num_dedup_shards=4, obey_robots=True, round_window_ms=4_000)
    defaults.update(kw)
    c = Crawler(cfg, CAPTIONS, **defaults)
    res = c.crawl(cfg.seeds())
    return c, res


def test_groupby_shuffle_path_matches_local_path(ray_session):
    cfg = WorldConfig(num_hosts=3, max_pages_per_host=2, details_per_page=5)
    # force the at-scale path: every round takes the prefilter + groupby
    # shuffle route (prefilter_threshold=0) and no inline fast path
    shuffle_c, shuffle_res = _run(cfg, prefilter_threshold=0, inline_threshold=0)
    local_c, local_res = _run(cfg)
    assert shuffle_res == local_res
    assert _fetch_sets(shuffle_c) == _fetch_sets(local_c)
    img_a = shuffle_c.images_table()
    img_b = local_c.images_table()
    assert sorted(img_a.column("image_id").to_pylist()) == sorted(
        img_b.column("image_id").to_pylist()
    )


def test_groupby_shuffle_path_matches_oracle_with_deferral(ray_session):
    # tight window → real deferrals flowing through the prefilter path
    cfg = WorldConfig(num_hosts=2, max_pages_per_host=2, details_per_page=6)
    eng, _ = _run(cfg, prefilter_threshold=0, inline_threshold=0,
                  round_window_ms=3_000)
    ora = OracleCrawler(cfg, CAPTIONS, round_window_ms=3_000).crawl(cfg.seeds())
    rounds = {}
    for r, _url, fp in ora.fetch_log:
        rounds.setdefault(r, set()).add(fp)
    ora_sets = [frozenset(rounds.get(i, set())) for i in range(max(rounds) + 1)]
    assert _fetch_sets(eng) == ora_sets
    assert sum(row["rows_deferred"] for row in eng.lineage) > 0


def test_hot_host_skew_deferral(ray_session):
    """One host dominating the frontier: budget-first-k admission must
    drain it over multiple rounds in strict seq order (the skew story:
    only the admissible head of the hot queue competes each round)."""
    cfg = WorldConfig(num_hosts=1, max_pages_per_host=1, details_per_page=40,
                      fail_pct=0, notfound_pct=0, private_pct=0)
    eng, res = _run(cfg, round_window_ms=2_000)
    ora = OracleCrawler(cfg, CAPTIONS, round_window_ms=2_000).crawl(cfg.seeds())
    assert res["seen"] == len(ora.seen)
    assert sum(r["rows_deferred"] for r in eng.lineage) > 0
    # per-round fetch sets match the oracle exactly despite deferral
    rounds = {}
    for r, _url, fp in ora.fetch_log:
        rounds.setdefault(r, set()).add(fp)
    ora_sets = [frozenset(rounds.get(i, set())) for i in range(max(rounds) + 1)]
    assert _fetch_sets(eng) == ora_sets
