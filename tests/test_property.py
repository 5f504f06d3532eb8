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

    eng_sets = [frozenset(int(h) for h in arr) for arr in eng.fetched_hashes]
    rounds = {}
    for r, _url, fp in ora.fetch_log:
        rounds.setdefault(r, set()).add(fp)
    ora_sets = (
        [frozenset(rounds.get(i, set())) for i in range(max(rounds) + 1)]
        if rounds else []
    )
    assert eng_sets == ora_sets
    eng_seen = set()
    for snap in eng.dedup.snapshot():
        eng_seen.update(int(x) for x in snap)
    assert eng_seen == ora.seen
