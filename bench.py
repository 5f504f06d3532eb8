#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default: run the headline crawl pipeline over a synthetic world sized
from $GRAFT_SF_DIR (default /root/testdata/sf0.1) with
ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32) and print ONE JSON line:

  {"metric": "crawl_wall_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "fetched_urls": F, "fetched_urls_per_sec": ...,
   "frontier_rows": R, "frontier_rows_per_sec": ...}

--scaling: run the same crawl twice in FRESH subprocesses at N and 4N
CPUs (4 and 16 — see the comment in run_scaling) on the same input,
print throughput at both plus the scaling efficiency (and a
determinism cross-check of the final seen-set / fetch / sink counts).
Results recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _loadavg() -> list[float]:
    """1/5/15-min load averages, recorded around every measured pass so
    a regression is machine-attributable from the bench artifact itself
    (this shared VM carries external load spikes; VERDICT r3
    What's-wrong #3). Note the averages include THIS process's own
    work — the 5/15-min columns are the ambient-load signal."""
    return [round(x, 2) for x in os.getloadavg()]

# Bench world: two listing levels, wide pages → ~68k fetches dominated
# by the compute-bearing stages (detail parse+normalize, image
# synth/encode/decode/phash) with a pagination round and a retry tail.
BENCH_WORLD = dict(
    num_hosts=int(os.environ.get("GRAFT_BENCH_HOSTS", "256")),
    max_pages_per_host=2,
    details_per_page=int(os.environ.get("GRAFT_BENCH_DETAILS", "64")),
    obey_robots=True,
    round_window_ms=600_000,  # ample budget: politeness on, no deferral tail
    fetch_batch_size=512,
    world_overrides=dict(images_per_detail=3, img_min_side=64, img_max_side=128,
                         api_host_pct=25,  # a quarter of hosts paginate via POST
                         # A/B knob for the progressive-JPEG world share
                         jpeg_prog_pct=int(os.environ.get(
                             "GRAFT_BENCH_JPEG_PROG", "20")),
                         # share of text pages served Content-Encoding
                         # compressed (gzip/deflate wire + transparent
                         # decode in the fetch stage)
                         gzip_pct=int(os.environ.get(
                             "GRAFT_BENCH_GZIP", "60")),
                         # share of detail pages served windows-1252
                         # with a meta charset tag (sniffed client-side)
                         latin1_pct=int(os.environ.get(
                             "GRAFT_BENCH_LATIN1", "30")),
                         # offsite partner links on listing pages
                         # (dropped by the allowed_domains filter) and
                         # session-cookie-gated hosts (CookiesMiddleware
                         # jar) — both leave the fetch/image/item counts
                         # IDENTICAL, so the headline metric stays
                         # comparable across rounds while the middleware
                         # runs on every page. Redirects (which add
                         # fetches) stay opt-in: GRAFT_BENCH_REDIRECT.
                         offsite_pct=int(os.environ.get(
                             "GRAFT_BENCH_OFFSITE", "25")),
                         # A/B knob for the lossless-WebP world share
                         # (share of non-GIF lossless images served as
                         # VP8L — real palette encode+decode per image)
                         webp_pct=int(os.environ.get(
                             "GRAFT_BENCH_WEBP", "20")),
                         cookie_host_pct=int(os.environ.get(
                             "GRAFT_BENCH_COOKIE", "40")),
                         # soft-401 details (handle_httpstatus_list
                         # surface) add 3 retries per hit page, so the
                         # knob stays opt-in like redirects: nonzero pct
                         # changes the headline fetch count
                         soft401_pct=int(os.environ.get(
                             "GRAFT_BENCH_SOFT401", "0")),
                         # the spider-side allowed-status list: parse
                         # 401 bodies whenever the world serves them
                         handle_httpstatus_list=(
                             (401,)
                             if int(os.environ.get("GRAFT_BENCH_SOFT401", "0"))
                             else ()),
                         redirect_pct=int(os.environ.get(
                             "GRAFT_BENCH_REDIRECT", "0")),
                         # DUPEFILTER-off hosts + related-anchor
                         # repeats and per-host HTTPERROR_ALLOWED_CODES
                         # change the fetch count (re-downloads /
                         # failed-vs-parsed soft-401s), so both stay
                         # opt-in like redirects
                         dedup_off_pct=int(os.environ.get(
                             "GRAFT_BENCH_DEDUPOFF", "0")),
                         related_pct=int(os.environ.get(
                             "GRAFT_BENCH_RELATED", "0")),
                         httperror_allowed_pct=int(os.environ.get(
                             "GRAFT_BENCH_HTTPERR", "0")),
                         # form tokens on API pagination (harvest+echo)
                         # leave fetch counts identical → on by default
                         viewstate_pct=int(os.environ.get(
                             "GRAFT_BENCH_VIEWSTATE", "100")),
                         # featured dont_filter strips ADD fetches and
                         # per-spider politeness settings change round
                         # pacing — both opt-in so the headline stays
                         # comparable across rounds
                         featured_pct=int(os.environ.get(
                             "GRAFT_BENCH_FEATURED", "0")),
                         custom_politeness_pct=int(os.environ.get(
                             "GRAFT_BENCH_POLITENESS", "0")),
                         # request-header surfaces: content-negotiated
                         # (Accept-Language) hosts with month-name
                         # dates, hotlink-protected images (Referer),
                         # XHR-gated and JSON-body API endpoints. The
                         # engine always sends the right headers, so
                         # fetch/image/item counts stay IDENTICAL →
                         # on by default like offsite/cookie
                         lang_host_pct=int(os.environ.get(
                             "GRAFT_BENCH_LANG", "40")),
                         hotlink_pct=int(os.environ.get(
                             "GRAFT_BENCH_HOTLINK", "40")),
                         xhr_api_pct=int(os.environ.get(
                             "GRAFT_BENCH_XHR", "50")),
                         json_api_pct=int(os.environ.get(
                             "GRAFT_BENCH_JSONAPI", "50")),
                         # form-postback pagination (from_response):
                         # same listing-page count per host, reached by
                         # harvested POSTs instead of next anchors →
                         # fetch counts identical, on by default
                         form_pag_pct=int(os.environ.get(
                             "GRAFT_BENCH_FORMPAG", "40")),
                         # UA-strict WAF hosts: the engine pins the
                         # required USER_AGENT per spider, so every
                         # gate passes and fetch/item/image counts stay
                         # IDENTICAL → on by default
                         ua_strict_pct=int(os.environ.get(
                             "GRAFT_BENCH_UASTRICT", "40")),
                         # dead-listing 302s + dont_redirect change
                         # item/fetch counts (withdrawn listings emit
                         # nothing) → opt-in like redirects
                         dead_detail_pct=int(os.environ.get(
                             "GRAFT_BENCH_DEADDETAIL", "0")),
                         dont_redirect_details=bool(int(os.environ.get(
                             "GRAFT_BENCH_DEADDETAIL", "0"))),
                         # slow endpoints + short DOWNLOAD_TIMEOUT
                         # budgets change fetch counts (timeouts retry
                         # then die) → both opt-in like redirects
                         slow_pct=int(os.environ.get(
                             "GRAFT_BENCH_SLOW", "0")),
                         timeout_host_pct=int(os.environ.get(
                             "GRAFT_BENCH_TIMEOUTHOST", "0")),
                         download_timeout_ms=int(os.environ.get(
                             "GRAFT_BENCH_TIMEOUT_MS", "180000"))),
)

BENCH_QUERIES = [
    "agg_pricing",
    "dedup_first",
    "events_window",
    "token_count",
    "min_price_dual",
    "ann_topk",
    "exact_dedup_docs",
    # distributed near-dup suite (round 2: fully off-driver shapes)
    "minhash_lsh_dedup",
    "substring_dedup",
    "embedding_dup_pairs",
    "geocode_enrich",
    # late-r4 kernel work: bounded-partition as-of join and the
    # vectorized partition sessionizer
    "asof_join",
    "sessionize",
]


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from spider_ray.pipelines.crawl import run_crawl
    from spider_ray.pipelines.queries import QUERIES

    # warm the page cache / worker pool with one untimed small read
    import ray.data as rd

    rd.read_parquet(f"{SF_DIR}/documents.parquet").count()

    import shutil
    import tempfile

    # one warm-up pass primes Ray's worker pool + per-process session
    # caches (measured pass reflects steady-state throughput, not
    # interpreter spawn)
    warm_dir = tempfile.mkdtemp(prefix="spider_bench_warm_")
    warm_crawler, _ = run_crawl(SF_DIR, images_out_dir=warm_dir, **BENCH_WORLD)
    warm_crawler.close()  # release shard actors between passes — leaked
    # 0-CPU actors are harmless to scheduling but pile up processes
    shutil.rmtree(warm_dir, ignore_errors=True)

    # two measured passes, report the MIN: this shared VM's background
    # noise swings single readings by ±50% (all passes recorded); when
    # the two disagree badly (a load spike hit one of them), a third
    # pass arbitrates
    passes = []
    loads = []
    while len(passes) < 2 or (
        len(passes) == 2 and max(passes) / min(passes) > 1.5
    ):
        images_dir = tempfile.mkdtemp(prefix="spider_bench_images_")
        load_before = _loadavg()
        t0 = time.perf_counter()
        crawler, stats = run_crawl(SF_DIR, images_out_dir=images_dir, **BENCH_WORLD)
        passes.append(time.perf_counter() - t0)
        loads.append({"before": load_before, "after": _loadavg()})
        crawler.close()  # lineage/stats stay readable after close
        shutil.rmtree(images_dir, ignore_errors=True)
    crawl_sec = min(passes)
    frontier_rows = int(sum(r["rows_in"] for r in crawler.lineage))
    result = {
        "metric": "crawl_wall_sec",
        "value": round(crawl_sec, 3),
        "passes_sec": [round(p, 3) for p in passes],
        "loadavg_per_pass": loads,
        "unit": "sec",
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "rounds": stats["rounds"],
        "fetched_urls": stats["fetched"],
        "fetched_urls_per_sec": round(stats["fetched"] / crawl_sec, 1),
        "frontier_rows": frontier_rows,
        "frontier_rows_per_sec": round(frontier_rows / crawl_sec, 1),
        "images_written": stats["images"],
        "items_emitted": stats["items"],
        "seen_urls": stats["seen"],
        # World knobs recorded IN the artifact: the headline wall is only
        # comparable across rounds at equal knob settings (each knob's
        # increment is A/B-measured in BASELINE.md — gzip +0.9 s,
        # GIF +0.75 s, WebP +1.2 s, ... — so a heavier-world wall is
        # numerically attributable without prose).
        "world_knobs": {
            "num_hosts": BENCH_WORLD["num_hosts"],
            "details_per_page": BENCH_WORLD["details_per_page"],
            **BENCH_WORLD["world_overrides"],
        },
        "queries": {},
    }

    if os.environ.get("GRAFT_CRAWL_ONLY") == "1":
        ray.shutdown()
        return result

    for name in BENCH_QUERIES:
        fn, _sql = QUERIES[name]
        tq = time.perf_counter()
        out = fn(SF_DIR)
        # consume lazily-built datasets
        if hasattr(out, "count"):
            out.count()
        result["queries"][name] = round(time.perf_counter() - tq, 3)

    ray.shutdown()
    return result


def run_streaming() -> dict:
    """Driver mode vs StreamingCrawler on the bench world in ONE session
    (same-session A/B is the only noise-robust comparison on this VM).
    Records the streaming mode's fixed-cost premium (round-2 target ≤2×)."""
    import shutil
    import tempfile

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from spider_ray.frontier import Crawler
    from spider_ray.frontier_stream import StreamingCrawler
    from spider_ray.synth import WorldConfig, load_captions_from_documents

    captions = load_captions_from_documents(f"{SF_DIR}/documents.parquet")
    cfg = WorldConfig(
        num_hosts=BENCH_WORLD["num_hosts"],
        max_pages_per_host=BENCH_WORLD["max_pages_per_host"],
        details_per_page=BENCH_WORLD["details_per_page"],
        **BENCH_WORLD["world_overrides"],
    )
    wc = WorldConfig(num_hosts=4, max_pages_per_host=1, details_per_page=3)
    wd = Crawler(wc, captions[:10])  # warm both paths
    wd.crawl(wc.seeds())
    wd.close()
    ws = StreamingCrawler(wc, captions[:10], work_dir=tempfile.mkdtemp())
    ws.crawl(wc.seeds())
    ws.close()

    # interleaved D,S,D,S passes, min per mode: running the modes
    # back-to-back once biased whichever ran second (the box's load —
    # ours and ambient — ramps within the session); min-of-interleaved
    # is the noise-robust ratio
    d_passes, s_passes, loads = [], [], []
    dres = sres = None
    for _ in range(2):
        loads.append(_loadavg())
        t0 = time.perf_counter()
        d = Crawler(cfg, captions,
                    images_out_dir=tempfile.mkdtemp(prefix="bd_"),
                    round_window_ms=BENCH_WORLD["round_window_ms"])
        dres = d.crawl(cfg.seeds())
        d_passes.append(time.perf_counter() - t0)
        d.close()

        work = tempfile.mkdtemp(prefix="bs_")
        loads.append(_loadavg())
        t0 = time.perf_counter()
        s = StreamingCrawler(cfg, captions, work_dir=work,
                             round_window_ms=BENCH_WORLD["round_window_ms"])
        sres = s.crawl(cfg.seeds())
        s_passes.append(time.perf_counter() - t0)
        s.close()
        shutil.rmtree(work, ignore_errors=True)
    d_sec, s_sec = min(d_passes), min(s_passes)
    out = {
        "metric": "streaming_mode_premium",
        "value": round(s_sec / d_sec, 3),
        "unit": "ratio",
        "driver_sec": round(d_sec, 3),
        "streaming_sec": round(s_sec, 3),
        "driver_passes_sec": [round(p, 3) for p in d_passes],
        "streaming_passes_sec": [round(p, 3) for p in s_passes],
        "loadavg_before_each_pass": loads,
        "loadavg_after": _loadavg(),
        "outputs_identical": all(
            dres[k] == sres[k] for k in ("fetched", "seen", "items", "images")
        ),
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        # crawl-only legs: the scaling criterion is the headline crawl's
        # throughput at N vs 4N; running the query suite per leg just
        # stretches the measurement window for the noise to land in.
        # The scaling WORLD is ~3x the headline world (512 hosts x 96
        # details vs 256 x 64; SAME input at both parallelism levels):
        # the criterion simulates N- vs 4N-node clusters on the
        # 10^10-frontier job, and a 66k-URL crawl at 16 CPUs measures
        # per-round launch overhead (~7s fixed against ~180 core-s of
        # compute), not the engine's scaling. ~200k URLs keeps both
        # legs compute-bound; fixed cost measured at <10% of the hi
        # leg. Per-leg wall cap + one retry: this VM occasionally
        # wedges a low-CPU Ray session at the raylet level; a hung leg
        # must not hang the protocol.
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_CRAWL_ONLY="1",
                   GRAFT_BENCH_HOSTS="512", GRAFT_BENCH_DETAILS="96")
        last_err = None
        for _attempt in range(2):
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env, capture_output=True, text=True, check=True,
                    # the 2-CPU leg is warmup + 2 measured crawls at
                    # ~300 s each plus session overhead — ~1000 s when
                    # healthy, so the old 1200 s cap had almost no
                    # ambient-noise margin and tripped on a ~10% slow
                    # pass (r5). 2400 s still catches a true wedge
                    # (the r5 public-from_refs trial idled at load
                    # 0.04) without killing healthy legs.
                    timeout=2400,
                ).stdout
                return json.loads(out.strip().splitlines()[-1])
            except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
                last_err = e
        raise last_err

    # N vs 4N parallelism levels. 2/8 (round 3; rounds 1-2 used 4/16):
    # at 32-way this single VM saturates, and even the 16-CPU leg
    # turned out to be the noise-dominated one — this shared box
    # carries external load spikes (observed 5-min load averages of
    # 10-24 from outside this process) that steal proportionally more
    # from the wider leg and poison the ratio. 2→8 keeps the 4x level
    # ratio of the criterion, leaves 24+ cores of headroom for the
    # host noise, and amortizes the per-round driver fixed cost over
    # more work per CPU at both levels — measuring the engine's
    # scaling rather than the box's weather. Overridable for quiet
    # boxes via GRAFT_SCALE_LO/HI.
    lo = int(os.environ.get("GRAFT_SCALE_LO", "2"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "8"))
    r_lo = one(lo)
    r_hi = one(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    deterministic = (
        r_lo["seen_urls"] == r_hi["seen_urls"]
        and r_lo["images_written"] == r_hi["images_written"]
        and r_lo["fetched_urls"] == r_hi["fetched_urls"]
        and r_lo["items_emitted"] == r_hi["items_emitted"]
    )
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "fetched_per_sec_lo": r_lo["fetched_urls_per_sec"],
        "fetched_per_sec_hi": r_hi["fetched_urls_per_sec"],
        "frontier_rows_per_sec_lo": r_lo["frontier_rows_per_sec"],
        "frontier_rows_per_sec_hi": r_hi["frontier_rows_per_sec"],
        "loadavg_lo": r_lo.get("loadavg_per_pass"),
        "loadavg_hi": r_hi.get("loadavg_per_pass"),
        "deterministic_across_parallelism": deterministic,
        "sf": SF_DIR,
    }


def run_httpcache() -> dict:
    """HTTPCACHE_ENABLED A/B in one session: uncached crawl → cold
    cached crawl (pays the response-store writes) → two warm recrawls
    (zero downloads, politeness bypassed) → a MUTATED-WORLD warm pass
    (r5, VERDICT r4 #7): the world grows 256 → 384 hosts (+50% new
    URL fingerprints) and recrawls over the same cache while the
    per-round compactions churn its now multi-epoch buckets. Cold
    output differs from uncached EXACTLY per DummyPolicy
    (first-attempt 503s are cached, their retries re-see the stored
    failure); warm output must equal cold output bit-for-bit; the
    mutated pass must download ONLY the new hosts' fingerprints
    (asserted by compaction-proof HttpCache.fingerprints snapshots
    against a cold crawl of the grown world in a fresh cache) and
    reproduce that cold grown crawl's items/images."""
    import shutil
    import tempfile

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from spider_ray.pipelines.crawl import run_crawl

    cache_dir = tempfile.mkdtemp(prefix="spider_bench_httpcache_")
    warm_dir = tempfile.mkdtemp()
    wc, _ = run_crawl(SF_DIR, images_out_dir=warm_dir, **BENCH_WORLD)
    wc.close()
    shutil.rmtree(warm_dir, ignore_errors=True)

    def one(tag, world=None, **kw):
        d = tempfile.mkdtemp()
        load = _loadavg()
        t0 = time.perf_counter()
        c, stats = run_crawl(SF_DIR, images_out_dir=d,
                             **(world or BENCH_WORLD), **kw)
        dt = time.perf_counter() - t0
        c.close()
        shutil.rmtree(d, ignore_errors=True)
        return {"sec": round(dt, 2), "loadavg_before": load,
                "fetched": stats["fetched"], "images": stats["images"],
                "items": stats["items"]}

    res = {
        "metric": "httpcache_recrawl",
        "uncached": one("uncached"),
        "cold": one("cold", http_cache_dir=cache_dir),
        "warm": [one("warm", http_cache_dir=cache_dir) for _ in range(2)],
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }
    for w in res["warm"]:  # warm must reproduce cold exactly
        assert (w["fetched"], w["images"], w["items"]) == (
            res["cold"]["fetched"], res["cold"]["images"],
            res["cold"]["items"],
        )
    res["warm_speedup_vs_cold"] = round(
        res["cold"]["sec"] / min(w["sec"] for w in res["warm"]), 2
    )

    # --- mutated-world warm pass: +50% hosts over the SAME cache.
    # Host trees are independent, so a cold crawl of the grown world in
    # a FRESH cache gives the exact expected download set; the mutated
    # pass over the old cache must add exactly (grown − old) and keep
    # every old entry (compaction restamps epochs, so accounting is by
    # fingerprint-set snapshots, not file names).
    from spider_ray.httpcache import HttpCache

    grown = dict(BENCH_WORLD, num_hosts=BENCH_WORLD["num_hosts"] * 3 // 2)
    s_old = HttpCache.fingerprints(cache_dir)
    grown_cache = tempfile.mkdtemp(prefix="spider_bench_httpcache_grown_")
    res["cold_grown"] = one("cold_grown", world=grown,
                            http_cache_dir=grown_cache)
    s_grown = HttpCache.fingerprints(grown_cache)
    shutil.rmtree(grown_cache, ignore_errors=True)
    res["mutated_warm"] = one("mutated_warm", world=grown,
                              http_cache_dir=cache_dir)
    s_mut = HttpCache.fingerprints(cache_dir)
    assert s_old < s_grown
    assert s_mut - s_old == s_grown - s_old, "non-mutated fp downloaded"
    assert s_old <= s_mut, "old cache entries lost"
    assert (res["mutated_warm"]["fetched"], res["mutated_warm"]["images"],
            res["mutated_warm"]["items"]) == (
        res["cold_grown"]["fetched"], res["cold_grown"]["images"],
        res["cold_grown"]["items"])
    res["mutation"] = {
        "hosts_old": BENCH_WORLD["num_hosts"],
        "hosts_grown": grown["num_hosts"],
        "fp_old": len(s_old),
        "fp_new_downloaded": len(s_mut - s_old),
        "only_mutated_fps_downloaded": True,
    }
    shutil.rmtree(cache_dir, ignore_errors=True)
    ray.shutdown()
    return res


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--streaming" in sys.argv:
        print(json.dumps(run_streaming()))
    elif "--httpcache" in sys.argv:
        print(json.dumps(run_httpcache()))
    else:
        print(json.dumps(run_bench()))
