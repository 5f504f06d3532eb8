"""Fetch stage — actor pool holding per-actor fetch state.

Reference: the Scrapy/Twisted downloader with 320 global / 16
per-domain concurrency, UA-rotation and retry middlewares
(python_spiders/settings.py:24,31,54-58,98-99; middlewares.py:13-17;
user_agents.py:73-75). Re-expressed as a callable CLASS passed to
``Dataset.map_batches(Fetcher, concurrency=N, batch_size=B)``:

  * ``__init__`` runs once per actor — builds the synthetic-world
    resolver (or, behind an import-try, a real ``requests.Session``)
    and ``ray.get``\\ s the broadcast caption corpus once. Nothing
    heavy ever happens per batch.
  * ``__call__`` takes an Arrow batch of frontier rows and returns the
    batch + response columns (status, kind, body, fmt, latency_ms).

UA rotation is deterministic: ``user_agents[url_hash % len]`` — the
reference picks randomly from its 73-entry list (user_agents.py); the
graft pins it by hash so reruns are byte-identical.

Retry semantics (ST4): a response whose status is in
``RETRY_HTTP_CODES`` and whose ``retry_count`` < ``max_retries``
is NOT an item — the frontier loop re-enqueues it with
``retry_count + 1``; the synthetic world deterministically succeeds
on the retry for transient codes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .proxy import ProxyConfig, select_proxy
from .synth import (
    RETRY_HTTP_CODES,
    TIMEOUT_EXC_STATUS,
    Page,
    World,
    WorldConfig,
)

# module-level default (immutable); a deployment overrides via
# spider_ray.proxy.ProxyConfig in its own fetch wrapper
_PROXY_CFG = ProxyConfig()

# a compact stand-in for the reference's 73-entry UA list
# (python_spiders/user_agents.py) — rotation mechanics are identical
USER_AGENTS = [f"spider-ray/0.1 (variant {i})" for i in range(73)]

MAX_RETRIES = 3  # settings.py:98 RETRY_TIMES

# Per-worker-process session cache for the stateless-task fetch path:
# a Ray worker process reuses this across every task it runs, so
# session construction (HTTP pools in a real deployment, the World
# resolver + caption corpus here) is amortized exactly like actor
# state — without paying an actor-pool spin-up on every Dataset
# execution of the round loop. The actor-pool form (``Fetcher``) is
# the right shape for once-per-crawl executions; the task form wins
# when the loop launches many short executions.
_SESSION_CACHE: dict = {}


def decode_http_body(body: bytes, encoding: str) -> bytes:
    """Transparent HTTP content-coding decode — the Scrapy
    HttpCompressionMiddleware analog (RFC 9110 §8.4.1 semantics).
    gzip/x-gzip and deflate are supported; deflate falls back to a
    raw (headerless) inflate because some servers send RFC 1951
    streams under the "deflate" token, the same tolerance the real
    middleware ships."""
    if not encoding:
        return body
    if encoding in ("gzip", "x-gzip"):
        import gzip

        return gzip.decompress(body)
    if encoding == "deflate":
        import zlib

        try:
            return zlib.decompress(body)
        except zlib.error:
            return zlib.decompress(body, -15)
    raise ValueError(f"unsupported Content-Encoding: {encoding!r}")


def get_world(cfg: WorldConfig, captions_ref=None) -> World:
    key = (cfg, captions_ref.hex() if captions_ref is not None else None)
    w = _SESSION_CACHE.get(key)
    if w is None:
        import ray

        captions = ray.get(captions_ref) if captions_ref is not None else None
        w = World(cfg, captions)
        _SESSION_CACHE[key] = w
    return w


class Fetcher:
    """Actor-pool fetch stage over the deterministic synthetic world.

    Parameters are plain values (picklable) so Ray can construct one
    instance per actor; ``captions_ref`` is an ``ObjectRef`` from
    ``ray.put`` — resolved ONCE here, not per batch.
    """

    def __init__(self, cfg: WorldConfig, captions_ref=None, simulate_latency: bool = False,
                 cookies: dict | None = None):
        import ray

        captions = ray.get(captions_ref) if captions_ref is not None else None
        self.world = World(cfg, captions)
        self.simulate_latency = simulate_latency
        self.cookies = cookies

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _fetch_table(self.world, batch, self.simulate_latency,
                            self.cookies)


def fetch_batch(batch: pa.Table, *, cfg: WorldConfig, captions_ref=None,
                simulate_latency: bool = False,
                cookies: dict | None = None,
                cache=None, round_no: int = 0,
                served: dict | None = None) -> pa.Table:
    """Stateless-task fetch body (session held in the per-process cache).

    ``cookies`` is the round's cookie jar snapshot {host: cookie} —
    the CookiesMiddleware analog. The jar is tiny per-host metadata
    (one short string per session-gated host), re-broadcast by the
    round loop each round; cookies discovered DURING a round apply
    from the next round (deterministic at any parallelism — a
    wall-clock-ordered jar would make output depend on task timing).

    ``cache`` (spider_ray.httpcache.HttpCache) enables the Scrapy
    HttpCacheMiddleware analog: cached fingerprints are served the
    stored response without resolving against the world (no download,
    no latency), and every world-resolved response is stored for
    rounds > ``round_no``. ``served`` short-circuits the lookup with a
    caller-provided fingerprint→response dict (the fused block kernel
    looks up ONCE per block instead of once per fetch slice)."""
    return _fetch_table(get_world(cfg, captions_ref), batch, simulate_latency,
                        cookies, cache=cache, round_no=round_no,
                        served=served)


def _fetch_table(world: World, batch: pa.Table, simulate_latency: bool,
                 cookies: dict | None = None,
                 cache=None, round_no: int = 0,
                 served: dict | None = None) -> pa.Table:
    urls = batch["canonical_url"].to_pylist()
    retries = (
        batch["retry_count"].to_pylist()
        if "retry_count" in batch.column_names
        else [0] * len(urls)
    )
    bodies_in = (
        batch["form_body"].to_pylist()
        if "form_body" in batch.column_names
        else [None] * len(urls)
    )
    hosts_in = (
        batch["host"].to_pylist()
        if "host" in batch.column_names
        else [None] * len(urls)
    )
    cfg = world.cfg
    # RefererMiddleware analog (on by default, like Scrapy's): every
    # request discovered from a response carries Referer = that
    # response's URL — which is exactly the parent_url column the
    # frontier already tracks. Seeds have no parent → no Referer.
    referers = (
        batch["parent_url"].to_pylist()
        if cfg.referer_enabled and "parent_url" in batch.column_names
        else [None] * len(urls)
    )
    # per-spider headers= dict (Accept-Language / X-Requested-With):
    # pure function of host, computed once per distinct host per batch
    hdr_by_host: dict = {}
    if cfg.send_spider_headers:
        for ho in set(hosts_in):
            if ho is not None:
                hdr_by_host[ho] = cfg.spider_headers(ho) or None
    fps = batch["url_hash"].to_numpy(zero_copy_only=False)
    # User-Agent per request: the deterministic rotation (ST5) unless
    # the spider pins one for this host (USER_AGENT custom_setting —
    # delattreimmobilier_com.py:34; strict hosts 403 everything else).
    # Computed once per distinct host, then per row — the same column
    # the fetch table has always emitted, now also sent to the server.
    ua_by_host: dict = {}
    if cfg.ua_strict_pct:
        for ho in set(hosts_in):
            if ho is not None:
                ua_by_host[ho] = cfg.spider_user_agent(ho)
    uas = [
        ua_by_host.get(ho) or USER_AGENTS[int(h) % len(USER_AGENTS)]
        for ho, h in zip(hosts_in, fps)
    ]
    if served is None:
        served = {}
        if cache is not None:
            served = cache.lookup(
                fps, batch["host_hash"].to_numpy(zero_copy_only=False),
                round_no,
            )
    statuses = np.empty(len(urls), dtype=np.int32)
    kinds: list[str] = []
    bodies: list[bytes] = []
    fmts: list[str] = []
    encodings: list[str] = []
    set_cookies: list[str] = []
    latencies = np.empty(len(urls), dtype=np.int32)
    miss_idx: list[int] = []
    total_sleep = 0.0
    for j, (u, rc, fb, ho) in enumerate(zip(urls, retries, bodies_in, hosts_in)):
        hit = served.get(int(fps[j])) if served else None
        if hit is not None:
            # HttpCacheMiddleware serve: stored response, no download,
            # no latency. Bodies were stored post-decode (identity).
            st, kd, bd, fm, sc = hit
            statuses[j] = st
            kinds.append(kd)
            bodies.append(bd)
            fmts.append(fm)
            encodings.append("")
            set_cookies.append(sc)
            latencies[j] = 0
            continue
        page = world.resolve(
            u, attempt=rc or 0, form_body=fb,
            cookie=cookies.get(ho) if cookies and ho else None,
            referer=referers[j],
            headers=hdr_by_host.get(ho),
            ua=uas[j],
        )
        # DOWNLOAD_TIMEOUT gate (client-side, like Scrapy's downloader):
        # a response slower than the spider's budget never arrives —
        # no status, no Set-Cookie, no body; the attempt is recorded as
        # the exception sentinel and is NOT cached (HttpCacheMiddleware
        # stores responses, and a timeout has none).
        to_ms = (cfg.host_download_timeout_ms(ho) if ho is not None
                 else cfg.download_timeout_ms)
        if page.latency_ms > to_ms:
            page = Page(u, TIMEOUT_EXC_STATUS, "timeout", latency_ms=to_ms)
        statuses[j] = page.status
        kinds.append(page.kind)
        # downloader-middleware decode: parse stages always see the
        # identity form; the wire coding is recorded for lineage
        bodies.append(decode_http_body(page.body, page.content_encoding))
        fmts.append(page.fmt)
        encodings.append(page.content_encoding)
        set_cookies.append(page.set_cookie)
        latencies[j] = page.latency_ms
        total_sleep += page.latency_ms / 1000.0
        if page.status != TIMEOUT_EXC_STATUS:
            miss_idx.append(j)
    if cache is not None and miss_idx:
        # DummyPolicy store: EVERY downloaded response (error statuses
        # included), visible from round_no+1 (round-aligned)
        mi = np.asarray(miss_idx)
        cache.store(
            pa.table(
                {
                    "url_hash": pa.array(fps[mi], pa.uint64()),
                    "host_hash": batch["host_hash"].take(pa.array(mi)),
                    "status": pa.array(statuses[mi], pa.int32()),
                    "kind": pa.array([kinds[j] for j in miss_idx], pa.string()),
                    "body": pa.array([bodies[j] for j in miss_idx],
                                     pa.large_binary()),
                    "fmt": pa.array([fmts[j] for j in miss_idx], pa.string()),
                    "set_cookie": pa.array(
                        [set_cookies[j] for j in miss_idx], pa.string()
                    ),
                }
            ),
            round_no,
        )
    if simulate_latency and total_sleep:
        # batch-level sleep stand-in for network time (politeness
        # pacing itself lives in the politeness stage, not here)
        import time

        time.sleep(min(total_sleep / max(len(urls), 1), 0.05))
    cols = dict(zip(batch.column_names, batch.columns))
    cols["status"] = pa.array(statuses, pa.int32())
    cols["kind"] = pa.array(kinds, pa.string())
    cols["body"] = pa.array(bodies, pa.large_binary())
    cols["fmt"] = pa.array(fmts, pa.string())
    cols["content_encoding"] = pa.array(encodings, pa.string())
    cols["set_cookie"] = pa.array(set_cookies, pa.string())
    cols["latency_ms"] = pa.array(latencies, pa.int32())
    cols["ua"] = pa.array(uas, pa.string())
    if _PROXY_CFG.enabled and "host" in batch.column_names:
        # ST6: per-country proxy selection + rotate-on-retry (pure
        # function — see spider_ray.proxy for why no mutable health)
        pairs = [
            select_proxy(_PROXY_CFG, h, uh, rc or 0)
            for h, uh, rc in zip(
                batch["host"].to_pylist(),
                batch["url_hash"].to_pylist(),
                retries,
            )
        ]
        cols["proxy"] = pa.array([p for p, _ in pairs], pa.string())
        cols["proxy_zone"] = pa.array([z for _, z in pairs], pa.string())
    return pa.table(cols)
