"""Per-host politeness — robots.txt rules + crawl-delay budget admission.

Reference semantics: Scrapy downloader slots — per-domain concurrency
16, AutoThrottle delay adapting in [0.1 s, 2 s], robots explicitly
DISABLED (``ROBOTSTXT_OBEY = False``, python_spiders/settings.py:21,
31,74-78). The north rule requires robots support anyway, so the graft
implements it with an ``obey_robots=False`` reference-parity mode for
ordering-equality tests.

Round-based model: a crawl round represents a fixed wall-clock window
``round_window_ms``. A host whose crawl delay is ``d`` ms may fetch at
most ``k = max(1, window // d)`` URLs per round (further capped by the
per-domain concurrency cap × a latency allowance); the first ``k``
candidates by the deterministic order key ``(seq_parent, seq_link)``
are admitted, the rest are **deferred** — they stay in the frontier
table and compete again next round. Deferral is therefore data, not
actor state: the frontier parquet IS the politeness state, which is
what makes checkpoint/resume trivial and exact.

Execution shape (north rule: "host-hash partitioned via groupby
shuffle so one actor owns each host's robots.txt state"):

    ds.map_batches(prefilter)          # skew guard: per-batch top-k per host
      .groupby("host_hash")            # the one skewed shuffle
      .map_groups(PolitenessAdmit(...))# callable CLASS → actor pool;
                                       # robots cache lives in __init__

Skew note (SURVEY.md §4): the shuffle only has to move candidates that
can possibly be admitted. ``prefilter_topk_per_host`` keeps, per
input batch, only each host's ``k`` lowest-seq rows (a per-batch
combiner); everything else is deferred WITHOUT being shuffled, since
the global top-k of a union is contained in the union of per-batch
top-k's. A hot host with 10^7 pending URLs ships ``k × num_batches``
rows through the shuffle instead of 10^7.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd

from .synth import World, WorldConfig

PER_DOMAIN_CONCURRENCY = 16  # settings.py:31
AUTOTHROTTLE_START_DELAY_MS = 100  # settings.py:76 (0.1 s)

_RULES_CACHE: dict = {}  # per-process robots cache, keyed by WorldConfig


_PAT_CACHE: dict = {}


def _robots_pattern(pat: str):
    """Compile a robots path pattern per RFC 9309 §2.2.3: ``*`` matches
    any run of characters, a trailing ``$`` anchors the end; otherwise
    the pattern is a prefix match."""
    rx = _PAT_CACHE.get(pat)
    if rx is None:
        core, anchor = (pat[:-1], True) if pat.endswith("$") else (pat, False)
        body = ".*".join(re.escape(p) for p in core.split("*"))
        rx = re.compile(body + ("$" if anchor else ""))
        _PAT_CACHE[pat] = rx
    return rx


@dataclass
class RobotsRules:
    crawl_delay_ms: int
    # (is_allow, pattern) pairs of the group that governs our agent
    rules: tuple[tuple[bool, str], ...] = ()

    def allows(self, path: str) -> bool:
        """RFC 9309 §2.2.2 precedence: the matching rule with the
        LONGEST pattern wins; on a tie, Allow wins; no match ⇒ allowed."""
        best_len = -1
        best_allow = True
        for is_allow, pat in self.rules:
            if len(pat) >= best_len and _robots_pattern(pat).match(path):
                if len(pat) > best_len:
                    best_len, best_allow = len(pat), is_allow
                elif is_allow:
                    best_allow = True
        return best_allow

    @property
    def disallow(self) -> tuple[str, ...]:
        """Back-compat view: the group's Disallow patterns."""
        return tuple(p for ia, p in self.rules if not ia)


def parse_robots(body: bytes, default_delay_ms: int = AUTOTHROTTLE_START_DELAY_MS,
                 agent: str = "spider-ray") -> RobotsRules:
    """robots.txt parser per RFC 9309: groups of consecutive
    ``User-agent`` lines followed by ``Allow``/``Disallow`` rules
    (wildcards + ``$`` anchors), plus the de-facto ``Crawl-delay``.
    The governing group is the one whose agent token is the longest
    prefix of ``agent`` (case-insensitive), falling back to ``*``;
    an empty Disallow contributes no rule (allow-all)."""
    # groups: [(agents, rules, delay)]
    groups: list[tuple[list[str], list[tuple[bool, str]], list[int]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    cur_delay: list[int] = []
    in_agents = False  # consecutive UA lines extend the same group

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], []

    for line in body.decode("utf-8", "replace").splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_agents:
                flush()
                in_agents = True
            cur_agents.append(val.lower())
        else:
            in_agents = False
            if key == "crawl-delay":
                try:
                    cur_delay.append(int(float(val) * 1000))
                except ValueError:
                    pass
            elif key in ("allow", "disallow") and val:
                cur_rules.append((key == "allow", val))
    flush()

    # governing group: longest agent token that prefixes ours; else '*'
    agent = agent.lower()
    best: tuple[int, list, list] | None = None
    star: tuple[list, list] | None = None
    for agents, rules, delays in groups:
        for a in agents:
            if a == "*":
                star = (rules, delays)
            elif agent.startswith(a) and (best is None or len(a) > best[0]):
                best = (len(a), rules, delays)
    if best is not None:
        rules, delays = best[1], best[2]
    elif star is not None:
        rules, delays = star
    else:
        rules, delays = [], []
    delay = delays[0] if delays else default_delay_ms
    return RobotsRules(delay, tuple(rules))


AUTOTHROTTLE_MAX_DELAY_MS = 2000  # settings.py:77 (2 s)


def autothrottle_delay_ms(cfg: WorldConfig, host: str, round_no: int) -> int:
    """ST3 — AutoThrottle's adaptive per-slot delay
    (python_spiders/settings.py:74-78): after each response,
    ``delay ← clamp((delay + latency) / 2, START, MAX)``. The synthetic
    world's per-host latency is constant, so iterating the recurrence
    ``round_no`` times from START is exactly what runtime adaptation
    would produce — making the adapted delay a pure function of
    (host, round) that both engine and oracle compute identically. A
    real-HTTP deployment would feed observed latencies through the same
    update rule via the lineage channel.

    Per-spider custom_settings (``cfg.host_settings``): with
    AUTOTHROTTLE_ENABLED False the delay is the fixed DOWNLOAD_DELAY
    (Scrapy's plain-delay slot); otherwise the slot starts at
    ``max(DOWNLOAD_DELAY, AUTOTHROTTLE_START_DELAY)`` (AutoThrottle's
    ``_spider_opened``) and the recurrence clamps to that floor and to
    AUTOTHROTTLE_MAX_DELAY. Defaults reproduce the pre-surface
    behavior bit-for-bit (floor 100 ms, ceiling 2000 ms)."""
    hs = cfg.host_settings(host)
    if not hs.at_enabled:
        return hs.download_delay_ms
    lo = max(hs.at_start_ms, hs.download_delay_ms)
    lat = cfg.host_latency_ms(host)
    d = float(lo)
    for _ in range(min(round_no, 32)):  # converges geometrically
        d = (d + lat) / 2.0
        d = min(max(d, lo), hs.at_max_ms)
    return int(d)


def host_budget(delay_ms: int, round_window_ms: int,
                concurrency: int = PER_DOMAIN_CONCURRENCY) -> int:
    """URLs a host may fetch in one round window. ``concurrency`` is
    the per-spider CONCURRENT_REQUESTS cap (custom_settings; ≥16
    default = the global per-domain slot cap, settings.py:31)."""
    k = max(1, round_window_ms // max(delay_ms, 1))
    return min(k, concurrency * max(1, round_window_ms // 1000))


def max_host_budget(cfg: WorldConfig, round_window_ms: int,
                    obey_robots: bool) -> int:
    """Containment bound for the prefilter combiner: an upper bound on
    ANY host's per-round budget under ``cfg`` (global defaults plus
    every custom-politeness profile a host could draw)."""
    from .synth import _POLITENESS_PROFILES

    base_delay = (cfg.min_crawl_delay_ms if obey_robots
                  else AUTOTHROTTLE_START_DELAY_MS)
    best = host_budget(base_delay, round_window_ms)
    if cfg.custom_politeness_pct:
        for _w, hs in _POLITENESS_PROFILES:
            floor = (hs.download_delay_ms if not hs.at_enabled
                     else max(hs.at_start_ms, hs.download_delay_ms))
            if obey_robots:
                floor = max(floor, cfg.min_crawl_delay_ms)
            best = max(best, host_budget(floor, round_window_ms,
                                         hs.concurrency))
    return best


class PolitenessAdmit:
    """``map_groups`` body over one host's candidates (actor pool).

    ``__init__`` (once per actor): builds the robots resolver + cache.
    ``__call__`` (once per host per round): fetch/cached robots rules,
    drop disallowed paths (when obeying), admit the first ``k`` rows by
    the dense per-round ``seq``, mark the rest deferred.

    Output adds two columns: ``admitted`` (bool) and ``blocked`` (bool,
    robots-disallowed — dropped from the crawl, recorded in lineage).
    """

    def __init__(self, cfg: WorldConfig, round_window_ms: int = 60_000,
                 obey_robots: bool = True, round_no: int = 0,
                 http_cache=None):
        self.world = World(cfg)  # robots fetches only; captions irrelevant
        self.window = round_window_ms
        self.obey = obey_robots
        self.round_no = round_no
        self.http_cache = http_cache
        # robots cache is per worker PROCESS (keyed by world config), so
        # map_groups tasks across rounds reuse it — same amortization as
        # actor state without per-execution actor churn
        self.cache: dict[str, RobotsRules] = _RULES_CACHE.setdefault(cfg, {})

    def rules_for(self, host: str) -> RobotsRules:
        r = self.cache.get(host)
        if r is None:
            page = self.world.resolve(f"http://{host}/robots.txt")
            r = (
                parse_robots(page.body)
                if page.status == 200
                else RobotsRules(AUTOTHROTTLE_START_DELAY_MS)
            )
            self.cache[host] = r
        return r

    def delay_for(self, host: str) -> int:
        """Robots crawl-delay when obeying (floored by the spider's own
        DOWNLOAD_DELAY custom_setting — the crawler never goes faster
        than its author configured); AutoThrottle-adapted delay in
        reference-parity mode (ROBOTSTXT_OBEY=False still throttles)."""
        if self.obey:
            return max(self.rules_for(host).crawl_delay_ms,
                       self.world.cfg.host_settings(host).download_delay_ms)
        return autothrottle_delay_ms(self.world.cfg, host, self.round_no)

    def budget_for(self, host: str) -> int:
        """Per-round admission budget: the host's adapted delay and its
        spider's CONCURRENT_REQUESTS cap together."""
        return host_budget(self.delay_for(host), self.window,
                           self.world.cfg.host_settings(host).concurrency)

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        return admit_frame(group, self.rules_for, self.window, self.obey,
                           delay_for=self.delay_for,
                           budget_for=self.budget_for,
                           cache=self.http_cache, round_no=self.round_no)


def admit_masks(hosts, urls, rules_for, window_ms: int,
                obey: bool, priority=None,
                delay_for=None, free=None,
                budget_for=None) -> tuple[np.ndarray, np.ndarray]:
    """Core admission kernel over rows ALREADY sorted by (host_hash, seq)
    with each host fully contained: per contiguous host segment, mark
    robots-disallowed rows blocked and admit the budgeted-k eligible
    rows — highest ``priority`` first, FIFO by seq within a priority
    level (the reference scheduler's priority-queue semantics, O1).
    ``free`` rows (HTTP-cache hits — responses served without touching
    the downloader) are admitted without consuming a budget slot;
    robots blocking still applies to them (RobotsTxtMiddleware runs
    before HttpCacheMiddleware in Scrapy's downloader chain).
    Returns (admitted, blocked) bool arrays in input order."""
    from urllib.parse import urlsplit

    n = len(hosts)
    admitted = np.zeros(n, dtype=bool)
    blocked = np.zeros(n, dtype=bool)
    prio = (np.zeros(n, dtype=np.int64) if priority is None
            else np.asarray(priority, dtype=np.int64))
    fr = (np.zeros(n, dtype=bool) if free is None
          else np.asarray(free, dtype=bool))
    start = 0
    for end in range(1, n + 1):
        if end < n and hosts[end] == hosts[start]:
            continue
        rules = rules_for(hosts[start])
        if obey:
            blk = np.fromiter(
                (not rules.allows(urlsplit(u).path) for u in urls[start:end]),
                dtype=bool, count=end - start,
            )
        else:
            blk = np.zeros(end - start, dtype=bool)
        if budget_for is not None:
            k = budget_for(hosts[start])
        else:
            if delay_for is not None:
                delay = delay_for(hosts[start])
            else:
                delay = (rules.crawl_delay_ms if obey
                         else AUTOTHROTTLE_START_DELAY_MS)
            k = host_budget(delay, window_ms)
        seg_free = fr[start:end]
        eligible = ~blk & ~seg_free  # budget applies to downloads only
        seg_prio = prio[start:end]
        if (seg_prio != seg_prio[0]).any():
            # priority queue: admit in (-priority, seq) order; stable
            # argsort keeps FIFO within a priority level
            order = np.argsort(-seg_prio, kind="stable")
            adm_in_order = eligible[order] & (
                np.cumsum(eligible[order]) <= k
            )
            seg_adm = np.zeros(end - start, dtype=bool)
            seg_adm[order] = adm_in_order
            admitted[start:end] = seg_adm | (seg_free & ~blk)
        else:
            admitted[start:end] = (
                eligible & (np.cumsum(eligible) <= k)
            ) | (seg_free & ~blk)
        blocked[start:end] = blk
        start = end
    return admitted, blocked


def admit_frame(df: pd.DataFrame, rules_for, window_ms: int,
                obey: bool, delay_for=None, budget_for=None,
                cache=None, round_no: int = 0) -> pd.DataFrame:
    """pandas wrapper over :func:`admit_masks` (groupby/map_groups path).
    ``cache`` (HttpCache) marks cached fingerprints budget-free."""
    g = df.sort_values(["host_hash", "seq"], kind="mergesort").copy()
    free = None
    if cache is not None:
        free = cache.hit_mask(
            g["url_hash"].to_numpy().astype(np.uint64),
            g["host_hash"].to_numpy().astype(np.uint64),
            round_no,
        )
    admitted, blocked = admit_masks(
        g["host"].to_numpy(), g["canonical_url"].to_numpy(),
        rules_for, window_ms, obey,
        priority=g["priority"].to_numpy() if "priority" in g.columns else None,
        delay_for=delay_for,
        budget_for=budget_for,
        free=free,
    )
    g["admitted"] = admitted
    g["blocked"] = blocked
    return g


def prefilter_topk_per_host(batch: pd.DataFrame, max_k: int,
                            cfg: WorldConfig | None = None,
                            obey_robots: bool = False,
                            cache=None, round_no: int = 0) -> pd.DataFrame:
    """Skew guard (combiner): per batch, keep each host's ``max_k``
    top-ranked ADMISSIBLE rows for the politeness shuffle; rows beyond
    that are deferred in place (column ``prefiltered_defer``).

    Containment contract (ADVICE r1): admission takes the first-k
    *eligible* rows by ``(-priority, seq)`` per host, so the prefilter
    must (a) rank by the same key, not bare seq, and (b) not let
    robots-blocked rows crowd eligible ones out of the kept top-k.
    When ``cfg`` is provided and robots are obeyed, blocked rows are
    detected here (same per-process rules cache as admission), always
    kept (they must still reach admission to be recorded+committed as
    blocked), and excluded from the budget count."""
    from urllib.parse import urlsplit

    negprio = -batch["priority"] if "priority" in batch.columns else 0
    order = batch.assign(__negprio=negprio).sort_values(
        ["host_hash", "__negprio", "seq"], kind="mergesort"
    )
    if cfg is not None and obey_robots:
        admit = PolitenessAdmit(cfg, obey_robots=True)
        rules = {h: admit.rules_for(h) for h in order["host"].unique()}
        blocked = np.fromiter(
            (not rules[h].allows(urlsplit(u).path)
             for h, u in zip(order["host"], order["canonical_url"])),
            dtype=bool, count=len(order),
        )
    else:
        blocked = np.zeros(len(order), dtype=bool)
    # HTTP-cache hits never defer: they are budget-free at admission
    # (a cached response skips the downloader), so capping them here
    # would postpone fetches that cost nothing
    if cache is not None:
        free = cache.hit_mask(
            order["url_hash"].to_numpy().astype(np.uint64),
            order["host_hash"].to_numpy().astype(np.uint64),
            round_no,
        )
    else:
        free = np.zeros(len(order), dtype=bool)
    # rank only eligible rows toward the budget; blocked rows rank -1
    elig = (~blocked & ~free).astype(np.int64)
    csum = pd.Series(elig, index=order.index).groupby(
        order["host_hash"].to_numpy(), sort=False
    ).cumsum()
    rank = csum.to_numpy() - 1  # 0-based among eligible rows of the host
    out = order.drop(columns="__negprio").copy()
    out["prefiltered_defer"] = (~blocked) & (~free) & (rank >= max_k)
    return out
