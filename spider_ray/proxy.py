"""ST6 — per-country proxy selection middleware.

Reference semantics (middlewares.py:114-168 ProxyMiddleware): every
request is routed through a country-zone proxy endpoint with a
``Proxy-Authorization`` header naming the zone
(``...-country-de``/``tr``/``fr``/``us``/``uk``/``au``), toggled by
PROXY_*_ON settings. The reference hardcodes one commercial vendor's
endpoint and credentials; those are deliberately NOT reproduced —
endpoints here are neutral config defaults and the auth column carries
only the zone label, never a secret.

Graft shape: selection is a PURE function of (host, url_hash,
retry_count) —

  * the zone is the host's (hash-assigned, stable) country;
  * the pool index is ``(url_hash + retry_count) % pool_size``, so a
    retried fetch deterministically rotates OFF the proxy that just
    failed — the operational rotate-on-failure behavior — while the
    whole crawl stays byte-identical across any parallelism or block
    partitioning (mutable per-actor health counters would break the
    engine's determinism-across-parallelism invariant; at real scale
    the same pure rotation composes with the retry loop to route
    around a dead proxy within ``max_retries`` attempts).

In this sandbox the fetch resolver is synthetic, so the selected
endpoint is an annotation (``proxy`` / ``proxy_zone`` fetch columns),
exactly where a requests/aiohttp session would consume it.
"""

from __future__ import annotations

from dataclasses import dataclass

from .hashing import xxh64

# the reference's six country zones (middlewares.py:117-168)
ZONES = ("de", "tr", "fr", "us", "uk", "au")


@dataclass(frozen=True)
class ProxyConfig:
    """Immutable pool parameters; shipped inside fetch actors once."""

    enabled: bool = True
    pool_size: int = 4  # endpoints per country zone
    endpoint_fmt: str = "http://proxy-{zone}{idx}.pool.test:8080"


def host_zone(host: str) -> str:
    """Stable country zone for a host (hash-assigned in the synthetic
    world; a real deployment maps TLD/geo config here)."""
    return ZONES[xxh64("pxzone:" + host) % len(ZONES)]


def select_proxy(
    cfg: ProxyConfig, host: str, url_hash: int, retry_count: int = 0
) -> tuple[str, str]:
    """→ (proxy endpoint, zone label). Pure; retry_count rotates the
    pool index so a retry never reuses the endpoint that just failed."""
    zone = host_zone(host)
    idx = (int(url_hash) + int(retry_count)) % cfg.pool_size
    return cfg.endpoint_fmt.format(zone=zone, idx=idx), f"country-{zone}"
