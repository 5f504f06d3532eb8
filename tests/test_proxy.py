"""ST6 proxy-selection middleware (spider_ray.proxy): per-country zone
routing + deterministic rotate-on-retry, mirroring the reference's
ProxyMiddleware semantics (middlewares.py:114-168) without its vendor
endpoint or credentials."""

import numpy as np
import pyarrow as pa

from spider_ray.proxy import ProxyConfig, ZONES, host_zone, select_proxy


def test_zone_assignment_stable_and_covering():
    zones = {host_zone(f"h{i}.test") for i in range(200)}
    assert zones == set(ZONES)  # every zone reachable
    assert host_zone("h3.test") == host_zone("h3.test")  # stable


def test_retry_rotates_off_failed_proxy():
    cfg = ProxyConfig()
    p0, z0 = select_proxy(cfg, "h1.test", url_hash=12345, retry_count=0)
    p1, z1 = select_proxy(cfg, "h1.test", url_hash=12345, retry_count=1)
    assert z0 == z1 and z0.startswith("country-")
    assert p0 != p1  # the retry never reuses the endpoint that failed
    # same zone's pool: only the index varies
    assert p0.rsplit(".", 2)[0][:-1] == p1.rsplit(".", 2)[0][:-1]
    # pure: same inputs → same outputs (determinism across parallelism)
    assert select_proxy(cfg, "h1.test", 12345, 1) == (p1, z1)


def test_no_vendor_or_secret_strings():
    cfg = ProxyConfig()
    for i in range(50):
        p, z = select_proxy(cfg, f"h{i}.test", i * 7919)
        assert ".pool.test:" in p
        for banned in ("lum", "superproxy", "zproxy", "customer"):
            assert banned not in p and banned not in z


def test_fetch_rows_carry_proxy_columns():
    from spider_ray.fetch import fetch_batch
    from spider_ray.hashing import xxh64
    from spider_ray.synth import WorldConfig

    cfg = WorldConfig(num_hosts=2)
    urls = [f"http://h0.test/l/0", f"http://h1.test/l/0"]
    batch = pa.table(
        {
            "canonical_url": pa.array(urls, pa.string()),
            "url_hash": pa.array([xxh64(u) for u in urls], pa.uint64()),
            "host": pa.array(["h0.test", "h1.test"], pa.string()),
        }
    )
    out = fetch_batch(batch, cfg=cfg)
    proxies = out["proxy"].to_pylist()
    zones = out["proxy_zone"].to_pylist()
    assert all(p.startswith("http://proxy-") for p in proxies)
    assert zones[0] == f"country-{host_zone('h0.test')}"
    assert zones[1] == f"country-{host_zone('h1.test')}"
