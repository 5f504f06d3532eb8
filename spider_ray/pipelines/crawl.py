"""Flagship pipeline: crawl a synthetic web world whose captions come
from the driver's documents table, landing image+caption rows in the
input_hint sink shape.

``entry()`` (driver contract) = ``run_crawl(sf0.001_dir)`` → images
Dataset. The world size scales with the document count so sf0.001 /
sf0.01 / sf0.1 exercise progressively larger crawls.
"""

from __future__ import annotations

import ray.data as rd

from ..frontier import Crawler
from ..synth import WorldConfig, load_captions_from_documents


def run_crawl(
    sf_dir: str,
    *,
    num_hosts: int = 8,
    max_pages_per_host: int = 3,
    details_per_page: int = 6,
    obey_robots: bool = True,
    checkpoint_dir: str | None = None,
    num_dedup_shards: int = 8,
    round_window_ms: int = 60_000,
    fetch_batch_size: int = 512,
    images_out_dir: str | None = None,
    world_overrides: dict | None = None,
    http_cache_dir: str | None = None,
) -> tuple[Crawler, dict]:
    captions = load_captions_from_documents(f"{sf_dir}/documents.parquet")
    cfg = WorldConfig(
        num_hosts=num_hosts,
        max_pages_per_host=max_pages_per_host,
        details_per_page=details_per_page,
        **(world_overrides or {}),
    )
    crawler = Crawler(
        cfg,
        captions,
        checkpoint_dir=checkpoint_dir,
        num_dedup_shards=num_dedup_shards,
        obey_robots=obey_robots,
        round_window_ms=round_window_ms,
        fetch_batch_size=fetch_batch_size,
        images_out_dir=images_out_dir,
        http_cache_dir=http_cache_dir,
    )
    stats = crawler.crawl(cfg.seeds())
    return crawler, stats


def flagship_entry(sf_dir: str = "/root/testdata/sf0.001") -> rd.Dataset:
    """Driver smoke entry: run the crawl, return the sink Dataset."""
    crawler, _stats = run_crawl(sf_dir)
    return crawler.images_dataset()
