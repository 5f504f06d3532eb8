"""CLI entry: run a crawl job end to end.

    python -m spider_ray --sf-dir /root/testdata/sf0.01 \
        --hosts 16 --pages 2 --details 8 \
        --checkpoint /tmp/ck --images-out /tmp/images

This is the `ray job submit` payload shape: one driver process that
owns a Ray session and runs the frontier loop to exhaustion (resuming
from --checkpoint when prior rounds exist). Scripts own their session
(driver-contract code paths never call ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="spider_ray")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                    help="caption-corpus table directory (documents.parquet)")
    ap.add_argument("--hosts", type=int, default=8)
    ap.add_argument("--pages", type=int, default=2)
    ap.add_argument("--details", type=int, default=6)
    ap.add_argument("--api-host-pct", type=int, default=25)
    ap.add_argument("--window-ms", type=int, default=60_000)
    ap.add_argument("--no-robots", action="store_true",
                    help="reference-parity mode (ROBOTSTXT_OBEY=False)")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--images-out", default=None)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    ap.add_argument("--dedup-shards", type=int, default=8)
    ap.add_argument("--http-cache", default=None,
                    help="HTTPCACHE_ENABLED analog: response cache dir; "
                         "a warm re-run re-downloads nothing")
    ap.add_argument("--export-items", default=None, metavar="DIR",
                    help="FEED export analog: write the crawl's item "
                         "rows to DIR as a feed")
    ap.add_argument("--export-format", default="jsonl",
                    choices=("jsonl", "csv"),
                    help="FEED_FORMAT analog (default jsonl)")
    ap.add_argument("--export-encoding", default="utf-8",
                    help="FEED_EXPORT_ENCODING analog: utf-8 emits "
                         "literal unicode, anything else ASCII-escapes "
                         "(Scrapy's default)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from spider_ray.frontier import Crawler
    from spider_ray.synth import WorldConfig, load_captions_from_documents

    cfg = WorldConfig(
        num_hosts=args.hosts,
        max_pages_per_host=args.pages,
        details_per_page=args.details,
        api_host_pct=args.api_host_pct,
    )
    captions = load_captions_from_documents(f"{args.sf_dir}/documents.parquet")
    crawler = Crawler(
        cfg, captions,
        checkpoint_dir=args.checkpoint,
        images_out_dir=args.images_out,
        num_dedup_shards=args.dedup_shards,
        obey_robots=not args.no_robots,
        round_window_ms=args.window_ms,
        http_cache_dir=args.http_cache,
    )
    resumed = crawler.resume() if args.checkpoint else False
    stats = crawler.crawl(cfg.seeds() if not resumed else [])
    exported = None
    if args.export_items:
        from spider_ray.sink import export_items

        items = crawler.items_table()
        if items.num_rows:
            exported = export_items(items, args.export_items,
                                    fmt=args.export_format,
                                    encoding=args.export_encoding)
    print(json.dumps({"resumed": resumed, **stats,
                      "items_feed": exported,
                      "lineage_rounds": len(crawler.lineage)}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
