"""spider_ray — a Ray-Data-native URL-frontier + fetch scheduler.

A from-scratch re-expression of the crawl dataflow of the reference
(dqsdatalabs/spider, a Scrapy monorepo — see SURVEY.md) as idiomatic
Ray Data pipelines: ``ray.data.Dataset`` → ``map_batches`` over
zero-copy Arrow batches, actor pools for the stateful stages (URL-seen
cuckoo shards, per-host politeness owners, fetch sessions), and a
round-based BFS frontier loop with per-round checkpoint + lineage.

Nothing here is a port: the reference's Twisted/scrapyd execution
engine (python_spiders/settings.py, docker/scrapyd.conf) is replaced
wholesale; only the *semantics* (operator inventory in SURVEY.md §2)
are preserved.
"""

__version__ = "0.1.0"
