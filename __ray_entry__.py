"""Driver contract for the graft builder (Ray Data target).

``entry()``  — flagship crawl over a synthetic web world whose
captions come from /root/testdata/sf0.001/documents.parquet, returning
the image+caption sink Dataset in the BASELINE.json input_hint shape
(image_id, bytes, w, h, fmt, caption, phash).

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2 plus the training-data ops (50 queries, 47 oracled
in round 4, ordered oracled-first and capped at the driver's 50-query
window); see spider_ray/pipelines/queries.py for the registry.
The crawl-family queries are oracled against the independent
sequential simulator via parquet dumps; only genuinely approximate
(HLL/DDSketch sketches, LSH/IVF ANN) or xxh64-based (fingerprint,
simhash signatures) ops have no oracle entry → driver rows-only check.

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() here or in the library.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from spider_ray.pipelines.crawl import flagship_entry

    return flagship_entry("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from spider_ray.pipelines.queries import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from spider_ray.pipelines.queries import QUERIES, ensure_crawl_oracle_dumps

    # the crawl-family oracles are simulator parquet dumps; regenerate
    # them here (pure Python, no Ray) so the SQL is valid regardless of
    # whether the driver evaluates it before or after the queries run
    ensure_crawl_oracle_dumps()
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
