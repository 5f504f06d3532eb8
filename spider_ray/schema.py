"""Arrow schemas for every logical table in the engine.

Sources (SURVEY.md §1.3):
  * frontier row  — the Ray-Data re-expression of ``scrapy.Request``
    (reference readme.md:36-53; meta-carry spiders/100case_it.py:77).
  * listing item  — ``ListingItem`` (python_spiders/items.py:8-56) with
    template-documented types (templates/spiders/basic.tmpl:49-101).
  * images sink   — authoritative from BASELINE.json ``input_hint``:
    (image_id, bytes, w, h, fmt, caption, phash).
  * lineage       — per-(partition, round) crawl accounting (north rule).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------- frontier
# request.meta continuation state (ST10) is FLATTENED into plain
# columns — "meta propagation becomes ordinary columns carried through
# map_batches" (SURVEY.md §1.3); a nested struct would also defeat
# Ray Data's sort/shuffle kernels.
FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("canonical_url", pa.string()),
        ("url_hash", pa.uint64()),
        ("host", pa.string()),
        ("host_hash", pa.uint64()),
        ("depth", pa.int8()),
        ("priority", pa.int32()),
        # Deterministic discovery-order key: (seq_parent, seq_link).
        # seq_parent = parent's global seq (seeds: row index), seq_link =
        # index of this link within the parent's expansion. Ordering is
        # ALWAYS the tuple (round, host, seq_parent, seq_link) — never
        # task completion order — which is what makes an N-CPU and a
        # 4N-CPU run byte-identical (north rule determinism).
        ("seq_parent", pa.int64()),
        ("seq_link", pa.int32()),
        ("seq", pa.int64()),  # dense per-round rank, assigned at frontier build
        ("parent_url", pa.string()),
        ("round", pa.int32()),
        ("callback", pa.string()),  # 'parse' | 'populate_item' | 'image'
        ("meta_page", pa.int32()),
        ("meta_skip", pa.int32()),
        ("meta_take", pa.int32()),
        ("meta_property_type", pa.string()),
        ("form_body", pa.binary()),
        ("retry_count", pa.int32()),
        ("skip_dedup", pa.bool_()),  # dont_filter=True (spiders/15walmer.py:112)
        # meta-carry (ST10): image requests bring the caption their sink
        # row needs — the reference carries partial items in request.meta
        # (spiders/100case_it.py:85-92); here it's just a column.
        ("caption", pa.string()),
    ]
)

# ---------------------------------------------------------------- listing item
_BOOL_AMENITIES = [
    "pets_allowed",
    "furnished",
    "parking",
    "elevator",
    "balcony",
    "terrace",
    "swimming_pool",
    "washing_machine",
    "dishwasher",
]

LISTING_SCHEMA = pa.schema(
    [
        ("external_link", pa.string()),
        ("external_source", pa.string()),
        ("external_id", pa.string()),
        ("position", pa.int32()),
        ("title", pa.string()),
        ("description", pa.large_string()),
        ("address", pa.string()),
        ("property_type", pa.string()),
        ("city", pa.string()),
        ("zipcode", pa.string()),
        ("latitude", pa.string()),  # strings in the reference (items.py)
        ("longitude", pa.string()),
        ("square_meters", pa.int32()),
        ("room_count", pa.int32()),
        ("bathroom_count", pa.int32()),
        ("floor", pa.string()),
        ("rent_string", pa.string()),
        ("rent", pa.int32()),
        ("currency", pa.string()),
        ("deposit", pa.int32()),
        ("prepaid_rent", pa.int32()),
        ("utilities", pa.int32()),
        ("water_cost", pa.int32()),
        ("heating_cost", pa.int32()),
        ("available_date", pa.string()),
        *[(name, pa.bool_()) for name in _BOOL_AMENITIES],
        ("images", pa.list_(pa.string())),
        ("floor_plan_images", pa.list_(pa.string())),
        ("external_images_count", pa.int32()),
        ("energy_label", pa.string()),
        ("landlord_name", pa.string()),
        ("landlord_phone", pa.string()),
        ("landlord_email", pa.string()),
    ]
)

AMENITY_COLUMNS = list(_BOOL_AMENITIES)

# ---------------------------------------------------------------- images sink
# Authoritative shape per BASELINE.json input_hint, plus ``src_url``:
# the source-image lineage column that lets the streaming validation
# stage re-synthesize ground-truth pixels in-stage (VERDICT r1 #2 —
# without it pixels_ok could only self-check and was unfalsifiable).
IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("src_url", pa.string()),
    ]
)

# ---------------------------------------------------------------- lineage
LINEAGE_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("round", pa.int32()),
        ("rows_in", pa.int64()),
        ("rows_deduped", pa.int64()),
        ("rows_admitted", pa.int64()),
        ("rows_deferred", pa.int64()),
        ("rows_fetched", pa.int64()),
        ("rows_failed", pa.int64()),
        ("items_emitted", pa.int64()),
        ("images_written", pa.int64()),
        ("checkpoint_path", pa.string()),
    ]
)

ROBOTS_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("crawl_delay_ms", pa.int32()),
        ("disallow", pa.list_(pa.string())),
        ("max_concurrency", pa.int32()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
