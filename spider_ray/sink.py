"""Sink writers — Lance-shape image+caption output.

BASELINE.json's input_hint names **Lance** as the sink format. The
``lance``/``pylance`` wheel is not installed in this container, so the
writer negotiates: Lance when importable (one-line path), otherwise a
partitioned Parquet layout with identical schema + a manifest marker —
the bytes-on-disk container changes, the table contract doesn't.

Fragment sizing: the reference POSTs items in 100,000-row slices
(python_spiders/pipelines.py:85-91); that batch size maps onto the
sink's max-rows-per-file/fragment knob (A2 in SURVEY.md §2.5).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from .schema import IMAGES_SCHEMA

SINK_BATCH_ROWS = 100_000  # pipelines.py:85 slice size → fragment size

try:  # pragma: no cover — not installed in this container
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def write_images(data, path: str, *, max_rows_per_file: int = SINK_BATCH_ROWS) -> str:
    """Write an images table/Dataset to ``path``.

    Returns the format used ('lance' or 'parquet'). Accepts a
    ``pyarrow.Table`` or a ``ray.data.Dataset`` (streams via
    write_parquet in the parquet fallback — never materialized on the
    driver).
    """
    import ray.data as rd

    if HAVE_LANCE:  # pragma: no cover
        if isinstance(data, rd.Dataset):
            data.write_lance(path, max_rows_per_file=max_rows_per_file)
        else:
            import lance

            lance.write_dataset(data, path, max_rows_per_file=max_rows_per_file)
        return "lance"
    os.makedirs(path, exist_ok=True)
    if isinstance(data, rd.Dataset):
        data.write_parquet(path, min_rows_per_file=min(max_rows_per_file, 1 << 20))
    else:
        tbl = data.cast(IMAGES_SCHEMA) if data.schema != IMAGES_SCHEMA else data
        for i in range(0, max(tbl.num_rows, 1), max_rows_per_file):
            pq.write_table(
                tbl.slice(i, max_rows_per_file),
                os.path.join(path, f"fragment-{i // max_rows_per_file:05d}.parquet"),
            )
    with open(os.path.join(path, "_MANIFEST.json"), "w") as f:
        json.dump(
            {
                "format": "parquet-lance-fallback",
                "schema": IMAGES_SCHEMA.to_string(),
                "reason": "lance wheel unavailable in container; "
                          "schema contract identical",
            },
            f,
        )
    return "parquet"


def export_items(data, path: str, *, fmt: str = "jsonl",
                 encoding: str = "utf-8") -> str:
    """FEED export analog (S7's item-side twin): Scrapy's feed
    exporter as a distributed Ray Data write.

    The reference spiders configure it via custom_settings —
    ``FEED_EXPORT_ENCODING = "utf-8"`` (raywhiteoakleigh_com_au.py:24,
    kwturkiye_com_kwkent.py:20, cedimmo_be.py:23, …6 spiders) and the
    commented FEED_FORMAT json / FEED_URI pairs (nethouseprices_com.py:
    25-26). Semantics mirrored: Scrapy's JSON exporter escapes
    non-ASCII by default and emits literal UTF-8 only when
    FEED_EXPORT_ENCODING says so — ``force_ascii`` maps 1:1.

    Accepts a ``pyarrow.Table`` (driver-mode items) or a
    ``ray.data.Dataset`` (streaming-mode items read back from their
    parquet partitions — stays distributed, one shard file per block).
    Returns the output directory.
    """
    import ray.data as rd

    if fmt not in ("jsonl", "csv"):
        raise ValueError(f"unsupported feed format: {fmt!r}")
    ds = data if isinstance(data, rd.Dataset) else rd.from_arrow(data)
    os.makedirs(path, exist_ok=True)
    if fmt == "jsonl":
        # pandas to_json kwargs ride through Ray's JSON datasink
        ds.write_json(path, force_ascii=(encoding.lower() != "utf-8"))
    else:
        # Scrapy's CSVItemExporter joins multivalued fields with ","
        # (_join_multivalued) — CSV cells are scalars
        ds.map_batches(_csv_safe, batch_format="pyarrow").write_csv(path)
    return path


def _csv_safe(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    cols = {}
    for name, col in zip(batch.column_names, batch.columns):
        t = col.type
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            if not pa.types.is_string(t.value_type):
                col = col.cast(pa.list_(pa.string()))
            cols[name] = pc.binary_join(col, ",")
        else:
            cols[name] = col
    return pa.table(cols)


def read_images(path: str):
    """Read the sink back as a Ray Dataset (either format)."""
    import ray.data as rd

    if HAVE_LANCE and os.path.isdir(os.path.join(path, "_versions")):  # pragma: no cover
        return rd.read_lance(path)
    return rd.read_parquet(path)
