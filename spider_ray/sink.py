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


def read_images(path: str):
    """Read the sink back as a Ray Dataset (either format)."""
    import ray.data as rd

    if HAVE_LANCE and os.path.isdir(os.path.join(path, "_versions")):  # pragma: no cover
        return rd.read_lance(path)
    return rd.read_parquet(path)
