"""Large-large joins — both shapes from the ray_guide:

  * native: ``Dataset.join`` (hash-partitioned shuffle on the key,
    Ray ≥ 2.46) — use when available;
  * portable: an explicit bucketed hash join — add ``bucket =
    hash(key) % B`` to both sides, union them with a side tag, group
    by bucket, and pandas-merge the two sides inside each group. The
    shape that works on any Ray version and makes the partitioning
    (and skew handling: salt a hot key's rows into sub-buckets and
    replicate the other side across them) explicit.

The crawl engine itself never needs a big-big join (SURVEY.md §2.4 —
the reference's joins are all broadcast-dict lookups), but a complete
data-processing engine does; both forms are exercised with a DuckDB
oracle in pipelines/queries.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..hashing import splitmix64


def _bucket_of(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    return (splitmix64(keys.astype(np.uint64)) % np.uint64(num_buckets)).astype(
        np.int32
    )


def bucketed_hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: str,
    right_on: str | None = None,
    num_buckets: int = 32,
) -> rd.Dataset:
    """Inner join via explicit hash bucketing (no Dataset.join).

    Both inputs are tagged and normalized to a common column superset
    (missing columns null), bucketed on the key hash, shuffled once by
    ``groupby('__bucket')``, and merged side-by-side per bucket.
    Output columns = left columns ∪ right columns (key appears once,
    under the left name).
    """
    right_on = right_on or on
    left_schema = left.schema()
    right_schema = right.schema()
    left_cols = list(left_schema.names)
    right_cols = [c for c in right_schema.names if c != right_on]
    all_cols = left_cols + [c for c in right_cols if c not in left_cols]

    def tag(side: str, key_col: str):
        def f(b: pa.Table) -> pa.Table:
            keys = b[key_col].to_numpy(zero_copy_only=False)
            cols = {}
            for c in all_cols:
                if c in b.column_names:
                    cols[c] = b[c]
                elif side == "R" and c == on:
                    cols[c] = b[key_col]
                else:
                    cols[c] = pa.nulls(b.num_rows)
            cols["__side"] = pa.array([side] * b.num_rows, pa.string())
            cols["__bucket"] = pa.array(_bucket_of(keys, num_buckets), pa.int32())
            return pa.table(cols)

        return f

    tagged = left.map_batches(tag("L", on), batch_format="pyarrow").union(
        right.map_batches(tag("R", right_on), batch_format="pyarrow")
    )

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "L"][left_cols]
        r = g[g["__side"] == "R"][[on] + right_cols]
        out = l.merge(r, on=on, how="inner", suffixes=("", "_r"))
        return out

    return tagged.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")
