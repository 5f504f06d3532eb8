"""Large-large joins — both shapes from the ray_guide:

  * native: ``Dataset.join`` (hash-partitioned shuffle on the key,
    Ray ≥ 2.46) — use when available;
  * portable: an explicit bucketed hash join — add ``bucket =
    hash(key) % B`` to both sides, union them with a side tag, group
    by bucket, and merge the two sides inside each group. The
    shape that works on any Ray version and makes the partitioning
    (and skew handling: salt a hot key's rows into sub-buckets and
    replicate the other side across them) explicit.

The crawl engine itself never needs a big-big join (SURVEY.md §2.4 —
the reference's joins are all broadcast-dict lookups), but a complete
data-processing engine does; both forms are exercised with a DuckDB
oracle in pipelines/queries.py, and the near-dup verify pipelines
(ops/dedup_text.py) ride on the bucketed form.

Type discipline: the union pads each side's missing columns with
TYPED nulls and every group emits a table cast to one fixed output
schema — so the shuffle concat never sees two blocks disagreeing on a
column type (int64 vs double), which bit the round-1 version at scale.
int64 columns cross the pandas merge as nullable ``Int64`` (never
float64), so full-range 64-bit keys survive exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..hashing import splitmix64


def _bucket_of(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    return (splitmix64(keys.astype(np.uint64)) % np.uint64(num_buckets)).astype(
        np.int32
    )


def _types_mapper(t: pa.DataType):
    # int columns ride the pandas merge as nullable Int64 — exact for
    # the full 64-bit range (float64 would corrupt keys above 2^53)
    if pa.types.is_integer(t):
        return pd.Int64Dtype()
    return None


def _schema_of(ds: rd.Dataset, provided: pa.Schema | None) -> pa.Schema:
    """Schema without accidental execution: a bare ``.schema()`` on an
    unmaterialized Dataset runs a limit-1 plan of the whole upstream
    chain (and sort barriers make that a FULL execution) — callers on
    hot paths pass the schema explicitly."""
    if provided is not None:
        return provided
    s = ds.schema(fetch_if_missing=False) or ds.schema()
    return pa.schema(list(zip(s.names, s.types)))


def bucketed_hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: str,
    right_on: str | None = None,
    num_buckets: int = 32,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    hot_keys: "list[int] | None" = None,
    salt: int = 8,
) -> rd.Dataset:
    """Inner join via explicit hash bucketing (no Dataset.join).

    Both inputs are tagged and normalized to a common column superset
    (missing columns typed-null), bucketed on the key hash, shuffled
    once by ``groupby('__bucket')``, and merged side-by-side per
    bucket. Output columns = left columns ∪ right's non-key,
    non-colliding columns (key appears once, under the left name).
    Pass ``left_schema``/``right_schema`` when the input is a lazy
    chain — see :func:`_schema_of`.

    Skew handling (``hot_keys`` + ``salt``): a hot key would send its
    entire row population to one bucket/task. Salting splits each hot
    key's LEFT rows uniformly across ``salt`` sub-buckets (bucket =
    hash(key, row_index % salt)), and REPLICATES the right side's rows
    for that key into all ``salt`` sub-buckets — the standard
    skew-join decomposition; output is identical to the unsalted join
    (asserted in tests/test_ops.py).
    """
    right_on = right_on or on
    left_schema = _schema_of(left, left_schema)
    right_schema = _schema_of(right, right_schema)
    hot = np.array(sorted(hot_keys or []), dtype=np.int64)
    left_cols = list(left_schema.names)
    right_cols = [
        c for c in right_schema.names if c != right_on and c not in left_cols
    ]
    lt = dict(zip(left_schema.names, left_schema.types))
    rt = dict(zip(right_schema.names, right_schema.types))
    out_schema = pa.schema(
        [(c, lt[c]) for c in left_cols] + [(c, rt[c]) for c in right_cols]
    )

    def tag(side: str, key_col: str):
        def f(b: pa.Table) -> pa.Table:
            keys = b[key_col].to_numpy(zero_copy_only=False)
            base = {}
            for c in left_cols + right_cols:
                typ = lt.get(c) or rt.get(c)
                if c in b.column_names:
                    base[c] = b[c].cast(typ)
                elif side == "R" and c == on:
                    base[c] = b[key_col].cast(typ)
                else:
                    base[c] = pa.nulls(b.num_rows, typ)
            bucket = _bucket_of(keys, num_buckets)
            is_hot = (
                np.isin(keys.astype(np.int64), hot)
                if len(hot)
                else np.zeros(len(keys), dtype=bool)
            )
            if not is_hot.any():
                cols = dict(base)
                cols["__side"] = pa.array([side] * b.num_rows, pa.string())
                cols["__bucket"] = pa.array(bucket, pa.int32())
                return pa.table(cols)
            # salted sub-buckets live above the normal bucket range:
            # sub-bucket id = num_buckets + hot_index*salt + s
            hot_idx = np.searchsorted(hot, keys.astype(np.int64))
            if side == "L":
                s = np.arange(len(keys)) % salt  # uniform spread
                salted = num_buckets + hot_idx * salt + s
                cols = dict(base)
                cols["__side"] = pa.array([side] * b.num_rows, pa.string())
                cols["__bucket"] = pa.array(
                    np.where(is_hot, salted, bucket).astype(np.int32), pa.int32()
                )
                return pa.table(cols)
            # R side: non-hot rows keep their bucket; hot rows REPLICATE
            # into every sub-bucket of their key
            n_cold = int((~is_hot).sum())
            cold = pa.table(
                {**{c: a.filter(pa.array(~is_hot)) for c, a in base.items()},
                 "__side": pa.array(["R"] * n_cold, pa.string()),
                 "__bucket": pa.array(bucket[~is_hot], pa.int32())}
            )
            parts = [cold]
            hot_tbl = pa.table(
                {c: a.filter(pa.array(is_hot)) for c, a in base.items()}
            )
            h_idx = hot_idx[is_hot]
            for s in range(salt):
                parts.append(
                    hot_tbl.append_column(
                        "__side", pa.array(["R"] * hot_tbl.num_rows, pa.string())
                    ).append_column(
                        "__bucket",
                        pa.array(
                            (num_buckets + h_idx * salt + s).astype(np.int32),
                            pa.int32(),
                        ),
                    )
                )
            return pa.concat_tables(parts)

        return f

    tagged = left.map_batches(tag("L", on), batch_format="pyarrow").union(
        right.map_batches(tag("R", right_on), batch_format="pyarrow")
    )

    def merge_bucket(g: pa.Table) -> pa.Table:
        lmask = pc.equal(g["__side"], "L")
        l = g.filter(lmask).select(left_cols)
        r = g.filter(pc.invert(lmask)).select([on] + right_cols)
        out = l.to_pandas(types_mapper=_types_mapper).merge(
            r.to_pandas(types_mapper=_types_mapper), on=on, how="inner"
        )
        return pa.Table.from_pandas(out, preserve_index=False).cast(out_schema)

    return tagged.groupby("__bucket").map_groups(merge_bucket, batch_format="pyarrow")
