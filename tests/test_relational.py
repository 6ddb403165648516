"""Every queries() entry must match its DuckDB oracle (the driver's gate)."""

import duckdb
import pytest

from mithril_spark.relational import QUERIES

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from parquet_scan('{SF}/{t}.parquet')"
        )
    yield con


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    fn, sql = QUERIES[name]
    got = _canon(fn(spark, SF).toPandas())
    want = _canon(duck.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), "column names diverge"
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    assert got.equals(want), "values diverge"
