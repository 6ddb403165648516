"""Every queries() entry must match its DuckDB oracle (the driver's gate).

Runs at BOTH sf0.001 and sf0.01 — the driver grades at sf0.01, and two of
the round-1 ADVICE findings were boundary divergences latent at the
smaller scale only.
"""

import duckdb
import pytest

from mithril_spark.relational import QUERIES

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module", params=SFS, ids=["sf0.001", "sf0.01"])
def sf_duck(request):
    sf = request.param
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from parquet_scan('{sf}/{t}.parquet')"
        )
    yield sf, con
    con.close()


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # The driver's canonicalizer sorts the RAW frame first — unhashable
    # cells (list/array columns) crash it there (round-3 q_media_features
    # failure). Mirror that so the gate catches non-canonicalizable output.
    df.sort_values(list(df.columns))
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_duck, name):
    sf, duck = sf_duck
    fn, sql = QUERIES[name]
    # CLAUDE.md: EVERY entry has an oracle_sql twin (28/28 as of r5) and
    # this test is the gate — a rows-only regression must FAIL here, not
    # silently downgrade to a determinism self-check (code-review r5)
    assert sql is not None, f"{name} regressed to rows-only (no oracle SQL)"
    got = _canon(fn(spark, sf).toPandas())
    want = _canon(duck.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), "column names diverge"
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    assert got.equals(want), "values diverge"
