"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship path: build the mithril-style inverted index
over a deterministic synthetic web-page corpus and answer a BM25 top-k
query with the Spark engine (rank-identical to the pure-Python oracle —
see tests/test_spark_engine.py). ``queries``/``oracle_sql`` expose the
relational / dedup / text-analysis / ANN operator library over the driver
testdata with DuckDB-checkable SQL oracles (mithril_spark/relational.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: index a synthetic pages corpus, run a BM25 top-k query."""
    import os

    from mithril_spark.engine import SearchEngine
    from mithril_spark.fixtures import generate_pages, pages_to_df
    from mithril_spark.indexer import build_index

    # versioned: older rounds' cached dirs have a different stage schema
    index_dir = "/tmp/mithril_entry_index_r3"
    if not os.path.exists(os.path.join(index_dir, "index_meta.json")):
        pages = pages_to_df(spark, generate_pages(120, seed=42))
        build_index(pages, index_dir, num_shards=2, pagerank=True)
    engine = SearchEngine(spark, index_dir)
    results = engine.top_k_with_snippets("search engine")
    return spark.createDataFrame(
        [
            (int(doc_id), int(score), url.decode("utf-8", "replace"),
             b" ".join(title).decode("utf-8", "replace"), snippet)
            for doc_id, score, url, title, snippet in results
        ],
        schema="doc_id long, score long, url string, title string, snippet string",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family (SURVEY.md §2 + pipeline ops)."""
    from mithril_spark.relational import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible ``queries()`` entry.

    Entries registered with ``sql=None`` (stateful streaming, Python media
    decoders) are omitted on purpose: the driver records the weaker
    rows-only check for those, per the contract."""
    from mithril_spark.relational import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items()
            if sql is not None}
