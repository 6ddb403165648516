"""Physical-plan guards: pushdown and pruning must actually happen.

These assert what `.explain("formatted")` shows — filters reaching the
parquet scan, bucket-partition pruning on the index tables, and column
pruning — so a refactor can't silently regress the scan shape the 100 TB
story depends on.
"""

import shutil

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q1_pushdown_and_column_pruning(spark):
    from mithril_spark.relational import QUERIES

    df = QUERIES["q1_pricing_summary"][0](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200], plan[:2000]
    # column pruning: the scan must not read the wide comment column
    assert "l_comment" not in plan


def test_events_scan_prunes_columns(spark):
    from mithril_spark.relational import QUERIES

    plan = _plan(QUERIES["q_events_hourly"][0](spark, "/root/testdata/sf0.001"))
    assert "payload" not in plan  # events payload never read


@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    from mithril_spark.fixtures import generate_pages, pages_to_df
    from mithril_spark.indexer import build_index

    path = str(tmp_path_factory.mktemp("plan_idx") / "i")
    shutil.rmtree(path, ignore_errors=True)
    build_index(pages_to_df(spark, generate_pages(80, seed=42)), path,
                num_shards=2)
    return path


def test_engine_scan_prunes_bucket_partitions(spark, small_index):
    """A query's posting scan must hit only its terms' bucket directories
    (the Spark analog of the reference's dictionary seek)."""
    from mithril_spark.engine import SearchEngine
    from mithril_spark.indexer import term_bucket

    engine = SearchEngine(spark, small_index, cache_doc_map=False)
    union = engine._blocks_df({"granite"}, set(), {"granite"})
    plan = _plan(union)
    bucket = term_bucket("granite", engine.meta["num_buckets"])
    # partition pruning on bucket + predicate pushdown on term
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:160]
    assert str(bucket) in seg, seg
    assert "PushedFilters" in plan and "term" in plan.split("PushedFilters")[1][:200]


def test_dedup_candidates_evaluate_sketch_once(spark):
    """Candidate generation must be ONE groupBy-bucket + pairwise explode,
    never a banded self-join: a self-join evaluates the expensive sketch
    subtree (120 conditional sums / md5+16-min minhash / 16 dot products)
    once PER SIDE — Spark's exchange reuse does not deduplicate it. The
    scan counts below are exact for the bucketed shape; the self-join
    shape adds one more scan of the source per query."""
    from mithril_spark import relational as R

    sf = "/root/testdata/sf0.001"
    # simhash: the whole query (sketch + candidates + hamming verify from
    # carried sketch columns) reads documents exactly once
    p = _plan(R._simhash_candidates(R._simhash_sketches(spark, sf)))
    assert p.count("Scan parquet") == 1, p[:3000]
    p = _plan(R.q_dedup_simhash(spark, sf))
    assert p.count("Scan parquet") == 1, p[:3000]
    # embedding (r06 numpy bucket verify): bands carry the quantized
    # vectors into the buckets, so the WHOLE query — signature, candidate
    # buckets AND exact verification — reads embeddings exactly once
    # (the r5 expression plan re-joined the vectors per pair: 3 scans)
    p = _plan(R.q_dedup_embedding(spark, sf))
    assert p.count("Scan parquet") == 1, p[:3000]
    # minhash: shingles are cached; signature agg + ONE Jaccard-verify
    # doc-array side = 2 reads of the cache (the candidate pairs are
    # localCheckpointed once and feed the semi-join + both pair joins
    # from that materialization, r06)
    p = _plan(R.q_dedup_minhash_lsh(spark, sf))
    assert p.count("InMemoryTableScan") == 2, p[:3000]


def test_posting_build_has_no_extra_shuffle(spark, small_index):
    """The doc_ids join in the build must be broadcast at small scale (no
    sort-merge shuffle of the heavy extracted rows)."""
    from pyspark.sql import functions as F

    stage = spark.read.parquet(small_index + "/stage_raw")
    ids = spark.read.parquet(small_index + "/doc_ids")
    joined = stage.join(F.broadcast(ids), "url")
    assert "BroadcastHashJoin" in _plan(joined)
