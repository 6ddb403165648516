#!/usr/bin/env python
"""Benchmark harness: headline queries + index-build throughput.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-step sec...}, "sf": <sf>, ...extras}

Env:
  SPARK_GRAFT_SF_DIR  testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)
  BENCH_PAGES         synthetic pages for the index-build step (default 20000)

The index-build step is the BASELINE.md headline (reference: ~2,500 docs/s
on a single all-core VM, CHANGELOG.md:122); run scripts/scaling.py for the
N-vs-4N scaling-efficiency evidence.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("BENCH_PAGES", "20000"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from mithril_spark.engine import SearchEngine
    from mithril_spark.fixtures import generate_pages, pages_to_df
    from mithril_spark.indexer import build_index
    from mithril_spark.relational import QUERIES
    from mithril_spark.session import get_spark

    spark = get_spark(cores=cpus, app_name="mithril-bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extras: dict = {"cpus": cpus, "bench_pages": n_pages}

    headline = [
        "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
        "q6_forecast_revenue", "q_events_sessionize", "q_doc_term_df",
        "q_dedup_minhash_lsh", "q_dedup_simhash", "q_dedup_embedding",
        "q_ann_cosine_topk",
    ]
    # warm the JVM/readers once so query timings measure the plan, not startup
    QUERIES["q6_forecast_revenue"][0](spark, sf_dir).collect()

    for name in headline:
        fn = QUERIES[name][0]
        t0 = time.time()
        rows = fn(spark, sf_dir).collect()
        timings[name] = round(time.time() - t0, 3)
        extras[f"{name}_rows"] = len(rows)

    # --- index build throughput (the BASELINE.md headline metric) ---
    pages = generate_pages(n_pages, seed=42)
    html_bytes = sum(len(p["html"]) for p in pages)
    pages_df = pages_to_df(spark, pages).repartition(cpus * 2).cache()
    pages_df.count()  # materialize input before the clock starts
    index_dir = "/tmp/mithril_bench_index"
    shutil.rmtree(index_dir, ignore_errors=True)
    t0 = time.time()
    build_index(pages_df, index_dir, num_shards=4, force=True)
    build_s = time.time() - t0
    timings["index_build"] = round(build_s, 3)
    extras["index_docs_per_sec"] = round(n_pages / build_s, 1)
    extras["index_mb_per_sec"] = round(html_bytes / 1e6 / build_s, 2)

    # --- PageRank over the built index's link graph ---
    from pyspark.sql import functions as F

    from mithril_spark.pagerank import spark_pagerank

    stage = spark.read.parquet(index_dir + "/stage_raw")
    link_edges = stage.select(F.col("url").alias("src"),
                              F.explode("links").alias("dst"))
    graph_nodes = stage.select(F.col("url").alias("node")).unionByName(
        link_edges.select(F.col("dst").alias("node")))
    t0 = time.time()
    pr_rows = spark_pagerank(link_edges, graph_nodes).count()
    timings["pagerank"] = round(time.time() - t0, 3)
    extras["pagerank_nodes"] = pr_rows

    # --- query latency + throughput over the built index ---
    engine = SearchEngine(spark, index_dir)
    search_queries = ["search engine", "title:engine", "spark shuffle partition",
                      "granite OR marble", "NOT quartz"]
    engine.top_k(search_queries[0])  # warm doc_map cache
    t0 = time.time()
    for q in search_queries:
        engine.top_k(q)
    timings["search_topk"] = round(time.time() - t0, 3)
    extras["search_latency_s"] = round(timings["search_topk"] / len(search_queries), 3)
    # throughput: the batched serving path (top_k_many multiplexes queries
    # over the resident shard images, as the reference coordinator does
    # with concurrent queries) — results identical to sequential top_k
    engine.top_k_many(search_queries)  # warm
    reps = 4
    t0 = time.time()
    for _ in range(reps):
        engine.top_k_many(search_queries)
    batch_s = time.time() - t0
    timings["search_batch"] = round(batch_s, 3)
    extras["search_qps"] = round(reps * len(search_queries) / batch_s, 2)

    # --- block-max WAND: pure-BM25 top-k with pruning counters ---
    # (VERDICT r02 #9: blocks-skipped evidence. The flagship top_k ranker
    # cannot skip blocks — its uint32 score wrap makes any upper bound
    # unsound — so the skipping lives on the BM25 disjunctive path.)
    engine.bm25_topk("search engine", k=10)  # warm
    t0 = time.time()
    # rare + common mix: the shape WAND prunes (the rare term's high idf
    # dominates, so dense-term blocks between rare postings are skipped)
    _wand_res, wstats = engine.bm25_topk(
        "thermite neurotron search engine index", k=10, return_stats=True
    )
    timings["bm25_wand"] = round(time.time() - t0, 3)
    extras["wand_blocks_total"] = wstats.get("blocks_total", 0)
    extras["wand_blocks_skipped"] = wstats.get("blocks_skipped", 0)
    extras["wand_docs_scored"] = wstats.get("docs_scored", 0)

    # --- match enumeration: vectorized set-algebra walk vs scalar ISR ---
    # (VERDICT r02 #1 deliverable: a >=100k-match query, speedup reported.)
    # Deterministic synthetic shard; modular posting patterns, no RNG.
    import numpy as np

    from mithril_spark.query.isr import ShardIndex
    from mithril_spark.query.shard import evaluate_query, evaluate_query_scalar

    n_docs = 500_000
    all_d = np.arange(n_docs, dtype=np.int64)
    shard = ShardIndex(doc_count=n_docs, base_doc_id=0)
    for term, keep in [
        ("alpha", all_d % 5 != 0),     # 400k docs — head term
        ("beta", all_d % 3 == 0),      # 167k docs
        ("gamma", all_d % 17 == 2),    # 29k docs
    ]:
        docs = all_d[keep]
        shard.postings[term] = (docs, np.ones(len(docs), dtype=np.int64))
    enum_queries = ["alpha beta", "alpha OR beta", "NOT gamma",
                    "alpha AND (beta OR gamma)"]
    t0 = time.time()
    n_matches = sum(len(evaluate_query(q, shard)) for q in enum_queries)
    vec_s = time.time() - t0
    t0 = time.time()
    n_scalar = sum(len(evaluate_query_scalar(q, shard)) for q in enum_queries)
    scalar_s = time.time() - t0
    assert n_matches == n_scalar, (n_matches, n_scalar)
    timings["match_enum_vec"] = round(vec_s, 3)
    extras["match_enum_matches"] = int(n_matches)
    extras["match_enum_scalar_s"] = round(scalar_s, 3)
    extras["match_enum_speedup"] = round(scalar_s / vec_s, 1) if vec_s > 0 else None

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "mithril_spark_bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        **extras,
    }))


if __name__ == "__main__":
    main()
