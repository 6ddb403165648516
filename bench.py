#!/usr/bin/env python
"""Benchmark harness: headline queries + index-build throughput.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-step sec...}, "sf": <sf>, ...extras}

Env:
  SPARK_GRAFT_SF_DIR  testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)
  BENCH_PAGES         synthetic pages for the index-build step (default 20000)
  BENCH_REPS          interleaved repetitions per step (default 3)

Contention protocol (VERDICT r03 #2): this box is shared-tenant with
documented ~2x throughput swings over minutes, so a single cold pass is
unreadable round-over-round. Every timed step therefore runs BENCH_REPS
times in *interleaved rounds* (the whole suite repeats, so each step's
samples are spread across the bench window, the same temporal-pairing
idea as scripts/scaling.py). The headline `queries` timings are the
per-step MIN across rounds — the contention-free estimate — and the raw
per-round samples ship in `benchres/bench_rounds.json` (the printed line
carries `round_totals` + `contention_spread`; it must stay under the
driver's 2000-char stdout tail or it records as unparseable).

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
    n_reps = int(os.environ.get("BENCH_REPS", "3"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import numpy as np
    from pyspark.sql import functions as F

    from mithril_spark.engine import SearchEngine
    from mithril_spark.fixtures import generate_pages, pages_to_df
    from mithril_spark.indexer import build_index
    from mithril_spark.query.isr import ShardIndex
    from mithril_spark.query.shard import evaluate_query, evaluate_query_scalar
    from mithril_spark.relational import QUERIES

    from mithril_spark.session import get_spark

    spark = get_spark(cores=cpus, app_name="mithril-bench")
    spark.sparkContext.setLogLevel("ERROR")

    extras: dict = {"cpus": cpus, "bench_pages": n_pages, "bench_reps": n_reps}

    # Each step is (name, prepare, run): `prepare` is untimed setup
    # (cache-warm, rmtree); `run` is the timed body. Steps must be
    # idempotent — the whole list executes once per round.
    steps: list[tuple] = []

    headline = [
        "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
        "q6_forecast_revenue", "q_events_sessionize", "q_doc_term_df",
        "q_dedup_minhash_lsh", "q_dedup_simhash", "q_dedup_embedding",
        "q_ann_cosine_topk",
    ]

    def make_query_step(name):
        fn = QUERIES[name][0]

        def run():
            rows = fn(spark, sf_dir).collect()
            extras[f"{name}_rows"] = len(rows)

        return (name, None, run)

    for name in headline:
        steps.append(make_query_step(name))

    # --- index build throughput (the BASELINE.md headline metric) ---
    pages = generate_pages(n_pages, seed=42)
    html_bytes = sum(len(p["html"]) for p in pages)
    # extraction concurrency = cpus/2: this box's memory bandwidth
    # saturates ~16 busy cores (BENCH.md hw probe), and an alternating
    # min-of-3 A/B measured 2614 docs/s at 16 input partitions vs 2002 at
    # 64 — the spare slots absorb the JVM shuffle/write threads instead
    pages_df = pages_to_df(spark, pages).repartition(max(8, cpus // 2)).cache()
    pages_df.count()  # materialize input before any clock starts
    index_dir = "/tmp/mithril_bench_index"

    def build_prepare():
        shutil.rmtree(index_dir, ignore_errors=True)

    def build_run():
        build_index(pages_df, index_dir, num_shards=4, force=True)

    steps.append(("index_build", build_prepare, build_run))

    # --- PageRank over the built index's link graph ---
    def pagerank_run():
        # THE shared graph construction (indexer._stage_pagerank) — the
        # bench must measure the same graph the product computes, not an
        # inline copy that can drift (code-review r5)
        from mithril_spark.indexer import _stage_pagerank

        stage = spark.read.parquet(index_dir + "/stage_raw")
        extras["pagerank_nodes"] = _stage_pagerank(stage).count()

    steps.append(("pagerank", None, pagerank_run))

    # --- query latency + throughput over the built index ---
    search_queries = ["search engine", "title:engine", "spark shuffle partition",
                      "granite OR marble", "NOT quartz"]
    engine_box: dict = {}

    def search_prepare():
        # fresh engine per round (the index was rebuilt); warm doc_map cache
        engine_box["e"] = SearchEngine(spark, index_dir)
        engine_box["e"].top_k(search_queries[0])

    def search_run():
        for q in search_queries:
            engine_box["e"].top_k(q)

    steps.append(("search_topk", search_prepare, search_run))

    # throughput: the batched serving path (top_k_many multiplexes queries
    # over the resident shard images, as the reference coordinator does
    # with concurrent queries) — results identical to sequential top_k
    BATCH_REPS = 4

    def batch_prepare():
        engine_box["e"].top_k_many(search_queries)  # warm

    def batch_run():
        for _ in range(BATCH_REPS):
            engine_box["e"].top_k_many(search_queries)

    steps.append(("search_batch", batch_prepare, batch_run))

    # --- LSM freshness: append-mode incremental merge + serving over the
    # segmented/tombstoned index (the 100-TB maintenance path; the wall
    # time at this scale is fixed-job-overhead-bound, so the hard signals
    # are the appended-bytes asymmetry and the bounded serving delta) ---
    from mithril_spark.indexer import merge_index_delta

    lsm_dir = index_dir + "_lsm"
    # structurally disjoint url space: a new SEED alone still collides with
    # the base corpus (the d{i} path segment only disambiguates within one
    # seed — at defaults one seed-777 url matched the 20k base), silently
    # turning intended new docs into re-crawls (code-review r5)
    lsm_new = [
        dict(p, url=p["url"].replace("://", "://lsm-new.", 1))
        for p in generate_pages(300, seed=777)
    ]
    lsm_recrawl = [
        dict(pages[j], html=pages[(j * 7 + 13) % n_pages]["html"])
        for j in range(0, n_pages, max(1, n_pages // 50))
    ]
    lsm_delta_df = pages_to_df(spark, lsm_new + lsm_recrawl).cache()
    lsm_delta_df.count()

    def lsm_prepare():
        shutil.rmtree(lsm_dir, ignore_errors=True)
        shutil.copytree(index_dir, lsm_dir)

    def lsm_run():
        res = merge_index_delta(lsm_dir, lsm_delta_df)
        ph = {p["phase"]: p for p in res["phases"]}
        extras["lsm_mode"] = res["mode"]
        extras["lsm_replaced_docs"] = ph["tombstones"]["replaced_docs"]
        extras["lsm_postings_appended_bytes"] = ph["postings"]["appended_bytes"]
        extras["lsm_postings_bytes_before"] = ph["postings"]["table_bytes_before"]

    steps.append(("merge_append", lsm_prepare, lsm_run))

    def lsm_search_prepare():
        engine_box["lsm"] = SearchEngine(spark, lsm_dir)
        engine_box["lsm"].top_k(search_queries[0])

    def lsm_search_run():
        for q in search_queries:
            engine_box["lsm"].top_k(q)

    steps.append(("search_lsm", lsm_search_prepare, lsm_search_run))

    # --- block-max WAND: pure-BM25 top-k with pruning counters ---
    # (VERDICT r02 #9: blocks-skipped evidence. The flagship top_k ranker
    # cannot skip blocks — its uint32 score wrap makes any upper bound
    # unsound — so the skipping lives on the BM25 disjunctive path.)
    def wand_prepare():
        engine_box["e"].bm25_topk("search engine", k=10)  # warm

    def wand_run():
        # rare + common mix: the shape WAND prunes (the rare term's high
        # idf dominates, so dense-term blocks between rare postings skip)
        _res, wstats = engine_box["e"].bm25_topk(
            "thermite neurotron search engine index", k=10, return_stats=True
        )
        extras["wand_blocks_total"] = wstats.get("blocks_total", 0)
        extras["wand_blocks_skipped"] = wstats.get("blocks_skipped", 0)
        extras["wand_docs_scored"] = wstats.get("docs_scored", 0)

    steps.append(("bm25_wand", wand_prepare, wand_run))

    # --- zipfian-corpus WAND: skew where block skipping is visible e2e ---
    # (VERDICT r03 #6. The flat fixture corpus has no df spread — rare-term
    # posting gaps stay below the 128-doc block size, so nothing skips.)
    from mithril_spark.fixtures import generate_zipf_pages, zipf_term

    # rare (df ~n/800, posting gaps ~800 docs >> the 128-posting block) +
    # mid (df n/3, 42 blocks): once the heap holds k rare-term docs the
    # pivot rides the rare postings and the mid cursor skips undecoded
    zipf_query = f"{zipf_term(799)} {zipf_term(2)}"

    def wand_zipf_prepare():
        if "zipf_engine" not in engine_box:
            zdir = "/tmp/mithril_bench_index_zipf"
            shutil.rmtree(zdir, ignore_errors=True)
            zdf = pages_to_df(spark, generate_zipf_pages(16000, seed=7))
            build_index(zdf, zdir, num_shards=2, force=True)
            engine_box["zipf_engine"] = SearchEngine(spark, zdir)
        engine_box["zipf_engine"].bm25_topk(zipf_query, k=5)  # warm

    def wand_zipf_run():
        _res, zstats = engine_box["zipf_engine"].bm25_topk(
            zipf_query, k=5, return_stats=True
        )
        extras["wand_zipf_blocks_total"] = zstats.get("blocks_total", 0)
        extras["wand_zipf_blocks_skipped"] = zstats.get("blocks_skipped", 0)
        extras["wand_zipf_docs_scored"] = zstats.get("docs_scored", 0)

    steps.append(("bm25_wand_zipf", wand_zipf_prepare, wand_zipf_run))

    # --- worker-image churn at many shards (VERDICT r04 #4): a 16-shard
    # index served via worker-resident images (driver tier disabled);
    # after warmup, the per-query image-load delta should be ~0 — the
    # byte-bounded LRU keeps every hot shard image resident per worker ---
    def churn_prepare():
        if "churn_engine" not in engine_box:
            cdir = "/tmp/mithril_bench_index_churn"
            shutil.rmtree(cdir, ignore_errors=True)
            cdf = pages_to_df(spark, generate_pages(4000, seed=99))
            build_index(cdf, cdir, num_shards=16, force=True)
            engine_box["churn_engine"] = SearchEngine(
                spark, cdir, driver_serve_bytes=0)
        e = engine_box["churn_engine"]
        # warm to STEADY STATE: with W workers and S shards there are W*S
        # (worker, shard) first-hit loads before the pool is fully
        # resident — loop until a full query sweep stops loading
        prev = e.image_load_stats()["loads"]
        for _ in range(12):
            for q in search_queries:
                e.top_k(q)
            cur = e.image_load_stats()["loads"]
            if cur - prev <= 1:
                break
            prev = cur
        engine_box["churn0"] = e.image_load_stats()["loads"]

    def churn_run():
        e = engine_box["churn_engine"]
        reps = 3
        for _ in range(reps):
            for q in search_queries:
                e.top_k(q)
        st = e.image_load_stats()
        extras["image_loads_per_query"] = round(
            (st["loads"] - engine_box["churn0"])
            / (reps * len(search_queries)), 3)
        extras["image_workers"] = st["workers"]
        extras["image_resident"] = st["resident_images"]

    steps.append(("search_16shard_churn", churn_prepare, churn_run))

    # --- match enumeration: vectorized set-algebra walk vs scalar ISR ---
    # (VERDICT r02 #1 deliverable: a >=100k-match query, speedup reported.)
    # Deterministic synthetic shard; modular posting patterns, no RNG.
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

    def enum_run():
        n_matches = sum(len(evaluate_query(q, shard)) for q in enum_queries)
        extras["match_enum_matches"] = int(n_matches)

    steps.append(("match_enum_vec", None, enum_run))

    # --- quote enumeration: vectorized positional check vs scalar cursor ---
    # (VERDICT r03 #3 deliverable: >=10x on a quoted query with a 100k+
    # candidate AND-set.) alpha∩beta = 133k docs; adjacency planted in the
    # even ones (~66k matches). The extra beta posting past alpha's last doc
    # makes the exhaustion pump end cleanly (the abort-to-empty quirk would
    # otherwise empty BOTH paths and benchmark nothing).
    inter = all_d[(all_d % 5 != 0) & (all_d % 3 == 0)]
    base_p = (inter % 7).astype(np.int64)
    alpha_plists = np.stack([base_p, base_p + 2], axis=1).tolist()
    beta_off = np.where(inter % 2 == 0, base_p + 1, base_p + 5)
    beta_plists = beta_off[:, None].tolist()
    shard.positions["alpha"] = (inter.tolist(), [0] * len(inter), alpha_plists)
    shard.positions["beta"] = (inter.tolist(), [0] * len(inter), beta_plists)
    bdocs, bfreqs = shard.postings["beta"]
    shard.postings["beta"] = (
        np.append(bdocs, n_docs + 1), np.append(bfreqs, 1)
    )
    quote_q = '"alpha beta"'

    def quote_enum_run():
        extras["quote_enum_matches"] = int(len(evaluate_query(quote_q, shard)))

    steps.append(("quote_enum_vec", None, quote_enum_run))

    # ---- interleaved rounds: min-of-N per step ----
    runs: list[dict[str, float]] = []
    # warm the JVM/readers once so round-1 timings measure the plan, not startup
    QUERIES["q6_forecast_revenue"][0](spark, sf_dir).collect()
    for _rep in range(n_reps):
        round_t: dict[str, float] = {}
        for name, prepare, run in steps:
            if prepare is not None:
                prepare()
            t0 = time.time()
            run()
            round_t[name] = round(time.time() - t0, 3)
        runs.append(round_t)

    timings = {name: min(r[name] for r in runs) for name, _, _ in steps}

    # scalar match-enum twins: once, outside the rounds (they only feed the
    # speedup extras — the headline timings are the vectorized walks)
    t0 = time.time()
    n_scalar = sum(len(evaluate_query_scalar(q, shard)) for q in enum_queries)
    scalar_s = time.time() - t0
    assert extras["match_enum_matches"] == n_scalar
    extras["match_enum_scalar_s"] = round(scalar_s, 3)
    vec_s = timings["match_enum_vec"]
    extras["match_enum_speedup"] = round(scalar_s / vec_s, 1) if vec_s > 0 else None

    t0 = time.time()
    n_quote_scalar = len(evaluate_query_scalar(quote_q, shard))
    qscalar_s = time.time() - t0
    assert extras["quote_enum_matches"] == n_quote_scalar
    extras["quote_enum_scalar_s"] = round(qscalar_s, 3)
    qvec_s = timings["quote_enum_vec"]
    extras["quote_enum_speedup"] = (
        round(qscalar_s / qvec_s, 1) if qvec_s > 0 else None
    )

    # --- one-shot large-corpus build point (amortization evidence) ---
    # Build throughput RISES with corpus size as fixed per-job overheads
    # amortize (BENCH.md corpus-size curve: 20k -> 100k pages took the
    # measured rate from ~1.6k to ~4.4k docs/s); this puts a second
    # corpus scale in the driver artifact itself. Deliberately single-
    # shot and OUTSIDE the interleaved rounds: the min-of-3 20k headline
    # stays the contention-robust number, this is the scale curve's
    # second point (disable with BENCH_LARGE_PAGES=0).
    n_large = int(os.environ.get("BENCH_LARGE_PAGES", "100000"))
    if n_large > 0:
        from mithril_spark.fixtures import generate_pages_df
        ldir = "/tmp/mithril_bench_index_large"
        ldf = generate_pages_df(spark, n_large, seed=42).repartition(
            max(8, cpus // 2)).cache()
        ldf.count()  # materialize input before the clock starts
        shutil.rmtree(ldir, ignore_errors=True)
        t0 = time.time()
        build_index(ldf, ldir, num_shards=4, force=True)
        large_s = time.time() - t0
        extras["index_build_large_pages"] = n_large
        extras["index_build_large_docs_per_sec"] = round(n_large / large_s, 1)
        ldf.unpersist()
        shutil.rmtree(ldir, ignore_errors=True)

    build_s = timings["index_build"]
    extras["index_docs_per_sec"] = round(n_pages / build_s, 1)
    extras["index_mb_per_sec"] = round(html_bytes / 1e6 / build_s, 2)
    extras["search_latency_s"] = round(
        timings["search_topk"] / len(search_queries), 3)
    extras["search_lsm_latency_s"] = round(
        timings["search_lsm"] / len(search_queries), 3)
    extras["search_qps"] = round(
        BATCH_REPS * len(search_queries) / timings["search_batch"], 2)
    # contention visibility: total spread inline; the raw per-round
    # samples and per-entry row counts go to a side file — the driver
    # records only the tail of stdout, so the final JSON line must stay
    # well under 2000 chars or it arrives truncated (BENCH_r04.json had
    # parsed:null for exactly this reason).
    round_totals = [round(sum(r.values()), 3) for r in runs]
    extras["round_totals"] = round_totals
    extras["contention_spread"] = (
        round(max(round_totals) / min(round_totals), 2) if round_totals else None
    )

    side = {"queries_runs": runs}
    for k in [k for k in extras if k.endswith("_rows")]:
        side[k] = extras.pop(k)
    side_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchres",
        "bench_rounds.json")
    try:
        os.makedirs(os.path.dirname(side_path), exist_ok=True)
        with open(side_path, "w") as f:
            json.dump(side, f)
        extras["rounds_file"] = "benchres/bench_rounds.json"
    except OSError:
        pass  # read-only checkout: the headline line is self-sufficient

    total = round(sum(timings.values()), 3)
    line = json.dumps({
        "metric": "mithril_spark_bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        **extras,
    })
    # hard guard: never exceed the driver's tail window
    if len(line) > 1900:
        slim = {k: v for k, v in extras.items()
                if k not in ("round_totals",)}
        line = json.dumps({
            "metric": "mithril_spark_bench_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            **slim,
        })
    print(line)


if __name__ == "__main__":
    main()
