"""Second measured point on the corpus-size curve (VERDICT r04 #7).

All headline bench numbers are sf0.1 / 20k pages; this script measures
index_build throughput and flagship serving latency at 20k AND 100k pages
in temporally-alternating pairs (the shared-VM tenancy protocol of
scripts/scaling.py), so the 100x extrapolation argument has two measured
corpus scales instead of one.

Usage: python scripts/scalepoint.py [reps] [cpus]
Writes benchres/scalepoint.json; summarize the result as a table row in
BENCH.md (the script prints one).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# override the pair via SCALEPOINT_SIZES="100000,200000" to extend the
# corpus-size curve (each run keeps the alternating-pair protocol)
SIZES = [
    int(x) for x in os.environ.get(
        "SCALEPOINT_SIZES", "20000,100000").split(",")
]
# shard count per size. Default: fixed 4 shards (the historical curve,
# where serving latency GROWS with corpus because per-shard match counts
# do). SCALEPOINT_SHARDS="4,20" holds pages-per-shard constant instead —
# the reference's actual deployment posture (15 shards per mount,
# query/src/QueryManager.cpp) — measuring whether per-query latency stays
# bounded when shards scale with the corpus.
SHARDS = [
    int(x) for x in os.environ.get(
        "SCALEPOINT_SHARDS", ",".join("4" for _ in SIZES)).split(",")
]
assert len(SHARDS) == len(SIZES), "SCALEPOINT_SHARDS must align with SIZES"
QUERIES = ["search engine", "title:engine", "spark shuffle partition",
           "granite OR marble", "NOT quartz"]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from mithril_spark.engine import SearchEngine
    from mithril_spark.fixtures import generate_pages_df
    from mithril_spark.indexer import build_index
    from mithril_spark.session import get_spark

    spark = get_spark(cores=cpus, app_name="mithril-scalepoint")
    spark.sparkContext.setLogLevel("ERROR")

    corpora = {}
    for n in SIZES:
        path = f"/tmp/mithril_scalepoint_corpus_{n}"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            generate_pages_df(spark, n, seed=42).write.mode(
                "overwrite").parquet(path)
        # same input-partitioning posture as bench.py (cpus/2 extraction
        # concurrency: memory bandwidth saturates ~16 busy cores)
        corpora[n] = (
            spark.read.parquet(path).repartition(max(8, cpus // 2)).cache()
        )
        corpora[n].count()

    # measurement points are (size, shards) PAIRS keyed jointly: a dict
    # keyed by size alone collapsed duplicate sizes (the natural
    # same-corpus/two-shard-layouts experiment silently measured one
    # layout twice — code-review r5)
    points = list(zip(SIZES, SHARDS))
    keys = [f"{n}x{sh}" for n, sh in points]
    runs: dict[str, list[dict]] = {k: [] for k in keys}
    for rep in range(reps):
        for (n, sh), key in zip(points, keys):
            idx = f"/tmp/mithril_scalepoint_idx_{key}"
            shutil.rmtree(idx, ignore_errors=True)
            t0 = time.time()
            build_index(corpora[n], idx, num_shards=sh, force=True)
            build_s = time.time() - t0
            engine = SearchEngine(spark, idx)
            engine.top_k(QUERIES[0])  # warm
            t0 = time.time()
            for q in QUERIES:
                engine.top_k(q)
            search_s = time.time() - t0
            rec = {
                "rep": rep, "n_pages": n, "num_shards": sh,
                "build_s": round(build_s, 2),
                "docs_per_sec": round(n / build_s, 1),
                "search_s_per_q": round(search_s / len(QUERIES), 3),
            }
            runs[key].append(rec)
            print(rec, flush=True)

    summary = {
        k: {
            "docs_per_sec_best": max(r["docs_per_sec"] for r in runs[k]),
            "search_s_per_q_best": min(r["search_s_per_q"] for r in runs[k]),
        }
        for k in keys
    }
    out = {"runs": runs, "summary": summary,
           "cpus": cpus, "reps": reps,
           "points": [{"n_pages": n, "num_shards": sh} for n, sh in points]}
    # per-pair throughput ratio: how much of the first point's rate
    # survives at the second (fixed-overhead amortization means >1.0 is
    # possible). Only defined for the two-point protocol.
    if len(keys) == 2:
        out[f"pair_throughput_ratio_{keys[1]}_vs_{keys[0]}"] = [
            round(b["docs_per_sec"] / a["docs_per_sec"], 3)
            for a, b in zip(runs[keys[0]], runs[keys[1]])
        ]
    os.makedirs(os.path.join(ROOT, "benchres"), exist_ok=True)
    # default pair keeps its historical filename; curve extensions and
    # proportional-shard runs get their own file next to it
    fname = ("scalepoint.json"
             if SIZES == [20_000, 100_000] and SHARDS == [4, 4]
             else "scalepoint_{}.json".format(
                 "_".join(f"{n}x{s}" for n, s in zip(SIZES, SHARDS))))
    with open(os.path.join(ROOT, "benchres", fname), "w") as f:
        json.dump(out, f, indent=2)
    for (n, sh), k in zip(points, keys):
        s = summary[k]
        print(f"| {n:,} pages / {sh} shards | {s['docs_per_sec_best']:,.0f} | "
              f"{s['search_s_per_q_best']:.3f} |")


if __name__ == "__main__":
    main()
