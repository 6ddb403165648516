#!/usr/bin/env python
"""Dedup scale-point sweep: every dedup family at sf0.01 vs sf0.1.

The two driver-provided scale points differ 10x in the documents table
(500 -> 5,000 docs) and 4x in embeddings (500 -> 2,000 vectors). A
quadratic candidate stage would scale wall time ~100x (docs) / ~16x
(embeddings); the banded/bucketed designs claim near-linear candidate
growth, so the time ratio is the evidence axis.

Protocol (CLAUDE.md box facts): shared-tenant contention swings 2x over
minutes, so the two scale points run temporally paired and alternating
(A B A B ...), and the reported value is the per-pair minimum-sum median.
Run with the box otherwise idle.

Usage: python scripts/dedup_scaling.py [reps=3]
Appends one JSON line per query to benchres/dedup_scaling.json and prints
a markdown table for BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

QUERIES = [
    "q_dedup_exact",
    "q_dedup_jaccard",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_dedup_embedding",
    "q_ann_cosine_topk",
]
SF_A = "/root/testdata/sf0.01"
SF_B = "/root/testdata/sf0.1"


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from mithril_spark.relational import QUERIES as Q
    from mithril_spark.session import get_spark

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      app_name="dedup-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for name in QUERIES:
        fn = Q[name][0]
        # warm both scale points once (JVM/codegen/parquet footers)
        rows_a = len(fn(spark, SF_A).collect())
        rows_b = len(fn(spark, SF_B).collect())
        pairs = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, SF_A).collect()
            ta = time.time() - t0
            t0 = time.time()
            fn(spark, SF_B).collect()
            tb = time.time() - t0
            pairs.append((ta, tb))
        # MEDIAN pair by pair-sum (the documented protocol): robust to a
        # single low-contention outlier, which the old min-sum pick
        # promoted to the headline (code-review r5)
        ta, tb = sorted(pairs, key=lambda p: p[0] + p[1])[len(pairs) // 2]
        ratio = round(tb / ta, 2) if ta > 0 else None
        results.append({
            "query": name,
            "sf0.01_s": round(ta, 3), "sf0.1_s": round(tb, 3),
            "time_ratio": ratio,
            "rows_small": rows_a, "rows_large": rows_b,
            "pairs": [[round(x, 3), round(y, 3)] for x, y in pairs],
        })
        print(f"{name}: {ta:.2f}s -> {tb:.2f}s (x{ratio})",
              file=sys.stderr)

    # anchor to the repo like the sibling scripts — a run from outside
    # the root must not scatter the JSON into cwd
    os.makedirs(os.path.join(ROOT, "benchres"), exist_ok=True)
    with open(os.path.join(ROOT, "benchres", "dedup_scaling.json"), "a") as f:
        f.write(json.dumps({"ts_monotonic": time.monotonic(),
                            "reps": reps, "results": results}) + "\n")

    print("| query | sf0.01 (500 docs) | sf0.1 (5k docs) | time ratio |")
    print("|---|---|---|---|")
    for r in results:
        print(f"| {r['query']} | {r['sf0.01_s']}s | {r['sf0.1_s']}s "
              f"| {r['time_ratio']}x |")


if __name__ == "__main__":
    main()
