"""spark-submit entry point: answer queries against a built index.

  spark-submit --py-files mithril_spark.zip jobs/query_job.py \
      --index <index root> --query 'search engine' ['more queries' ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--batch", action="store_true",
                    help="answer all queries in one top_k_many call")
    ap.add_argument("--snippets", action="store_true",
                    help="include a result snippet per hit")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from mithril_spark.session import get_spark

    if args.cores is not None:
        spark = get_spark(cores=args.cores, app_name="mithril-query")
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("mithril-query").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from mithril_spark.engine import SearchEngine

    engine = SearchEngine(spark, args.index)
    if args.batch:
        t0 = time.time()
        batch = engine.top_k_many(args.queries)
        ms = round((time.time() - t0) * 1000, 1)
        for q, results in zip(args.queries, batch):
            print(json.dumps({
                "query": q, "batch_ms_total": ms,
                "results": [
                    {"doc_id": d, "score": s,
                     "url": u.decode("utf-8", "replace"),
                     "title": b" ".join(t).decode("utf-8", "replace")}
                    for d, s, u, t in results[:10]
                ],
            }))
        return
    for q in args.queries:
        t0 = time.time()
        if args.snippets:
            hits = engine.top_k_with_snippets(q)
            rows = [
                {"doc_id": d, "score": s, "url": u.decode("utf-8", "replace"),
                 "title": b" ".join(t).decode("utf-8", "replace"),
                 "snippet": snip}
                for d, s, u, t, snip in hits[:10]
            ]
        else:
            rows = [
                {"doc_id": d, "score": s, "url": u.decode("utf-8", "replace"),
                 "title": b" ".join(t).decode("utf-8", "replace")}
                for d, s, u, t in engine.top_k(q)[:10]
            ]
        print(json.dumps({
            "query": q,
            "ms": round((time.time() - t0) * 1000, 1),
            "results": rows,
        }))


if __name__ == "__main__":
    sys.exit(main())
