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
    for q in args.queries:
        t0 = time.time()
        results = engine.top_k(q)
        print(json.dumps({
            "query": q,
            "ms": round((time.time() - t0) * 1000, 1),
            "results": [
                {"doc_id": d, "score": s, "url": u.decode("utf-8", "replace"),
                 "title": b" ".join(t).decode("utf-8", "replace")}
                for d, s, u, t in results[:10]
            ],
        }))


if __name__ == "__main__":
    sys.exit(main())
