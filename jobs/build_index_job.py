"""spark-submit entry point: build the inverted index from a pages table.

Cluster usage (Iceberg/production):
  zip -r mithril_spark.zip mithril_spark
  spark-submit --py-files mithril_spark.zip jobs/build_index_job.py \
      --pages <pages table path/identifier> --out <index root> \
      --shards 64 --buckets 256

Local/sandbox usage (synthetic corpus):
  python jobs/build_index_job.py --synthetic 100000 --out /tmp/idx --shards 4
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
    ap.add_argument("--pages", help="parquet path of the pages table")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic pages instead of --pages")
    ap.add_argument("--scale", type=int, default=1, help="synthetic page size factor")
    ap.add_argument("--out", required=True)
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--cores", type=int, default=None,
                    help="local[] cores; omit under spark-submit on a cluster")
    ap.add_argument("--pagerank", action="store_true",
                    help="compute real PageRank into doc_map.pagerank")
    args = ap.parse_args()

    from mithril_spark.session import get_spark

    if args.cores is not None:
        spark = get_spark(cores=args.cores, app_name="mithril-build")
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("mithril-build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from mithril_spark.fixtures import generate_pages_df
    from mithril_spark.indexer import build_index

    if args.synthetic:
        pages = generate_pages_df(spark, args.synthetic, scale=args.scale)
        n = args.synthetic
    elif args.pages:
        pages = spark.read.parquet(args.pages)
        n = pages.count()
    else:
        ap.error("need --pages or --synthetic")
        return

    t0 = time.time()
    res = build_index(pages, args.out, num_shards=args.shards,
                      num_buckets=args.buckets, pagerank=args.pagerank)
    dt = time.time() - t0
    print(json.dumps({"docs": n, "seconds": round(dt, 2),
                      "docs_per_sec": round(n / dt, 1), "meta": res["meta"]}))


if __name__ == "__main__":
    sys.exit(main())
