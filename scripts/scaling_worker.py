"""One scaling-run worker: build the index at a given parallelism, print JSON.

Run in a fresh process per measurement so each JVM is cold-started
identically:  python scripts/scaling_worker.py <cpus> <corpus_parquet> <n>
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    corpus = sys.argv[2]
    n_pages = int(sys.argv[3])

    from mithril_spark.indexer import build_index
    from mithril_spark.session import get_spark

    # Shuffle + index output on tmpfs: a real N-vs-4N comparison adds disk
    # bandwidth with every node, but this single box has ONE disk — tmpfs
    # emulates the per-node storage a cluster would have, so the measurement
    # captures the job's scaling rather than one local disk's saturation.
    local_dir = f"/dev/shm/mithril_scaling_local_{cpus}"
    spark = get_spark(cores=cpus, app_name=f"scaling-{cpus}",
                      extra_conf={"spark.local.dir": local_dir})
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(corpus)
    out = f"/dev/shm/mithril_scaling_idx_{cpus}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    res = build_index(pages, out, num_shards=4, force=True)
    build_s = time.time() - t0
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(local_dir, ignore_errors=True)
    print(json.dumps({
        "cpus": cpus,
        "build_s": round(build_s, 2),
        "docs_per_sec": round(n_pages / build_s, 1),
        "phases": {
            p["phase"]: round(p["finished"] - p["started"], 2)
            for p in res["phases"]
        },
    }))


if __name__ == "__main__":
    main()
