"""A/B: serving tier x shard count at a fixed corpus size (dev tool).

The resident tier evaluates shards serially in the driver (a measured
thread-pool variant was 0.4-0.7x — GIL-bound); the distributed tiers rank
shards in parallel worker PROCESSES. This script measures where the
crossover sits and whether shard counts that grow with the corpus keep
per-query latency bounded on the distributed path.

Usage: python scripts/ab_serving_tiers.py [n_pages] [reps] [shard_counts]
e.g.   python scripts/ab_serving_tiers.py 100000 3 4,20
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

QUERIES = ["search engine", "title:engine", "spark shuffle partition",
           "granite OR marble", "NOT quartz"]


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    shard_counts = [int(x) for x in (
        sys.argv[3] if len(sys.argv) > 3 else "4,20").split(",")]

    from mithril_spark.engine import SearchEngine
    from mithril_spark.fixtures import generate_pages_df
    from mithril_spark.indexer import build_index
    from mithril_spark.session import get_spark

    spark = get_spark(cores=32, app_name="mithril-ab-tiers")
    spark.sparkContext.setLogLevel("ERROR")

    engines: dict[tuple, SearchEngine] = {}
    for ns in shard_counts:
        idx = f"/tmp/mithril_ab_idx_{n_pages}_{ns}"
        if not os.path.exists(os.path.join(idx, "index_meta.json")):
            shutil.rmtree(idx, ignore_errors=True)
            df = generate_pages_df(
                spark, n_pages, seed=42).repartition(16).cache()
            df.count()
            build_index(df, idx, num_shards=ns, force=True)
        engines[(ns, "resident")] = SearchEngine(spark, idx)
        engines[(ns, "distributed")] = SearchEngine(
            spark, idx, driver_serve_bytes=0)
        # cogroup: blocks never transit the driver (ONE job per query,
        # payload shuffled to the shard images executor-side)
        engines[(ns, "cogroup")] = SearchEngine(
            spark, idx, driver_serve_bytes=0, max_payload_rows=0)

    for (ns, tier), e in engines.items():
        if tier != "resident":
            # warm to STEADY STATE: with W workers and S shards there are
            # W*S (worker, shard) first-hit image loads (each paying the
            # doc-only ranking precompute); loop until a full sweep stops
            # loading (same protocol as bench.py's churn step)
            prev = e.image_load_stats()["loads"]
            for _ in range(40):
                for q in QUERIES:
                    e.top_k(q)
                cur = e.image_load_stats()["loads"]
                if cur - prev <= 1:
                    break
                prev = cur
        else:
            e.top_k(QUERIES[0])  # warm driver images

    # identity only WITHIN a shard count: per-shard BM25 stats (and global
    # docids) legitimately differ across shard layouts, reference semantics
    base: dict[int, list] = {}
    times: dict[tuple, list[float]] = {k: [] for k in engines}
    for _ in range(reps):
        for key, e in engines.items():  # alternating (tenancy protocol)
            t0 = time.time()
            res = [e.top_k(q) for q in QUERIES]
            times[key].append((time.time() - t0) / len(QUERIES))
            if key[0] not in base:
                base[key[0]] = res
            else:
                assert res == base[key[0]], f"rank mismatch on {key}"
    # batched serving (top_k_many: N queries in the same 2 jobs) — the
    # distributed tier's throughput story; results equal sequential
    batch: dict[tuple, list[float]] = {k: [] for k in engines}
    for _ in range(reps):
        for key, e in engines.items():
            t0 = time.time()
            res = e.top_k_many(QUERIES)
            batch[key].append((time.time() - t0) / len(QUERIES))
            assert res == base[key[0]], f"batch mismatch on {key}"
    out = {}
    for key, ts in times.items():
        ts = [round(t, 4) for t in ts]
        bs = [round(t, 4) for t in batch[key]]
        label = f"{key[0]}sh/{key[1]}"
        out[label] = {"min_s_per_q": min(ts), "raw": ts,
                      "batch_min_s_per_q": min(bs), "batch_raw": bs}
        print(f"{label:18s} s/query min={min(ts)}  batch={min(bs)}  raw={ts}")
    print(json.dumps({"n_pages": n_pages, "tiers": out}))


if __name__ == "__main__":
    main()
