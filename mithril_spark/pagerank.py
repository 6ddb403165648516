"""PageRank power iteration + score standardization (Spark + numpy twin).

Reference semantics (/root/reference/ranking/src/PageRank.cpp):
* graph build  :236-243 — one node per distinct url (documents AND link
  targets); one edge per forwardLink OCCURRENCE (duplicates kept, so a page
  linking twice contributes twice and has outdegree 2);
* iteration    :123-148 — r0 = 1/N everywhere; newR = d * (M r) + (1-d)/N
  with M[target, source] = 1/outdeg(source) (dangling mass is lost, no
  redistribution); L1 tolerance 1/N; max 100 iterations; quirk preserved:
  when |newR - r| < tol the loop breaks WITHOUT adopting newR;
* config       ranking/config/pagerank.conf — max_iterations 100, d 0.85;
* standardize  :150-170 — log10(r + 1e-30), min-max over ALL nodes,
  pow(., 0.25) to spread low values.

Arithmetic deviation (documented): the reference iterates in float32,
whose sums depend on accumulation order — unacceptable for a distributed
engine that must be bit-deterministic across partitionings (repo invariant).
This implementation iterates in int64 fixed point (SCALE = 10^12):
contribution = r // outdeg, newR = (17 * sum) // 20 + (3*SCALE)//(20*N) —
exact integer arithmetic, order-independent, so the Spark job and the
numpy twin (the oracle) agree bit-for-bit on any cluster size. The
standardization runs in float64 on the fixed-point values (elementwise,
deterministic).
"""

from __future__ import annotations

import numpy as np

SCALE = 10**12
D_NUM, D_DEN = 17, 20          # decay 0.85 as an exact rational
TELEPORT_NUM = D_DEN - D_NUM   # (1 - d) numerator -> 3/20
MAX_ITERATIONS = 100
LOG_EPSILON = 1e-30


def pagerank_fixed_numpy(
    edges: list[tuple[bytes, bytes]],
    nodes: list[bytes],
    max_iterations: int = MAX_ITERATIONS,
) -> dict[bytes, int]:
    """Sequential fixed-point power iteration — the oracle twin.

    ``nodes`` must contain every url appearing in ``edges`` (plus isolated
    documents); returns url -> fixed-point rank.
    """
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    if n == 0:
        return {}
    src = np.fromiter((idx[s] for s, _ in edges), np.int64, len(edges))
    dst = np.fromiter((idx[t] for _, t in edges), np.int64, len(edges))
    outdeg = np.bincount(src, minlength=n).astype(np.int64)
    tol = SCALE // n
    tel = (TELEPORT_NUM * SCALE) // (D_DEN * n)
    r = np.full(n, SCALE // n, dtype=np.int64)
    for _ in range(max_iterations):
        if len(src):
            contrib = r[src] // outdeg[src]
            s = np.zeros(n, dtype=np.int64)
            np.add.at(s, dst, contrib)
        else:
            s = np.zeros(n, dtype=np.int64)
        new_r = (D_NUM * s) // D_DEN + tel
        if np.abs(new_r - r).sum() < tol:
            break  # reference quirk: converged newR is discarded
        r = new_r
    return {u: int(r[idx[u]]) for u in nodes}


def standardize_numpy(ranks_fp: np.ndarray) -> np.ndarray:
    """log10 / min-max / pow(0.25) over ALL nodes (PageRank.cpp:150-170).

    lo/hi derive from the exact integer min/max (log10 is monotone) — the
    same expressions spark_pagerank uses, so both paths are bit-identical.
    """
    ranks_fp = np.asarray(ranks_fp, dtype=np.int64)
    with np.errstate(invalid="ignore", divide="ignore"):
        lo = np.log10(np.float64(int(ranks_fp.min())) / SCALE + LOG_EPSILON)
        hi = np.log10(np.float64(int(ranks_fp.max())) / SCALE + LOG_EPSILON)
        temp = np.log10(ranks_fp.astype(np.float64) / SCALE + LOG_EPSILON)
        return np.power((temp - lo) / (hi - lo), 0.25)


def spark_pagerank(
    links,
    nodes,
    max_iterations: int = MAX_ITERATIONS,
    local_threshold: int = 2_000_000,
):
    """Fixed-point PageRank, size-adaptive like a broadcast join.

    ``links``: DataFrame(src binary, dst binary), one row per link
    occurrence. ``nodes``: DataFrame(node binary), every url in the graph
    (documents + link targets). Returns DataFrame(node binary, rank_fp
    long, pagerank double), bit-identical on either path (the arithmetic
    is exact int64, see module docstring):

    * graphs at or under ``local_threshold`` edges run the numpy twin on
      the driver — PageRank needs ~log(N)/log(1/d) global iterations, and
      at small scale the per-iteration Spark job floor dominates; the
      reference itself runs PageRank in one process
      (ranking/src/PageRank.cpp);
    * larger graphs run distributed: per iteration, contributions =
      edges x ranks join on src (edges cached pre-partitioned on src),
      groupBy(dst).sum (exact int64, order-free), a left join back onto
      nodes for teleport-only nodes, and an EAGER localCheckpoint so each
      iteration materializes once — no O(k^2) lineage recompute — plus
      one tiny L1-diff agg (the reference checks every iteration too).
    """
    from pyspark.sql import functions as F

    spark = links.sparkSession
    # caches are UNPERSISTED before returning: Spark's CacheManager matches
    # cached plans by canonicalized relation (path + schema, NOT the file
    # list), so a leaked cache of nodes/edges would be served VERBATIM to
    # a later pagerank run over the SAME path after an in-place rewrite
    # (compact_index) — stale nodes with fresh edges crashed exactly that
    # way (round-5 regression, tests/test_append_merge.py).
    nodes = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct().cache()
    edges = None
    try:
        n = nodes.count()
        if n == 0:
            return spark.createDataFrame(
                [], "node binary, rank_fp long, pagerank double"
            )
        n_edges = links.count()
        # the local path collects BOTH relations to the driver, so a
        # sparse graph (few links over many pages) must not slip through
        # an edges-only gate and pull an O(corpus) node list into driver
        # memory (code-review r5)
        if n_edges <= local_threshold and n <= local_threshold:
            edge_rows = [
                (bytes(r["src"]), bytes(r["dst"]))
                for r in links.select("src", "dst").collect()
            ]
            node_list = sorted(bytes(r["node"]) for r in nodes.collect())
            ranks_by_url = pagerank_fixed_numpy(edge_rows, node_list,
                                                max_iterations)
            fp = np.array([ranks_by_url[u] for u in node_list], dtype=np.int64)
            std = standardize_numpy(fp)
            return spark.createDataFrame(
                [(u, int(f), float(s))
                 for u, f, s in zip(node_list, fp.tolist(), std.tolist())],
                "node binary, rank_fp long, pagerank double",
            )

        outdeg = links.groupBy("src").agg(F.count("*").alias("outdeg"))
        edges = links.join(outdeg, "src").repartition("src").cache()
        edges.count()

        tol = SCALE // n
        tel = (TELEPORT_NUM * SCALE) // (D_DEN * n)
        init = SCALE // n
        ranks = nodes.select("node", F.lit(init).cast("long").alias("r"))
        ranks = ranks.localCheckpoint()

        for _it in range(max_iterations):
            contrib = edges.join(
                ranks, edges["src"] == ranks["node"]
            ).select(
                F.col("dst"),
                F.expr("r div outdeg").alias("c"),  # int64 floor div, exact
            )
            sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
            new_ranks = (
                nodes.join(sums, nodes["node"] == sums["dst"], "left")
                .select(
                    "node",
                    (
                        F.expr(f"({D_NUM} * coalesce(s, CAST(0 AS BIGINT))) div {D_DEN}")
                        + F.lit(tel)
                    ).cast("long").alias("r"),
                )
                .localCheckpoint()  # eager: one materialization per iteration
            )
            diff = (
                new_ranks.alias("a")
                .join(ranks.alias("b"), "node")
                .agg(F.sum(F.abs(F.col("a.r") - F.col("b.r"))).alias("d"))
                .collect()[0]["d"]
            )
            old_ranks = ranks
            if diff is not None and int(diff) < tol:
                ranks = old_ranks
                break  # reference quirk: keep the PREVIOUS ranks
            ranks = new_ranks

        # Standardization: log10 is monotonic, so the global lo/hi come from
        # the EXACT integer min/max of r (one tiny agg); every float op then
        # runs through numpy (mapInArrow), not JVM expressions — JVM log10/pow
        # can differ from libm by an ulp, which would break bit-identity with
        # the numpy twin the oracle uses.
        stats = ranks.agg(F.min("r").alias("rmin"), F.max("r").alias("rmax")).collect()[0]
        lo = float(np.log10(np.float64(int(stats["rmin"])) / SCALE + LOG_EPSILON))
        hi = float(np.log10(np.float64(int(stats["rmax"])) / SCALE + LOG_EPSILON))

        def _standardize(batches):
            import pyarrow as pa

            for batch in batches:
                r = batch.column("r").to_numpy()
                with np.errstate(invalid="ignore", divide="ignore"):
                    temp = np.log10(r.astype(np.float64) / SCALE + LOG_EPSILON)
                    p = np.power((temp - lo) / (hi - lo), 0.25)
                yield pa.RecordBatch.from_arrays(
                    [batch.column("node"), pa.array(r, pa.int64()),
                     pa.array(p, pa.float64())],
                    names=["node", "rank_fp", "pagerank"],
                )

        return ranks.mapInArrow(
            _standardize, schema="node binary, rank_fp long, pagerank double"
        )
    finally:
        # unpersist on EVERY exit path (incl. a mid-iteration failure):
        # ranks is localCheckpoint-materialized and the returned plan
        # references only it, so dropping the working caches here is
        # always safe — and a LEAKED cache is the stale-serve hazard the
        # note above describes.
        if edges is not None:
            edges.unpersist()
        nodes.unpersist()
