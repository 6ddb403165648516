"""PageRank: fixed-point iteration, Spark == numpy twin, rank identity.

Reference: ranking/src/PageRank.cpp:123-170 (iteration + standardization),
:236-243 (graph build), pagerank.conf (d=0.85, 100 iters). Arithmetic is
int64 fixed point (see mithril_spark/pagerank.py) so the distributed job
and the sequential twin must agree EXACTLY, not approximately.
"""

import shutil

import numpy as np
import pytest

from mithril_spark.pagerank import (
    SCALE,
    pagerank_fixed_numpy,
    standardize_numpy,
)


def _float_pagerank(edges, nodes, d=0.85, iters=100):
    """Plain float64 reference (no quirks) for approximate cross-check."""
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _t in edges:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nr = np.full(n, (1 - d) / n)
        for s, t in edges:
            nr[idx[t]] += d * r[idx[s]] / out[idx[s]]
        if np.abs(nr - r).sum() < 1.0 / n:
            break
        r = nr
    return {u: r[idx[u]] for u in nodes}


def test_fixed_point_matches_float_reference():
    nodes = [b"a", b"b", b"c", b"d"]
    edges = [(b"a", b"b"), (b"a", b"c"), (b"b", b"c"), (b"c", b"a"),
             (b"d", b"c"), (b"a", b"c")]  # duplicate edge kept
    got = pagerank_fixed_numpy(edges, nodes)
    want = _float_pagerank(edges, nodes)
    for u in nodes:
        assert abs(got[u] / SCALE - want[u]) < 1e-6, u
    # same ranking as the float reference; d (no inlinks) gets teleport only
    assert sorted(nodes, key=got.get) == sorted(nodes, key=want.get)
    assert got[b"d"] == min(got.values())


def test_dangling_mass_is_lost_like_reference():
    """The sink hub has no outlinks: its rank leaks every iteration (no
    dangling redistribution — PageRank.cpp multiplies only over existing
    edges), so total mass ends strictly below 1.0."""
    nodes = [b"hub"] + [f"leaf{i}".encode() for i in range(11)]
    edges = [(u, b"hub") for u in nodes[1:]]
    got = pagerank_fixed_numpy(edges, nodes)
    assert sum(got.values()) < SCALE
    assert got[b"hub"] == max(got.values())


def test_standardize_shape():
    r = np.array([SCALE // 100, SCALE // 10, SCALE // 2], dtype=np.int64)
    s = standardize_numpy(r)
    assert s[0] == 0.0 and s[-1] == 1.0
    assert np.all(np.diff(s) > 0)


@pytest.fixture(scope="module")
def corpus():
    from mithril_spark.fixtures import generate_pages

    return generate_pages(150, seed=42)


def test_spark_pagerank_equals_numpy_twin(spark, corpus):
    from mithril_spark.pagerank import spark_pagerank
    from mithril_spark.text.docproc import process_page

    docs = [d for d in (process_page(p["url"].encode(), p["html"])
                        for p in corpus) if d is not None]
    edges = [(d.url, t) for d in docs for t in d.forward_links]
    node_set = {d.url for d in docs} | {t for _s, t in edges}
    nodes = sorted(node_set)
    want = pagerank_fixed_numpy(edges, nodes)

    links_df = spark.createDataFrame(edges or [(b"x", b"x")],
                                     "src binary, dst binary")
    if not edges:
        pytest.skip("fixture corpus produced no links")
    nodes_df = spark.createDataFrame([(u,) for u in nodes], "node binary")
    std_want = standardize_numpy(np.array([want[u] for u in nodes]))
    # both the driver-local path (default threshold) and the distributed
    # iterative path (threshold 0) must equal the numpy twin EXACTLY
    for threshold in (2_000_000, 0):
        got_rows = spark_pagerank(links_df, nodes_df,
                                  local_threshold=threshold).collect()
        got = {bytes(r["node"]): int(r["rank_fp"]) for r in got_rows}
        assert got == want, threshold  # exact int64, any partitioning
        std_got = {bytes(r["node"]): float(r["pagerank"]) for r in got_rows}
        for u, v in zip(nodes, std_want):
            assert std_got[u] == v, (threshold, u)  # bit-identical doubles


def test_index_pagerank_rank_identity(spark, corpus, tmp_path_factory):
    """build_index(pagerank=True) -> doc_map.pagerank equals the oracle's,
    and top-k stays rank-identical under a NON-ZERO pagerank weight."""
    from mithril_spark.engine import SearchEngine
    from mithril_spark.fixtures import pages_to_df
    from mithril_spark.indexer import build_index
    from mithril_spark.oracle import OracleIndex

    path = str(tmp_path_factory.mktemp("pr_idx") / "i")
    shutil.rmtree(path, ignore_errors=True)
    build_index(pages_to_df(spark, corpus), path, num_shards=2,
                pagerank=True)
    oracle = OracleIndex.build(
        [(r["url"].encode(), r["html"]) for r in corpus], num_shards=2,
        pagerank=True, pagerank_weight=80.0,
    )
    got = {
        bytes(r["url"]): r["pagerank"]
        for r in spark.read.parquet(path + "/doc_map")
        .select("url", "pagerank").collect()
    }
    want = {
        m.url: m.pagerank
        for s in oracle.shards for m in s.doc_map.values()
    }
    assert got == want
    assert any(v != 0.0 for v in want.values())

    engine = SearchEngine(spark, path, pagerank_weight=80.0)
    for q in ["search engine", "granite OR marble", "title:engine",
              "spark shuffle partition", "NOT quartz"]:
        assert engine.top_k(q) == oracle.top_k(q), q
