"""Incremental index maintenance: merge_index_delta == full rebuild.

The derived tables (doc_map, postings, positions, term_dict, index_stats)
are a deterministic function of the staged row set, so folding new pages in
through two merge_index_delta calls must produce BYTE-IDENTICAL tables to a
from-scratch build over the union corpus — at 1, 2 and 3 shards. Only the
stage layout differs (generations vs one dir); read_stage resolves it.
"""

import shutil

import pytest

from mithril_spark.fixtures import generate_pages, pages_to_df
from mithril_spark.indexer import (
    build_index,
    compact_stage,
    merge_index_delta,
    read_stage,
)

PCOLS = ["term", "shard", "salt", "block_id", "doc_count", "first_doc_id",
         "last_doc_id", "max_freq", "freq_sum", "doc_ids_enc", "freqs_enc"]
XCOLS = ["term", "shard", "salt", "doc_count", "first_doc_id", "last_doc_id",
         "doc_ids_enc", "flags_enc", "pos_counts_enc", "positions_enc"]
DCOLS = ["shard", "doc_id", "local_id", "url", "title_len", "body_len",
         "static_rank", "pagerank"]  # pagerank too: float32, bit-identical
# by invariant (Spark == numpy exact fixed point -> same standardization),
# so stale/partial scores fail the identity gates, not just all-zeros
TCOLS = ["term", "shard", "df", "cf"]
SCOLS = ["shard", "doc_count", "total_body", "total_title", "total_url",
         "total_desc"]


def _tbl(spark, path, name, cols):
    return sorted(
        tuple(bytes(v) if isinstance(v, (bytes, bytearray)) else v
              for v in (r[c] for c in cols))
        for r in spark.read.parquet(f"{path}/{name}").select(*cols).collect()
    )


def _assert_same_index(spark, a, b):
    for name, cols in [("doc_map", DCOLS), ("postings", PCOLS),
                       ("positions", XCOLS), ("term_dict", TCOLS),
                       ("index_stats", SCOLS)]:
        assert _tbl(spark, a, name, cols) == _tbl(spark, b, name, cols), name


@pytest.mark.parametrize("shards", [1, 2, 3])
def test_two_increments_equal_full_rebuild(spark, tmp_path_factory, shards):
    pages = generate_pages(120, seed=42)
    p1, p2, p3 = pages[:70], pages[70:95], pages[95:]

    full_dir = str(tmp_path_factory.mktemp(f"inc_full_{shards}") / "i")
    shutil.rmtree(full_dir, ignore_errors=True)
    build_index(pages_to_df(spark, pages), full_dir, num_shards=shards)

    inc_dir = str(tmp_path_factory.mktemp(f"inc_inc_{shards}") / "i")
    shutil.rmtree(inc_dir, ignore_errors=True)
    build_index(pages_to_df(spark, p1), inc_dir, num_shards=shards)
    merge_index_delta(inc_dir, pages_to_df(spark, p2), mode="recompact")
    merge_index_delta(inc_dir, pages_to_df(spark, p3), mode="recompact")

    _assert_same_index(spark, full_dir, inc_dir)

    # the served results agree too (query layer over the merged index)
    from mithril_spark.engine import SearchEngine

    ef = SearchEngine(spark, full_dir, cache_doc_map=False)
    ei = SearchEngine(spark, inc_dir, cache_doc_map=False)
    for q in ["search engine", "granite OR marble", "NOT quartz"]:
        assert ef.top_k(q) == ei.top_k(q), q

    # compaction folds generations without changing the resolved rows
    before = {bytes(r["url"]) for r in read_stage(spark, inc_dir)
              .select("url").collect()}
    folded = compact_stage(spark, inc_dir)
    assert folded == 3
    after = {bytes(r["url"]) for r in read_stage(spark, inc_dir)
             .select("url").collect()}
    assert before == after


def test_streaming_ingest_feeds_incremental_merge(spark, tmp_path_factory):
    """The full freshness loop: the crawler keeps writing (streaming
    extraction over a pages directory), merge_index_delta folds the
    stream's extracted rows into the index WITHOUT re-parsing, and the
    result is byte-identical to a from-scratch build over the union."""
    from mithril_spark.streaming import stream_extract_pages

    pages = generate_pages(100, seed=42)
    p1, p2 = pages[:60], pages[60:]
    tmp = tmp_path_factory.mktemp("stream_inc")

    full_dir = str(tmp / "full")
    build_index(pages_to_df(spark, pages), full_dir, num_shards=2)

    inc_dir = str(tmp / "inc")
    build_index(pages_to_df(spark, p1), inc_dir, num_shards=2)

    # crawler writes p2; streaming extraction picks it up incrementally
    pages_dir = str(tmp / "pages")
    extracted_dir = str(tmp / "extracted")
    ckpt = str(tmp / "ckpt")
    pages_to_df(spark, p2).write.parquet(pages_dir)
    q = stream_extract_pages(spark, pages_dir, extracted_dir, ckpt)
    q.awaitTermination(120)

    merge_index_delta(inc_dir, extracted=spark.read.parquet(extracted_dir),
                      mode="recompact")
    _assert_same_index(spark, full_dir, inc_dir)


def test_merge_replaces_recrawled_url(spark, tmp_path_factory):
    """A re-crawled url is replaced by its newest snapshot (latest
    generation wins), mirroring dedupe_pages semantics."""
    pages = generate_pages(40, seed=5)
    inc_dir = str(tmp_path_factory.mktemp("inc_replace") / "i")
    shutil.rmtree(inc_dir, ignore_errors=True)
    build_index(pages_to_df(spark, pages), inc_dir, num_shards=2)

    # re-crawl one url with different content (borrow another page's html)
    recrawl = [dict(pages[3], html=pages[7]["html"])]
    merge_index_delta(inc_dir, pages_to_df(spark, recrawl))

    stage = read_stage(spark, inc_dir)
    assert stage.count() <= len(pages)  # replacement, not duplication
    row = stage.filter(
        stage.url == pages[3]["url"].encode()
    ).select("text").collect()
    from mithril_spark.oracle import extract_text

    want = extract_text(pages[3]["url"].encode(), pages[7]["html"])
    assert len(row) == 1 and bytes(row[0]["text"]) == want


def test_resume_after_midbuild_crash(spark, tmp_path_factory):
    """Checkpoint-resume under a SIMULATED mid-build crash (north rule:
    'resumable from checkpoint with per-partition lineage'): a build that
    died after the doc_map/stats phases committed — postings mid-write
    (stale part file, no _SUCCESS), term_dict never started, final
    metadata never written — must resume by re-running ONLY the missing
    phases (overwrite sweeps the partial write) and converge to tables
    identical to an uninterrupted build."""
    import json
    import os

    pages = generate_pages(60, seed=17)
    df = pages_to_df(spark, pages)

    a_dir = str(tmp_path_factory.mktemp("resume_full") / "i")
    build_index(df, a_dir, num_shards=2)

    b_dir = str(tmp_path_factory.mktemp("resume_crash") / "i")
    build_index(df, b_dir, num_shards=2)
    # simulate the crash window: postings partially written, term_dict
    # absent, index_meta (the last thing a build writes) missing
    os.remove(os.path.join(b_dir, "postings", "_SUCCESS"))
    with open(os.path.join(b_dir, "postings",
                           "part-99999-deadbeef.parquet"), "wb") as f:
        f.write(b"partial write garbage")
    shutil.rmtree(os.path.join(b_dir, "term_dict"))
    os.remove(os.path.join(b_dir, "index_meta.json"))

    res = build_index(df, b_dir, num_shards=2)
    ran = {m["phase"]: m.get("ran") for m in res["phases"]}
    assert ran["postings"] is True
    assert ran["term_dict"] is True
    for done in ("extract", "assign_ids", "doc_map", "doc_text"):
        assert ran[done] is False, done

    _assert_same_index(spark, a_dir, b_dir)
    with open(os.path.join(a_dir, "index_meta.json")) as fa, \
            open(os.path.join(b_dir, "index_meta.json")) as fb:
        ma, mb = json.load(fa), json.load(fb)
    assert ma == mb

    # the resumed index serves rank-identically to the untouched twin
    from mithril_spark.engine import SearchEngine

    ea = SearchEngine(spark, a_dir, cache_doc_map=False)
    eb = SearchEngine(spark, b_dir, cache_doc_map=False)
    for q in ["search engine", "granite OR marble", "NOT quartz"]:
        assert ea.top_k(q) == eb.top_k(q), q


def test_assign_meta_commits_before_ids(spark, tmp_path_factory,
                                        monkeypatch):
    """_assign_meta.json is written BEFORE the doc_ids _SUCCESS commit
    (code-review r5): the resume gate is the ids marker, so the old
    order's crash window (ids committed, meta missing/stale) either dead-
    ended the resume on FileNotFoundError or silently reused a previous
    build's total_docs/shard_size. Simulate a crash DURING the ids write
    and prove the on-disk state is the safe one — meta present, marker
    absent — and that a plain re-run converges to a clean twin."""
    import os

    from mithril_spark import indexer as ix

    pages = generate_pages(40, seed=19)
    df = pages_to_df(spark, pages)

    a_dir = str(tmp_path_factory.mktemp("ameta_full") / "i")
    build_index(df, a_dir, num_shards=2)

    b_dir = str(tmp_path_factory.mktemp("ameta_crash") / "i")
    real = ix._write_once

    def boom(sdf, path, force=False):
        if path.endswith("doc_ids"):
            raise RuntimeError("simulated crash during the ids write")
        return real(sdf, path, force=force)

    monkeypatch.setattr(ix, "_write_once", boom)
    try:
        build_index(df, b_dir, num_shards=2)
        raise AssertionError("build survived the simulated crash")
    except RuntimeError:
        pass
    monkeypatch.setattr(ix, "_write_once", real)

    # the safe crash state: meta already durable, ids not yet committed
    assert os.path.exists(os.path.join(b_dir, "_assign_meta.json"))
    assert not os.path.exists(os.path.join(b_dir, "doc_ids", "_SUCCESS"))

    build_index(df, b_dir, num_shards=2)
    _assert_same_index(spark, a_dir, b_dir)
