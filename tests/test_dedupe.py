"""Url dedup in the indexer + non-vacuous exact-dedup gate.

Recrawled urls are normal in web-page tables (ADVICE r01): docid assignment
must see exactly one row per url, deterministically the latest snapshot.
"""

import shutil

import pytest

from mithril_spark.fixtures import generate_pages, pages_to_df
from mithril_spark.indexer import build_index, dedupe_pages
from mithril_spark.oracle import OracleIndex


def _dup_corpus():
    """150 pages + stale and identical recrawls of a few urls."""
    pages = generate_pages(150, seed=42)
    import copy
    from datetime import timedelta

    dups = []
    for i in (3, 40, 77):
        stale = copy.deepcopy(pages[i])
        stale["warc_ts"] = stale["warc_ts"] - timedelta(days=30)
        stale["html"] = b"<html><title>stale recrawl</title><body>old old old content</body></html>"
        dups.append(stale)
    # an exact byte-identical recrawl (same ts would tie-break on md5(html);
    # here same html so either winner is the same content)
    dups.append(copy.deepcopy(pages[11]))
    return pages, pages + dups


def test_dedupe_pages_keeps_latest(spark):
    clean, dirty = _dup_corpus()
    out = dedupe_pages(pages_to_df(spark, dirty)).collect()
    # Spark collects timestamps as naive local-session (UTC) datetimes
    got = {r["url"]: (r["warc_ts"].replace(tzinfo=None), bytes(r["html"]))
           for r in out}
    want = {r["url"]: (r["warc_ts"].replace(tzinfo=None), r["html"])
            for r in clean}
    assert len(out) == len(clean)
    assert got == want


def test_build_index_dedupes_and_matches_oracle(spark, tmp_path_factory):
    clean, dirty = _dup_corpus()
    path = str(tmp_path_factory.mktemp("dedup_idx") / "i")
    shutil.rmtree(path, ignore_errors=True)
    build_index(pages_to_df(spark, dirty), path, num_shards=2)
    oracle = OracleIndex.build(
        [(r["url"].encode(), r["html"]) for r in clean], num_shards=2
    )
    n = spark.read.parquet(path + "/doc_map").count()
    assert n == len(oracle.docs)

    from mithril_spark.engine import SearchEngine

    engine = SearchEngine(spark, path)
    for q in ["search engine", "granite OR marble", "title:engine"]:
        assert engine.top_k(q) == oracle.top_k(q), q


def test_duplicate_urls_fail_loud_without_dedupe(spark, tmp_path_factory):
    _clean, dirty = _dup_corpus()
    path = str(tmp_path_factory.mktemp("dedup_err") / "i")
    shutil.rmtree(path, ignore_errors=True)
    with pytest.raises(Exception, match="duplicate url"):
        build_index(pages_to_df(spark, dirty), path, num_shards=1, dedupe=False)


def test_exact_dedup_non_vacuous(spark, tmp_path):
    """q_dedup_exact on a planted-duplicate documents table (VERDICT r01 #8):
    the sf0.01 driver gate is 0-rows-both-sides, so this fixture is the
    non-empty correctness gate for the op."""
    from mithril_spark.relational import q_dedup_exact

    rows = [
        (1, "the quick brown fox", "en", "web", 19),
        (2, "the quick brown fox", "en", "web", 19),  # dup of 1
        (3, "unique text one", "en", "web", 15),
        (4, "repeated thrice", "en", "cc", 15),
        (5, "repeated thrice", "en", "cc", 15),
        (6, "repeated thrice", "de", "web", 15),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["text_hash"], r["dup_count"])
        for r in q_dedup_exact(spark, str(tmp_path)).collect()
    }
    import hashlib

    h = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert got == {(h("the quick brown fox"), 2), (h("repeated thrice"), 3)}
