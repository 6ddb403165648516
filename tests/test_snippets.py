"""Snippet generator: unit semantics + engine integration oracle twin.

Reference: web/src/Snippets.h (combinedText :146, generateSnippet :183,
boundaries :246, substring path :330, fallback :366).
"""

import shutil

import pytest

from mithril_spark.snippets import (
    _boundaries,
    _char_pos_of_token,
    combined_text,
    generate_snippet,
)


def test_combined_text_quirks():
    # title words then '. ', desc then extra ' ', body words, all +' '
    assert combined_text(["A", "B"], "d e", "x y") == "A B . d e  x y "
    assert combined_text([], "", "x") == "x "
    assert combined_text(["T"], "d", "") == "d "   # body empty -> desc only
    assert combined_text([], "", "") == ""


def test_char_pos_of_token():
    text = "aa bb  cc dd"
    assert _char_pos_of_token(text, 0) == 0
    assert _char_pos_of_token(text, 1) == 3
    assert _char_pos_of_token(text, 2) == 7
    assert _char_pos_of_token(text, 99) == len(text)


def test_boundaries_extend_to_sentence():
    text = "start. " + "x" * 200 + ". tail words here"
    start, end = _boundaries(text, 150, 75)
    # start walked back <=100 chars to just after a '.', or stopped at limit
    # the walk-back limit clamps at 0 (snippets.py), so "stopped at
    # limit" means start == max(0, ...) — the unclamped arm was -25,
    # unsatisfiable by any valid start (code-review r5)
    assert text[start - 1] == "." or start == max(0, 150 - 75 - 100)
    assert text[end - 1] == "." or end == min(150 + 75 + 100, len(text))


def test_generate_snippet_paths():
    text = "alpha beta gamma. " + "filler " * 40 + "needle word here. tail"
    # substring path: finds 'needle', clips with ellipses
    s = generate_snippet(text, ["needle"])
    assert "needle" in s and s.startswith("...")
    # positions path takes priority
    s2 = generate_snippet(text, ["zzz"], positions={"alpha": [0]})
    assert "alpha" in s2
    # fallback: head of document
    s3 = generate_snippet(text, ["zzz"])
    assert s3.endswith("...") and s3.startswith("alpha beta gamma.")
    assert generate_snippet("", ["a"]) == "No content available"
    # short terms (<3 chars) skipped by the substring path
    assert generate_snippet("ab " * 100, ["ab"]).endswith("...")


def test_engine_snippets_match_oracle(spark, tmp_path_factory):
    """Engine snippets (positions-first, doc_text sidecar fetch) must be
    string-identical to OracleIndex.top_k_with_snippets — the in-memory
    twin sharing snippets.py and the rank-identical top-k."""
    from mithril_spark.engine import SearchEngine
    from mithril_spark.fixtures import generate_pages, pages_to_df
    from mithril_spark.indexer import build_index
    from mithril_spark.oracle import OracleIndex

    pages = generate_pages(150, seed=42)
    path = str(tmp_path_factory.mktemp("snip_idx") / "i")
    shutil.rmtree(path, ignore_errors=True)
    build_index(pages_to_df(spark, pages), path, num_shards=2)
    engine = SearchEngine(spark, path)
    oracle = OracleIndex.build(
        [(p["url"].encode(), p["html"]) for p in pages], num_shards=2
    )

    saw_position_snippet = False
    for q in ["search engine", "granite OR marble", "thermite",
              "spark shuffle partition"]:
        got = engine.top_k_with_snippets(q)
        want = oracle.top_k_with_snippets(q)
        assert len(got) == len(want) > 0, q
        for (gd, gs, gu, gt, gsnip), (wd, ws, wu, wt, wsnip) in zip(got, want):
            assert (int(gd), int(gs), bytes(gu)) == (int(wd), int(ws), bytes(wu))
            assert gsnip == wsnip, (q, gu)
        # prove the positions path is exercised: at least one hit whose
        # positions-based snippet differs from the substring-only snippet
        res = engine.top_k_many([q], with_positions=True)[0]
        for _d, _s, _u, _t, pos in res:
            if pos and any(pos.values()):
                saw_position_snippet = True
    assert saw_position_snippet


def test_snippet_fetch_plan_prunes(spark, tmp_path_factory):
    """The doc_text sidecar fetch must push the url IN(...) filter into the
    parquet scan (min/max skipping works because doc_text is url-sorted)."""
    from pyspark.sql import functions as F

    from mithril_spark.fixtures import generate_pages, pages_to_df
    from mithril_spark.indexer import build_index

    path = str(tmp_path_factory.mktemp("snipplan_idx") / "i")
    shutil.rmtree(path, ignore_errors=True)
    build_index(pages_to_df(spark, generate_pages(80, seed=42)), path,
                num_shards=1)
    doc_text = spark.read.parquet(path + "/doc_text")
    some_urls = [bytes(r["url"]) for r in doc_text.limit(3).collect()]
    fetch = doc_text.filter(F.col("url").isin(some_urls)).select(
        "url", "title", "text", "desc"
    )
    plan = fetch._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "url" in plan.split("PushedFilters")[1][:200], plan[:2000]


def test_bm25_wand_snippets_match_oracle(spark, tmp_path_factory):
    """bm25_topk_with_snippets (WAND path): tuple shape and snippet
    strings must equal an independent twin built from the oracle's
    per-doc text AND per-term positions with the same generate_snippet
    machinery — positions-FIRST since VERDICT r04 #6 (the engine recovers
    the top-k docs' positions with one pruned fetch), and for hits both
    serving APIs return, the WAND snippet must equal the flagship one."""
    from mithril_spark.engine import SearchEngine
    from mithril_spark.fixtures import generate_pages, pages_to_df
    from mithril_spark.indexer import build_index
    from mithril_spark.oracle import OracleIndex
    from mithril_spark.snippets import combined_text, generate_snippet
    from mithril_spark.text.normalize import BODY, normalize

    pages = generate_pages(150, seed=42)
    path = str(tmp_path_factory.mktemp("wand_snip") / "i")
    build_index(pages_to_df(spark, pages), path, num_shards=2)
    engine = SearchEngine(spark, path)
    oracle = OracleIndex.build(
        [(p["url"].encode(), p["html"]) for p in pages], num_shards=2
    )
    docs_by_url = {d.url: d for d in oracle.docs}
    url_of_id = {}
    for sh in oracle.shards:
        for local, meta in sh.doc_map.items():
            url_of_id[local + sh.base_doc_id] = meta.url

    saw_positions_effect = False
    for q in ["search engine", "granite quartz marble", "thermite"]:
        got = engine.bm25_topk_with_snippets(q, k=8)
        plain = engine.bm25_topk(q, k=8)
        assert [(d, s) for d, s, _u, _t, _sn in got] == plain, q
        qterms = [
            t for t in (
                normalize(tok.encode("utf-8"), BODY).decode("latin-1")
                for tok in q.split()
            ) if t
        ]
        for d, _s, url, _title, snip in got:
            assert bytes(url) == url_of_id[d], q
            doc = docs_by_url[bytes(url)]
            text = combined_text(
                [t.decode("latin-1") for t in doc.title_words],
                b" ".join(doc.desc_words).decode("latin-1"),
                doc.text.decode("latin-1"),
            )
            sh = next(s for s in oracle.shards
                      if s.base_doc_id <= d < s.base_doc_id + s.doc_count)
            positions = {}
            for t in qterms:
                p = sh.get_positions(t, d - sh.base_doc_id)
                if len(p):
                    positions[t] = [int(x) for x in p]
            assert snip == generate_snippet(
                text, qterms, positions=positions), (q, url)
            if positions and snip != generate_snippet(text, qterms):
                saw_positions_effect = True
    # the positions stage must actually change at least one snippet vs the
    # old substring-first behavior, or this twin proves nothing
    assert saw_positions_effect

    # flagship/WAND parity: for identical hits of token-identical queries,
    # the two serving APIs emit the SAME snippet string
    for q in ["search engine", "granite quartz marble"]:
        wand = {bytes(u): sn
                for _d, _s, u, _t, sn in engine.bm25_topk_with_snippets(q, k=10)}
        flag = {bytes(u): sn
                for _d, _s, u, _t, sn in engine.top_k_with_snippets(q)}
        shared = set(wand) & set(flag)
        assert shared, q
        for u in shared:
            assert wand[u] == flag[u], (q, u)


def test_char_pos_of_token_c_isspace():
    """Token hopping uses the C-locale isspace set (Snippets.h:230-236),
    not Python str.isspace: latin-1-decoded text lawfully contains raw
    0xA0 bytes (tails of multi-byte entity expansions), which Python
    calls whitespace but C does not — counting phantom separators shifted
    every later token's char position (code-review r5)."""
    from mithril_spark.snippets import _char_pos_of_token

    # '\xa0' glues "alpha" and "beta" into ONE C token
    text = "alpha\xa0beta gamma delta"
    assert _char_pos_of_token(text, 1) == text.index("gamma")
    assert _char_pos_of_token(text, 2) == text.index("delta")
    # pure-ASCII behavior unchanged
    plain = "one two  three"
    assert _char_pos_of_token(plain, 1) == plain.index("two")
    assert _char_pos_of_token(plain, 2) == plain.index("three")
