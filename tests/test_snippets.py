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
    assert text[start - 1] == "." or start == 150 - 75 - 100
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


def test_engine_snippets_match_oracle_text(spark, tmp_path_factory):
    """Engine snippet == snippet computed from the oracle's extracted text
    (byte-identity makes stage_raw.text equal oracle text; the generator is
    shared, so results must be string-equal)."""
    from mithril_spark.engine import SearchEngine, plan_terms
    from mithril_spark.fixtures import generate_pages, pages_to_df
    from mithril_spark.indexer import build_index
    from mithril_spark.text.docproc import process_page

    pages = generate_pages(150, seed=42)
    path = str(tmp_path_factory.mktemp("snip_idx") / "i")
    shutil.rmtree(path, ignore_errors=True)
    build_index(pages_to_df(spark, pages), path, num_shards=2)
    engine = SearchEngine(spark, path)

    docs = {}
    for p in pages:
        d = process_page(p["url"].encode(), p["html"])
        if d is not None:
            docs[d.url] = d

    for q in ["search engine", "granite OR marble", "thermite"]:
        results = engine.top_k_with_snippets(q)
        assert results, q
        _pt, _xt, tokens = plan_terms(q)
        qterms = [t for t, _m in tokens]
        for doc_id, _score, url, _title, snippet in results:
            d = docs[url]
            text = combined_text(
                [t.decode("latin-1") for t in d.title_words],
                b" ".join(d.desc_words).decode("latin-1"),
                d.text.decode("latin-1"),
            )
            assert snippet == generate_snippet(text, qterms), (q, url)
