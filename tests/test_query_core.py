"""Grammar, ISR-algebra, and ranking-core tests (reference-quirk coverage)."""

import pytest

from mithril_spark.oracle import OracleIndex
from mithril_spark.query import grammar as g
from mithril_spark.ranking import (
    bm25_score,
    ordered_match_score,
    static_rank,
    tokenify_query,
)


def page(url, title, body, lang="en", desc=None, noindex=False):
    metas = []
    if desc:
        metas.append(f'<meta name="description" content="{desc}">')
    if noindex:
        metas.append('<meta name="robots" content="noindex">')
    lang_attr = f' lang="{lang}"' if lang else ""
    html = (
        f"<html{lang_attr}><head><title>{title}</title>{''.join(metas)}</head>"
        f"<body><p>{body}</p></body></html>"
    )
    return (url.encode(), html.encode())


FILLER = " ".join(f"word{i} stuff thing item object piece" for i in range(20))


class TestGrammar:
    def test_lex_types(self):
        toks = g.lex("hello AND title:x url:y \"q p\" 'f p' (a)")
        types = [t.type for t in toks]
        assert types == [
            g.WORD, g.OPERATOR, g.TITLE, g.URL, g.QUOTE, g.PHRASE,
            g.LPAREN, g.WORD, g.RPAREN,
        ]

    def test_prefix_requires_content(self):
        assert g.lex("title:")[0].type == g.WORD  # bare 'title:' is a WORD
        assert g.lex("title:x")[0].type == g.TITLE

    def test_infix_not_discards_left(self):
        tree = g.parse_query("a NOT b")
        assert isinstance(tree, g.NotNode)
        assert isinstance(tree.expr, g.TermNode) and tree.expr.value == "b"

    def test_infix_not_with_trailing_fails(self):
        with pytest.raises(g.ParseException):
            g.parse_query("a NOT b c")

    def test_implicit_and(self):
        tree = g.parse_query("a b")
        assert isinstance(tree, g.AndNode)

    def test_phrase_not_in_implicit_and(self):
        # 'foo' then PHRASE breaks the expression loop -> leftover tokens
        with pytest.raises(g.ParseException):
            g.parse_query("foo 'bar baz'")
        # ...but PHRASE first then WORD is fine
        assert isinstance(g.parse_query("'bar baz' foo"), g.AndNode)

    def test_unterminated_quote_raises(self):
        with pytest.raises(g.ParseException):
            g.parse_query('"unterminated')

    def test_empty_raises(self):
        with pytest.raises(g.ParseException):
            g.parse_query("   ")


class TestISRSemantics:
    @pytest.fixture(scope="class")
    def idx(self):
        docs = []
        for i in range(8):  # alpha+beta adjacent
            docs.append(page(f"https://ex.org/{i:04d}.html", f"doc {i}",
                             FILLER + " alpha beta gamma" * 4))
        for i in range(8, 11):  # alpha only
            docs.append(page(f"https://ex.org/{i:04d}.html", f"doc {i}",
                             FILLER + " alpha gamma delta" * 4))
        # beta only (forces the quote's AND to exhaust via seek, not step-off)
        docs.append(page("https://ex.org/0011.html", "doc 11",
                         FILLER + " beta gamma delta" * 4))
        # no alpha/beta/gamma at all
        docs.append(page("https://ex.org/0012.html", "doc 12", FILLER))
        return OracleIndex.build(docs)

    def test_term(self, idx):
        assert idx.matches("alpha") == list(range(11))

    def test_and_or(self, idx):
        assert idx.matches("alpha beta") == list(range(8))
        assert idx.matches("alpha AND beta") == list(range(8))
        assert idx.matches("alpha OR beta") == list(range(12))

    def test_not_prefix(self, idx):
        # NotISR yields [1, doc_count) minus child (doc 0 unreachable)
        assert idx.matches("NOT alpha") == [11, 12]
        assert idx.matches("NOT zzz") == list(range(13))  # empty child -> all

    def test_not_infix_quirk(self, idx):
        assert idx.matches("alpha NOT beta") == idx.matches("NOT beta")

    def test_stopword_identity(self, idx):
        assert idx.matches("the") == []
        assert idx.matches("the AND alpha") == idx.matches("alpha")
        assert idx.matches("the OR alpha") == idx.matches("alpha")

    def test_quote_skip_first_and_drop_last(self, idx):
        # adjacency in docs 0-7; candidates skip doc 0; last match dropped
        assert idx.matches('"alpha beta"') == [1, 2, 3, 4, 5, 6]

    def test_phrase_span(self, idx):
        # gamma's list is a superset of alpha's -> AND exhausts by step-off
        # -> faithful IsrError abort -> empty
        assert idx.matches("'alpha gamma'") == []
        # alpha lacks doc 11 (beta's last) -> clean seek-exhaust; candidates
        # are AND matches {8,9,10} minus the first, minus the last collected
        assert idx.matches("'alpha delta'") == [9]
        assert idx.matches("'alpha beta'") == [1, 2, 3, 4, 5, 6]

    def test_quote_aborts_on_step_off(self):
        # both terms in all docs -> AND exhausts by step-off -> IsrError -> []
        docs = [
            page(f"https://q.org/{i}.html", f"t {i}", FILLER + " alpha beta" * 4)
            for i in range(6)
        ]
        idx2 = OracleIndex.build(docs)
        assert idx2.matches('"alpha beta"') == []

    def test_field_queries(self, idx):
        assert idx.matches("title:doc") == list(range(13))
        assert idx.matches("url:ex") == list(range(13))
        assert idx.matches("title:alpha") == []

    def test_parse_error_empty(self, idx):
        assert idx.matches("((((") == []
        assert idx.matches("alpha AND") == []


class TestRanking:
    def test_bm25_known_value(self):
        import math
        # idf = ln((100-10+0.5)/(10+0.5)); tf'=3/((0.25)+0.75*(50/40))
        s = bm25_score(100, 40.0, 50, 10, 3)
        idf = math.log(90.5 / 10.5)
        tf = 3 / (0.25 + 0.75 * 50 / 40)
        expected = min(idf * (tf * 2.2) / (tf + 1.2), 6.0) / 6.0
        assert abs(s - expected) < 1e-12

    def test_bm25_edges(self):
        assert bm25_score(100, 40.0, 50, 0, 3) == 0.0        # df=0
        assert bm25_score(100, 40.0, 50, 10, 0) == bm25_score(100, 40.0, 50, 10, 1)

    def test_static_rank_github_is_max(self):
        assert static_rank("https://github.com/") == 1.0

    def test_static_rank_ordering(self):
        good = static_rank("https://en.wikipedia.org/wiki/Spark")
        bad = static_rank(
            "http://x1.y2.z3.site99.biz/a/b/c/d/e/f/page.cgi?a=1&b=2&c=3&id=1234567"
        )
        assert good > bad

    def test_https_bonus(self):
        a = static_rank("https://example.org/a.html")
        b = static_rank("http://example.org/a.html")
        assert a > b

    def test_tokenify(self):
        tokens, stop, non = tokenify_query("The Quick BM25 title:engine NOT x0y")
        names = [t for t, _ in tokens]
        # 'title:engine' -> 'titleengine' rejected; '0' dropped from x0y.
        # Reference quirk: accumulation lowercases first, so the
        # `token == "NOT"` operator check never fires — 'not' survives
        # (and lands in the stopword list).
        assert names == ["the", "quick", "bm25", "not", "xy"]
        assert stop == [0, 3]
        assert non == [1, 2, 4]

    def test_ordered_match_quirk(self):
        # title token must be a PREFIX of the query token (inverted check)
        score = ordered_match_score([("engineering", 1)], ["engine"])
        assert score == 1.0
        score = ordered_match_score([("engine", 1)], ["engineering"])
        assert score == 0.0
