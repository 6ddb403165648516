"""Unit tests for the byte-level text pipeline (reference parity cases).

Expected values are hand-traced from the reference sources cited in each
module (Parser.cpp / Entity.cpp / TextPreprocessor.h / Worker.cpp)."""

import pytest

from mithril_spark.text.entities import decode_html_entity, decode_html_string
from mithril_spark.text.htmlparse import (
    decode_url,
    get_words,
    lookup_possible_tag,
    parse_document,
)
from mithril_spark.text.normalize import (
    BODY,
    DESC,
    TITLE,
    URL,
    content_language_matches,
    language_allowed,
    normalize,
    robots_noindex,
    should_store_positions,
    tokenize_url,
)


class TestEntities:
    @pytest.mark.parametrize(
        "entity,expected",
        [
            (b"&amp;", b"&"),
            (b"&lt;", b"<"),
            (b"&nbsp;", b" "),
            (b"&alpha;", "α".encode()),
            (b"&#65;", b"A"),
            (b"&#x41;", b"A"),
            (b"&#xa0;", b" "),   # NBSP -> plain space
            (b"&#160;", b" "),
            (b"&#x1F600;", "😀".encode()),
        ],
    )
    def test_valid(self, entity, expected):
        assert decode_html_entity(entity) == expected

    @pytest.mark.parametrize(
        "entity",
        [b"&;", b"&bogus;", b"&#;", b"&#xZZ;", b"&#x;", b"&#12a;", b"&", b"&a",
         b"&#1114112;"],  # > 0x10FFFF
    )
    def test_invalid(self, entity):
        assert decode_html_entity(entity) is None

    def test_uint_truncation(self):
        # 2^32 + 65 truncates to 65 ('A') via the unsigned int assignment
        assert decode_html_entity(b"&#4294967361;") == b"A"
        # > ULONG_MAX overflows stoul -> invalid
        assert decode_html_entity(b"&#99999999999999999999999;") is None

    def test_string_passthrough(self):
        assert decode_html_string(b"a &amp; b") == b"a & b"
        assert decode_html_string(b"a &bogus; b") == b"a &bogus; b"
        assert decode_html_string(b"no entities") == b"no entities"
        # '&' without ';' afterwards stops the scan
        assert decode_html_string(b"x &unterminated") == b"x &unterminated"
        # entity spans may contain spaces; invalid -> literal
        assert decode_html_string(b"&foo bar;") == b"&foo bar;"


class TestHtmlParser:
    def test_basic_words_title(self):
        p = parse_document(b"<html><title>My Page</title><p>hello world</p></html>")
        assert p.title_words == [b"My", b"Page"]
        assert p.words == [b"hello", b"world"]

    def test_unknown_tag_is_discarded(self):
        # LookupPossibleTag falls through to Discard for unknown names
        p = parse_document(b"a <unknowntag> b </unknowntag> c")
        assert p.words == [b"a", b"b", b"c"]

    def test_script_discard_section(self):
        p = parse_document(b"x <script>var a = '<fake>'; if (a>b) {}</script> y")
        assert p.words == [b"x", b"y"]

    def test_discard_section_case_sensitive_close(self):
        # </SCRIPT> does not close <script>; scan skips to next '<' forever
        p = parse_document(b"x <script>junk</SCRIPT> y")
        assert p.words == [b"x"]

    def test_comment_with_gt(self):
        p = parse_document(b"a <!-- has > inside --> b")
        assert p.words == [b"a", b"b"]

    def test_anchor_collects_link_and_text(self):
        p = parse_document(b'<a href="/p%41th">anchor text</a>')
        assert p.links == [(b"/pAth", [b"anchor", b"text"])]
        assert p.words == [b"anchor", b"text"]

    def test_meta_and_lang(self):
        p = parse_document(
            b'<html lang="en-US"><meta name="description" content="d&amp;c">x'
        )
        assert p.lang == b"en-US"
        assert p.metas[b"description"] == b"d&c"

    def test_entity_in_word_needs_decode(self):
        p = parse_document(b"cat&amp;dog plain")
        assert p.words == [b"cat&dog", b"plain"]

    def test_unclosed_tag_terminates_document(self):
        # a recognized tag with no closing '>' aborts parsing (nullptr return)
        p = parse_document(b"before <p attr=oops")
        assert p.words == [b"before"]

    def test_stray_lt_is_text(self):
        p = parse_document(b"5<6 <p>end")
        assert p.words == [b"5", b"end"]

    def test_title_empty_drops(self):
        p = parse_document(b"<p>no title here</p>")
        assert p.title_words == []

    def test_base_and_embed(self):
        p = parse_document(
            b'<base href="https://b.org/"><base href="https://c.org/">'
            b'<embed src="https://m.org/v.mp4">'
        )
        assert p.base == b"https://b.org/"
        assert (b"https://m.org/v.mp4", []) in p.links


class TestDecodeUrl:
    def test_uppercase_hex_only(self):
        assert decode_url(b"%41%42") == b"AB"
        assert decode_url(b"%61") == b"a"     # digits always valid
        assert decode_url(b"%6a") == b"%6a"   # lowercase hex letters not decoded
        assert decode_url(b"%4") == b"%4"
        assert decode_url(b"%2Fa") == b"%2Fa"  # '/' reserved, kept encoded

    def test_get_words(self):
        assert get_words(b"  a \t b\nc  ") == [b"a", b"b", b"c"]
        assert get_words(b"") == []


class TestNormalize:
    @pytest.mark.parametrize(
        "token,field,expected",
        [
            (b"Hello", BODY, b"hello"),
            (b"NASA", BODY, b"NASA"),          # acronym preserved
            (b"NASA1", BODY, b"nasa1"),        # mixed -> lowered
            (b"the", BODY, b""),               # body stopword
            (b"the", TITLE, b"#the"),          # stopwords survive non-body
            (b"engine", TITLE, b"#engine"),
            (b"engine", URL, b"@engine"),
            (b"engine", DESC, b"%engine"),
            (b"12345", BODY, b""),             # pure number
            (b"a1b2", BODY, b"a1b2"),          # alphanumeric ok
            (b"foo|bar", BODY, b""),           # pipe
            (b"a=b", BODY, b""),               # equals
            (b"www.example", BODY, b""),
            (b"site.com", BODY, b""),
            (b"don't", BODY, b"don t"),        # inner punct -> single space
            (b"!!wow!!", BODY, b"wow"),
            (b"a" * 65, BODY, b""),            # > 64 chars
            (b"<b>bold</b>", BODY, b"bold"),
            (b"x&amp;y", BODY, b"xy"),         # '&..;' span deleted outright
            (b"", BODY, b""),
            (b"...", BODY, b""),
        ],
    )
    def test_normalize(self, token, field, expected):
        assert normalize(token, field) == expected

    def test_non_ascii_bytes(self):
        # only 0x80 and 0xFF bytes invalidate; other high bytes pass
        assert normalize("café".encode("utf-8"), BODY) == "café".encode("utf-8")
        assert normalize(b"caf\x80e", BODY) == b""
        assert normalize(b"caf\xffe", BODY) == b""

    def test_tokenize_url(self):
        assert tokenize_url(b"https://a.b/c-d_e?f=g") == [
            b"https:", b"a", b"b", b"c", b"d", b"e", b"f", b"g"
        ]
        assert tokenize_url(b"///") == []
        assert tokenize_url(b"") == []

    def test_should_store_positions(self):
        assert should_store_positions(b"#title", 1, 100)
        assert should_store_positions(b"%desc", 1, 100)
        assert should_store_positions(b"NASA", 1, 100)   # uppercase prefix
        assert should_store_positions(b"@a/b", 1, 100)
        assert not should_store_positions(b"@proto", 1, 100)
        assert not should_store_positions(b"the", 50, 1000)
        assert not should_store_positions(b"x", 3001, 10**6)
        assert not should_store_positions(b"x", 30, 200)  # > total/8
        assert should_store_positions(b"x", 3, 1000)
        assert not should_store_positions(b"x", 2, 1000)

    def test_language(self):
        assert language_allowed(b"")
        assert language_allowed(b"en")
        assert language_allowed(b"EN")
        assert language_allowed(b"en-US")
        assert language_allowed(b"en_GB")
        assert not language_allowed(b"fr")
        assert not language_allowed(b"eng")  # 'en' exact, 'en-*' prefix only
        assert content_language_matches(b"en;q=0.9", b"en")

    def test_robots(self):
        assert robots_noindex({b"robots": b"noindex"})
        assert robots_noindex({b"robots": b" nofollow , noindex "})
        assert not robots_noindex({b"robots": b"NOINDEX"})  # case-sensitive
        assert not robots_noindex({})
