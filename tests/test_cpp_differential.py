"""Differential test against the COMPILED C++ reference parser.

VERDICT r01 #3: the repo's oracle shares mithril_spark.text with the
engine, so transcription bugs were invisible to the rank/byte identity
gates. This suite compiles the reference's actual HTML subsystem
(common/src/html/{Parser,Entity,Tags}.cpp + http/URL.cpp + Util.cpp, with
two std-passthrough shims for the not-checked-out vendored lib — see
tests/cpp_ref/shim) and byte-compares every parse field against
mithril_spark.text.htmlparse on the fixture corpus plus adversarial
snippets. Skipped when no C++ compiler is available.
"""

import math
import os
import random
import shutil
import struct
import subprocess

import pytest

REF = "/root/reference"
SOURCES = [
    "tests/cpp_ref/parse_driver.cpp",
    f"{REF}/common/src/html/Parser.cpp",
    f"{REF}/common/src/html/Entity.cpp",
    f"{REF}/common/src/html/Tags.cpp",
    f"{REF}/common/src/http/URL.cpp",
    f"{REF}/common/src/Util.cpp",
]


def _compile(tmp_path_factory, name, sources, includes):
    gxx = shutil.which("g++") or shutil.which("clang++")
    if gxx is None:
        pytest.skip("no C++ compiler available")
    exe = str(tmp_path_factory.mktemp("cppref") / name)
    cmd = [gxx, "-std=c++20", "-O2"]
    for inc in includes:
        cmd += ["-I", inc]
    cmd += [*sources, "-o", exe]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        pytest.skip(f"reference compile failed: {proc.stderr[:500]}")
    return exe

ADVERSARIAL = [
    b"",
    b"no tags at all just words",
    b"<title>unclosed title eats everything",
    b"<TITLE>CASE</title>after",
    b"<script>var a = '<fake>'; if (a > b) {}</script>visible",
    b"<svg><circle/></svg>post",
    b"<!-- comment > with <tags> -->after",
    b"<unknowntag>discarded?</unknowntag>kept",
    b"<a href=\"/x\">outer <a href=\"/y\">nested</a> tail",
    b"<a href='%41%42'>pct</a>",
    b"<base href=\"https://b.example/\"><base href=\"https://c.example/\">",
    b"<embed src=\"https://cdn.example/x.mp4\">",
    b"<meta name=\"description\" content=\"d &amp; c\">",
    b"<meta name=\"robots\" content=\"noindex, nofollow\">",
    b"<html lang=\"en-US\"><body>x</body></html>",
    b"&amp; &bogus; &#65; &#x42; &#xZZ; &unterminated",
    b"< notatag>text< /also>",
    b"<p>a</p ><b>b</b/>",
    b"<a href=\"javascript:void(0)\">js</a>",
    b"<div  class='x'   data-y=\"<z>\">attr soup</div>",
    b"word\xc3\xa9 caf\xc3\xa9 \xe5\x8d\x8a\xe8\xa7\x92",
    b"<a href=\"https://e.com/a?b=1&amp;c=2\">q</a>",
    b"<style>.c > p { color: red }</style>v",
    b"<title>t1</title><title>t2</title>",
    b"</title></a></script>stray closers",
]


@pytest.fixture(scope="module")
def driver(tmp_path_factory):
    return _compile(tmp_path_factory, "parse_driver", SOURCES,
                    ["tests/cpp_ref/shim", f"{REF}/common/include"])


@pytest.fixture(scope="module")
def norm_driver(tmp_path_factory):
    return _compile(tmp_path_factory, "normalize_driver",
                    ["tests/cpp_ref/normalize_driver.cpp"],
                    [f"{REF}/index/src"])


@pytest.fixture(scope="module")
def rank_driver(tmp_path_factory):
    return _compile(
        tmp_path_factory, "rank_driver",
        ["tests/cpp_ref/rank_driver.cpp",
         f"{REF}/ranking/src/StaticRanker.cpp",
         f"{REF}/ranking/src/DynamicRanker.cpp"],
        ["tests/cpp_ref/shim", f"{REF}/ranking/src"],
    )


def _run_reference(exe: str, htmls: list[bytes]) -> list[dict]:
    inp = b"".join(b"%d\n%s\n" % (len(h), h) for h in htmls)
    out = subprocess.run([exe], input=inp, capture_output=True,
                         timeout=300).stdout
    i, docs, cur = 0, [], {}
    while i < len(out):
        sp = out.index(b" ", i)
        tag = out[i:sp].decode()
        nl = out.index(b"\n", sp)
        n = int(out[sp + 1:nl])
        if tag == "E":
            docs.append(cur)
            cur = {}
            i = nl + 1
        else:
            cur[tag] = out[nl + 1:nl + 1 + n]
            i = nl + 1 + n + 1
    return docs


def _python_fields(html: bytes) -> dict:
    from mithril_spark.text.htmlparse import parse_document

    py = parse_document(html)
    return {
        "W": b" ".join(py.words),
        "T": b" ".join(py.title_words),
        "B": py.base,
        "L": py.lang,
        "M": py.metas.get(b"description", b"\x00MISSING"),
        "K": b"".join(u + b"\x1f" + b" ".join(a) + b"\x1e"
                      for u, a in py.links),
    }


def _assert_identical(exe, htmls, labels):
    got = _run_reference(exe, htmls)
    assert len(got) == len(htmls)
    for html, d, label in zip(htmls, got, labels):
        want = _python_fields(html)
        for tag in ("W", "T", "B", "L", "M", "K"):
            assert d[tag] == want[tag], (label, tag, d[tag][:120],
                                         want[tag][:120])


def test_fixture_corpus_byte_identical(driver):
    from mithril_spark.fixtures import generate_pages

    pages = generate_pages(400, seed=42)
    _assert_identical(driver, [p["html"] for p in pages],
                      [p["url"] for p in pages])


def test_alt_seed_corpus_byte_identical(driver):
    from mithril_spark.fixtures import generate_pages

    pages = generate_pages(200, seed=1337)
    _assert_identical(driver, [p["html"] for p in pages],
                      [p["url"] for p in pages])


def test_adversarial_snippets_byte_identical(driver):
    _assert_identical(driver, ADVERSARIAL,
                      [h[:40] for h in ADVERSARIAL])


# --- token normalizer (index/src/TextPreprocessor.h) ---

_NORM_ADVERSARIAL = [
    b"", b"HTML", b"Mixed", b"ALLCAPS", b"a<b>c", b"x{y}z", b"&amp;",
    b"&unterminated", b"...dots...", b"123", b"a1b2", b"www.example",
    b"site.com", b"a=b", b"foo|bar", b"x" * 70, b"x" * 64, b"don't",
    b"re-index", b"caf\xc3\xa9", b"\x80weird", b"end\xff", b"A--B",
    b"__init__", b"the", b"THE", b"And", b"a&b;c", b"<>", b"{}", b"-",
]


def test_normalizer_byte_identical(norm_driver):
    from mithril_spark.fixtures import generate_pages
    from mithril_spark.text.htmlparse import parse_document
    from mithril_spark.text.normalize import normalize, tokenize_url

    pages = generate_pages(200, seed=42)
    toks = []
    for p in pages:
        d = parse_document(p["html"])
        toks.extend((0, w) for w in d.words)
        toks.extend((1, w) for w in d.title_words)
        toks.extend((2, w) for w in tokenize_url(p["url"].encode()))
        desc = d.metas.get(b"description")
        if desc:
            toks.extend((4, w) for w in desc.split(b" "))
    for a in _NORM_ADVERSARIAL:
        toks.extend((f, a) for f in range(5))
    inp = b"".join(b"%d %d\n%s\n" % (f, len(t), t) for f, t in toks)
    out = subprocess.run([norm_driver], input=inp, capture_output=True,
                         timeout=300).stdout
    i, res = 0, []
    while i < len(out):
        nl = out.index(b"\n", i)
        n = int(out[i:nl])
        res.append(out[nl + 1:nl + 1 + n])
        i = nl + 1 + n + 1
    assert len(res) == len(toks)
    for (f, t), got in zip(toks, res):
        assert got == normalize(t, f), (f, t[:60], got, normalize(t, f))


# --- rankers (ranking/src/StaticRanker.cpp + DynamicRanker.cpp) ---

_RANK_KEYS = [
    "bm25", "query_in_title", "query_in_url", "query_in_description",
    "query_in_body", "coverage_percent_query_title",
    "density_percent_query_title", "order_sensitive_title",
    "coverage_percent_query_url", "density_percent_query_url",
    "coverage_percent_query_description",
    "density_percent_query_description", "earliest_pos_title",
    "earliest_pos_body", "static_rank", "pagerank",
]


def test_rankers_bit_identical(rank_driver):
    """Static rank (double bits), dynamic rank (uint32 incl. the negative
    cvttss2si wrap) and OrderedMatchScore (float bits) against the compiled
    reference with the REAL shipped conf values."""
    import numpy as np

    from mithril_spark.fixtures import VOCAB, generate_pages
    from mithril_spark.ranking import (
        F32,
        get_url_dynamic_rank,
        ordered_match_score,
        static_rank,
    )

    env = dict(os.environ, MITHRIL_CONF_DIR=f"{REF}/ranking/config")
    rng = random.Random(7)
    # Only urls containing ':' — the reference's protocol scan
    # (StaticRanker.cpp:147 `while (*c != ':')`) has no bounds check and
    # reads past the buffer on colon-free input (UB); its real inputs are
    # frontier-canonicalized http(s) urls. The Python transcription guards
    # at the string end (ranking.py _get_string_rankings docstring).
    urls = [p["url"] for p in generate_pages(300, seed=42)] + [
        "https://github.com/x", "http://a/", "https://:",
        "ftp://x.com/a", "https://site.com/a%2Fb?x=1",
        "https://www.a.b.c.d.example.com/p/q/r/s/t/u?x=1&y=2&z=3/99999",
    ]
    lines = []
    for u in urls:
        ub = u.encode("utf-8")
        lines.append(b"S %d\n%s\n" % (len(ub), ub))
    feats_list = []
    for _ in range(400):
        f = [rng.uniform(-1.5, 1.5) for _ in range(16)]
        for i in (1, 2, 3, 4):
            f[i] = float(rng.random() < 0.5)
        feats_list.append([np.float32(x) for x in f])
    for f in feats_list:
        words = " ".join(
            "%08x" % struct.unpack("<I", struct.pack("<f", float(x)))[0]
            for x in f)
        lines.append(("D %s\n" % words).encode())
    oms_cases = []
    for _ in range(200):
        q = [rng.choice(VOCAB) for _ in range(rng.randint(1, 5))]
        t = [rng.choice(VOCAB + ["Search", "ENGINE", "x"])
             for _ in range(rng.randint(0, 6))]
        oms_cases.append((q, t))
    for q, t in oms_cases:
        lines.append(("O %d %d\n" % (len(q), len(t))).encode())
        for tok in q + t:
            tb = tok.encode()
            lines.append(b"%d\n%s\n" % (len(tb), tb))

    r = subprocess.run([rank_driver], input=b"".join(lines),
                       capture_output=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-400:]
    out = r.stdout.decode().split()
    i = 0
    for u in urls:
        cpp = struct.unpack("<d", struct.pack("<Q", int(out[i], 16)))[0]
        i += 1
        py = static_rank(u)
        assert cpp == py or (math.isnan(cpp) and math.isnan(py)), u
    for f in feats_list:
        cpp = int(out[i])
        i += 1
        assert cpp == get_url_dynamic_rank(dict(zip(_RANK_KEYS, f)))
    for q, t in oms_cases:
        cpp = struct.unpack("<f", struct.pack("<I", int(out[i], 16)))[0]
        i += 1
        assert cpp == float(F32(ordered_match_score([(w, 1) for w in q], t)))


# --- query lexer (query/src/Lexer.cpp) ---

@pytest.fixture(scope="module")
def lex_driver(tmp_path_factory):
    return _compile(
        tmp_path_factory, "lex_driver",
        ["tests/cpp_ref/lex_driver.cpp", f"{REF}/query/src/Lexer.cpp"],
        [f"{REF}/query/src"],
    )


_LEX_QUERIES_EXTRA = [
    '"unterminated', "'also unterminated", "(((", ")", "a:b", "title:",
    "title:x", "url:github desc:y anchor:z", "AND OR NOT", "andlow",
    "TITLE:x", "  spaced   out  ", "wei\trd\ntokens", "a(b)c",
    "mix \"q\" 'p' (w)", "", "::", "x'y", 'x"y z" w', "foo|bar=1 2.5 %41",
    "NOT(a)", "a AND(b OR c)", "anchor:x'", 'desc:"q"', "'a b' 'c d'",
]


def _assert_lexer_identical(lex_driver, queries):
    """Token streams (type + value) must match the compiled reference lexer;
    on malformed input BOTH sides must reject (the reference emits its
    prefix tokens before throwing — the parser aborts to [] either way, so
    the observable contract is reject-vs-reject)."""
    from mithril_spark.query import grammar as g

    # C++ TokenType order (query/src/Token.h:7-22)
    cpp_type = {g.WORD: 0, g.QUOTE: 1, g.PHRASE: 2, g.FIELD: 3, g.TITLE: 4,
                g.URL: 5, g.ANCHOR: 6, g.DESC: 7, g.OPERATOR: 10,
                g.LPAREN: 11, g.RPAREN: 12, g.EOFTOKEN: 13}
    inp = b"".join(b"%d\n%s\n" % (len(q.encode()), q.encode())
                   for q in queries)
    out = subprocess.run([lex_driver], input=inp, capture_output=True,
                         timeout=120).stdout
    i, docs, cur = 0, [], []
    while i < len(out):
        nl = out.index(b"\n", i)
        header = out[i:nl].decode().split()
        if header[0] == "E":
            docs.append(cur)
            cur = []
            i = nl + 1
        else:
            n = int(header[-1])
            tt = int(header[1]) if header[0] == "T" else -1
            cur.append((tt, out[nl + 1:nl + 1 + n]))
            i = nl + 1 + n + 1
    assert len(docs) == len(queries)
    for q, cpp_toks in zip(queries, docs):
        cpp_fail = any(tt == -1 for tt, _v in cpp_toks)
        try:
            py = [(cpp_type[t.type], t.value.encode())
                  for t in g.lex(q)] + [(13, b"")]
            py_fail = False
        except g.ParseException:
            py_fail = True
        assert py_fail == cpp_fail, (q, cpp_toks[:3])
        if not py_fail:
            assert cpp_toks == py, (q, cpp_toks, py)


def test_query_lexer_token_identical(lex_driver):
    from mithril_spark.fixtures import QUERY_SET

    _assert_lexer_identical(lex_driver, list(QUERY_SET) + _LEX_QUERIES_EXTRA)


# --- snippet generator differential (web/src/Snippets.h) ---

@pytest.fixture(scope="module")
def snippet_driver(tmp_path_factory):
    # "-lz" rides in sources so it lands after the objects in link order
    # (DocumentAccessor's gzip loader links zlib even though the driver
    # never opens a store)
    return _compile(
        tmp_path_factory, "snippet_driver",
        ["tests/cpp_ref/snippet_driver.cpp", "-lz"],
        ["tests/cpp_ref/shim", f"{REF}/common/include", f"{REF}/web/src"],
    )


def _snippet_ref(exe, requests: list[bytes]) -> list[bytes]:
    out = subprocess.run([exe], input=b"".join(requests),
                         capture_output=True, timeout=300).stdout
    i, res = 0, []
    while i < len(out):
        nl = out.index(b"\n", i)
        n = int(out[i:nl])
        res.append(out[nl + 1:nl + 1 + n])
        i = nl + 1 + n + 1
    return res


def _g_req(text: bytes, terms: list[bytes], positions: dict) -> bytes:
    req = b"G %d %d %d\n%s\n" % (len(text), len(terms), len(positions), text)
    for t in terms:
        req += b"%d\n%s\n" % (len(t), t)
    for t, ps in positions.items():
        req += b"%d\n%s\n%d %s\n" % (
            len(t), t, len(ps), b" ".join(b"%d" % p for p in ps))
    return req


def test_snippet_chain_matches_reference(snippet_driver):
    """generate_snippet (positions-first chain + all three extractors) is
    byte-identical to the compiled reference's Snippets.h on fixture-corpus
    texts with REAL ranking tokens/positions plus randomized cases."""
    from mithril_spark.fixtures import QUERY_SET, generate_pages
    from mithril_spark.oracle import OracleIndex
    from mithril_spark.ranking import tokenify_query
    from mithril_spark.snippets import combined_text, generate_snippet

    pages = generate_pages(120, seed=42)
    oracle = OracleIndex.build(
        [(r["url"].encode(), r["html"]) for r in pages], num_shards=1
    )
    shard = oracle.shards[0]

    cases = []  # (text_str, terms_strs, positions_dict)
    for q in list(QUERY_SET)[:12]:
        tokens, _si, _ni = tokenify_query(q)
        qterms = [t for t, _m in tokens]
        for doc_id, _s, url, _t in oracle.top_k(q)[:4]:
            doc = next(d for d in oracle.docs if d.url == url)
            text = combined_text(
                [t.decode("latin-1") for t in doc.title_words],
                b" ".join(doc.desc_words).decode("latin-1"),
                doc.text.decode("latin-1"),
            )
            positions = {}
            for term, _m in tokens:
                ps = [int(x) for x in shard.get_positions(term, int(doc_id))]
                if ps and max(ps) < 65536:  # the reference slot is uint16
                    positions[term] = ps
            cases.append((text, qterms, positions))

    rng = random.Random(20260816)
    # parenthesize the repeat: implicit literal concatenation binds first,
    # so the old expression triplicated the whole sentence instead of
    # adding the intended "xxx" token (code-review r5)
    filler = ("alpha beta. gamma needle? delta! word here tail "
              + "x" * 3 + " ").split()
    for _ in range(80):
        words = [rng.choice(filler) for _ in range(rng.randint(0, 120))]
        text = " ".join(words)
        terms = [rng.choice(filler + ["zz", "needle"])
                 for _ in range(rng.randint(0, 3))]
        positions = {}
        for t in set(terms[:2]):
            if rng.random() < 0.6:
                positions[t] = sorted(
                    rng.randrange(0, 200) for _ in range(rng.randint(1, 4)))
        cases.append((text, terms, positions))
    cases.append(("", ["a"], {}))
    cases.append(("short text", [], {}))
    cases.append(("x" * 300, ["zz"], {}))

    reqs = [
        _g_req(text.encode("latin-1"),
               [t.encode("latin-1") for t in terms],
               {t.encode("latin-1"): ps for t, ps in positions.items()})
        for text, terms, positions in cases
    ]
    ref = _snippet_ref(snippet_driver, reqs)
    assert len(ref) == len(cases)
    for (text, terms, positions), want in zip(cases, ref):
        got = generate_snippet(text, terms, positions=positions or None)
        assert got.encode("latin-1") == want, (text[:60], terms, positions)


def test_combined_text_matches_reference(snippet_driver):
    """combined_text == the reference DocumentAccessor::combinedText for
    fixture docs and randomized word vectors."""
    from mithril_spark.fixtures import generate_pages
    from mithril_spark.snippets import combined_text
    from mithril_spark.text.docproc import process_page

    cases = []  # (title words, desc words, body words) as bytes lists
    for p in generate_pages(40, seed=7):
        d = process_page(p["url"].encode(), p["html"])
        if d is None:
            continue
        cases.append((d.title_words, d.desc_words, d.text.split(b" ")))
    rng = random.Random(5)
    vocab = [b"a", b"bb", b"word.", b"x!y", b"end?"]
    for _ in range(40):
        cases.append(tuple(
            [rng.choice(vocab) for _ in range(rng.randint(0, 5))]
            for _ in range(3)
        ))

    reqs = []
    for title, desc, body in cases:
        req = b"T %d %d %d\n" % (len(title), len(desc), len(body))
        for w in (*title, *desc, *body):
            req += b"%d\n%s\n" % (len(w), w)
        reqs.append(req)
    ref = _snippet_ref(snippet_driver, reqs)
    assert len(ref) == len(cases)
    for (title, desc, body), want in zip(cases, ref):
        got = combined_text(
            [t.decode("latin-1") for t in title],
            b" ".join(desc).decode("latin-1"),
            b" ".join(body).decode("latin-1"),
        )
        assert got.encode("latin-1") == want, (title, desc[:3], body[:3])


# --- ISR algebra differential (index/src/TermAND/TermOR/NotISR) ---

@pytest.fixture(scope="module")
def isr_driver(tmp_path_factory):
    return _compile(
        tmp_path_factory, "isr_driver",
        ["tests/cpp_ref/isr_driver.cpp",
         f"{REF}/index/src/TermAND.cpp",
         f"{REF}/index/src/TermOR.cpp",
         f"{REF}/index/src/NotIndexStreamReader.cpp",
         # linked for TermAND's dynamic_cast typeinfo only (no index opened)
         f"{REF}/index/src/TermReader.cpp",
         f"{REF}/index/src/TermDictionary.cpp",
         f"{REF}/index/src/PositionIndex.cpp",
         f"{REF}/index/src/PostingBlock.cpp",
         f"{REF}/common/src/data/Reader.cpp",
         f"{REF}/common/src/data/Writer.cpp",
         "-include", "cstring",  # PositionIndex.cpp uses std::memcpy bare
         "-lz"],
        ["tests/cpp_ref/shim", f"{REF}/index/src", f"{REF}/common/include"],
    )


class _VecLeaf:
    """TermReader cursor semantics over a plain list (TermReader.cpp
    hasNext/moveNext/currentDocID/seekToDocID), deliberately NOT a
    TermReaderISR so both sides keep construction order in TermAND."""

    def __init__(self, docs):
        self.docs = docs
        self.idx = 0
        self.at_end = not docs

    def has_next(self):
        return not self.at_end and self.idx < len(self.docs)

    def move_next(self):
        if not self.has_next():
            self.at_end = True
            return
        self.idx += 1

    def current_doc_id(self):
        from mithril_spark.query.isr import IsrError

        if not self.has_next():
            raise IsrError("No current posting")
        return self.docs[self.idx]

    def seek_to_doc_id(self, t):
        if not self.docs or self.at_end:
            return
        if self.idx < len(self.docs) and self.docs[self.idx] >= t:
            return
        if t > self.docs[-1]:
            self.idx = len(self.docs)
            self.at_end = True
            return
        while self.idx < len(self.docs) and self.docs[self.idx] < t:
            self.idx += 1
        if self.idx >= len(self.docs):
            self.at_end = True

    def is_identity(self):
        return False


def _build_py(toks, i, dc):
    from mithril_spark.query.isr import (
        IdentityISR, NotISR, TermANDISR, TermORISR,
    )

    t = toks[i]
    if t in ("A", "O"):
        left, i = _build_py(toks, i + 1, dc)
        right, i = _build_py(toks, i, dc)
        cls = TermANDISR if t == "A" else TermORISR
        return cls([left, right]), i
    if t == "N":
        child, i = _build_py(toks, i + 1, dc)
        return NotISR(child, dc), i
    if t == "I":
        return IdentityISR(), i + 1
    n = int(toks[i + 1])
    docs = [int(x) for x in toks[i + 2:i + 2 + n]]
    return _VecLeaf(docs), i + 2 + n


def _set_eval(toks, i, dc):
    """Pure set-algebra twin over the same prefix tree (vecisr kernels)."""
    import numpy as np

    from mithril_spark.query.vecisr import (
        complement_sorted, intersect_sorted, union_sorted,
    )

    t = toks[i]
    if t in ("A", "O"):
        left, i = _set_eval(toks, i + 1, dc)
        right, i = _set_eval(toks, i, dc)
        op = intersect_sorted if t == "A" else union_sorted
        return op(left, right), i
    if t == "N":
        child, i = _set_eval(toks, i + 1, dc)
        return complement_sorted(child, dc), i
    if t == "I":
        return np.empty(0, dtype=np.int64), i + 1
    n = int(toks[i + 1])
    docs = np.array([int(x) for x in toks[i + 2:i + 2 + n]], dtype=np.int64)
    return docs, i + 2 + n


def _tree_seek_safe(toks, i=0, mode=0):
    """_seek_safe's transition rules applied to the raw prefix tree
    (mode 0=NONE 1=FWD 2=ARB) — must mirror query/vecisr.py."""
    t = toks[i]
    if t in ("A", "O"):
        child_mode = 2 if (t == "A" or mode != 0) else 0
        ok1, i = _tree_seek_safe(toks, i + 1, child_mode)
        ok2, i = _tree_seek_safe(toks, i, child_mode)
        return ok1 and ok2, i
    if t == "N":
        ok, i = _tree_seek_safe(toks, i + 1, 1)
        return ok and mode != 2, i
    if t == "I":
        return True, i + 1
    n = int(toks[i + 1])
    return True, i + 2 + n


def _random_tree(rng, dc, depth=0):
    r = rng.random()
    if depth >= 4 or r < 0.4:
        if r < 0.04:
            return ["I"]
        n = rng.randint(0, max(dc, 1))
        docs = sorted(rng.sample(range(max(dc, 1)), min(n, max(dc, 1))))
        return ["L", str(len(docs))] + [str(d) for d in docs]
    if r < 0.6:
        return ["A"] + _random_tree(rng, dc, depth + 1) + _random_tree(rng, dc, depth + 1)
    if r < 0.8:
        return ["O"] + _random_tree(rng, dc, depth + 1) + _random_tree(rng, dc, depth + 1)
    return ["N"] + _random_tree(rng, dc, depth + 1)


def test_isr_algebra_matches_reference(isr_driver):
    """The scalar ISR cursor algebra (TermAND zig-zag, TermOR min-of-heads,
    NotISR complement incl. the doc-0 and backward-seek rewind quirks) is
    state-identical to the compiled reference under randomized trees and
    randomized move/seek interleavings; and for trees vecisr._seek_safe
    accepts, the numpy set-algebra result equals the enumerated walk —
    validating the safety gate against the actual C++."""
    from mithril_spark.query.isr import IsrError

    rng = random.Random(20260816)
    cases = []
    for _ in range(400):
        dc = rng.choice([0, 1, 5, 20, 60])
        toks = _random_tree(rng, dc)
        if rng.random() < 0.5:
            ops = ["m"] * rng.randint(0, min(dc + 2, 25))
        else:
            ops = [
                ("m" if rng.random() < 0.5
                 else f"s{rng.randint(0, dc + 3)}")
                for _ in range(rng.randint(0, 12))
            ]
        cases.append((dc, toks, ops))

    inp = b"".join(
        (f"C {dc} {len(toks)} {len(ops)}\n{' '.join(toks)}\n"
         f"{' '.join(ops)}\n").encode()
        for dc, toks, ops in cases
    )
    out = subprocess.run([isr_driver], input=inp, capture_output=True,
                         timeout=300).stdout.decode()
    blocks = [b for b in out.split("END\n") if b != ""]
    assert len(blocks) == len(cases)

    n_unsafe = n_enum = 0
    for (dc, toks, ops), block in zip(cases, blocks):
        ref_states = block.splitlines()
        try:
            isr, _ = _build_py(toks, 0, dc)
            py_states = []

            def state():
                if isr.has_next():
                    py_states.append(f"1 {int(isr.current_doc_id())}")
                else:
                    py_states.append("0 X")

            state()
            for op in ops:
                if op == "m":
                    isr.move_next()
                else:
                    isr.seek_to_doc_id(int(op[1:]))
                state()
        except IsrError:
            # keep the pre-error prefix: the driver prints every state
            # BEFORE its exception too, so an error at the WRONG step (or
            # divergent states leading up to it) must fail the compare —
            # the old collapse to ["E"] masked exactly that class (fixed,
            # code-review r5)
            py_states.append("E")
        assert py_states == ref_states, (dc, toks, ops, py_states[:6],
                                         ref_states[:6])
        if py_states[-1] == "E":
            continue  # enumeration below would raise the same error

        # enumerate-to-exhaustion check + vec gate validation (m-only walks
        # start from a fresh tree: the op walk above consumed state)
        if all(o == "m" for o in ops):
            isr2, _ = _build_py(toks, 0, dc)
            walked = []
            while isr2.has_next():
                walked.append(int(isr2.current_doc_id()))
                isr2.move_next()
            safe, _ = _tree_seek_safe(toks)
            if safe:
                n_enum += 1
                sset, _ = _set_eval(toks, 0, dc)
                assert walked == [int(x) for x in sset], (dc, toks)
            else:
                n_unsafe += 1
    # the generator must actually produce both populations
    assert n_enum > 50 and n_unsafe > 5, (n_enum, n_unsafe)


# --- seeded random fuzz differentials ---
#
# The hand-written adversarial lists above probe known parser states; these
# fuzzers probe the interleavings BETWEEN them (tag soup, mismatched quotes,
# truncated constructs, raw high/NUL bytes). Deterministic (seeded), batched
# through the compiled reference in one subprocess call like everything else
# in this module, byte-compared field by field.

_FUZZ_TAG_NAMES = [
    b"a", b"A", b"base", b"meta", b"title", b"TITLE", b"script", b"style",
    b"svg", b"symbol", b"defs", b"html", b"embed", b"p", b"div", b"SPAN",
    b"b", b"h1", b"unknown", b"x-data", b"1bogus", b"", b"!--", b"a b",
]

_FUZZ_WORDS = [
    b"alpha", b"Beta", b"GAMMA", b"d1g1t5", b"caf\xc3\xa9", b"\xe5\x8d\x8a",
    b"&amp;", b"&#65;", b"&#x42;", b"&bogus;", b"&unterminated", b"a&b;c",
    b"%41%42", b"%4", b"%zz", b"dots...", b"x" * 70, b"\x80\xff", b"-",
]

_FUZZ_WS = [b" ", b"  ", b"\t", b"\n", b"\r\n", b"\f", b"\v", b""]


def _fuzz_doc(rng: random.Random) -> bytes:
    def text():
        return b"".join(rng.choice(_FUZZ_WORDS) + rng.choice(_FUZZ_WS)
                        for _ in range(rng.randint(1, 5)))

    def attrs():
        out = b""
        for _ in range(rng.randint(0, 3)):
            k = rng.choice([b"class", b"href", b"src", b"lang", b"name",
                            b"content", b"data-x"])
            quote = rng.choice([b'"', b"'", b""])
            v = rng.choice([b"x", b"a b", b"<z>", b"a>b", b"%41%2F%3f",
                            b"&amp;c", b"https://e.com/p?a=1&b=2", b"q'w",
                            b'q"w', b""])
            if quote and rng.random() < 0.8:
                v = v.replace(quote, b"")  # mismatched quotes stay in 20%
            out += b" " + k + rng.choice([b"=", b" = "]) + quote + v + quote
        return out

    def piece():
        r = rng.random()
        name = rng.choice(_FUZZ_TAG_NAMES)
        if r < 0.30:
            return text()
        if r < 0.42:  # open tag (sometimes unclosed -> doc terminates)
            return b"<" + name + attrs() + rng.choice(
                [b">", b"/>", b" >", b">", b">", b""])
        if r < 0.52:  # close tag
            return b"</" + name + rng.choice([b">", b" >", b">", b""])
        if r < 0.60:  # anchor with body, href edge cases
            href = rng.choice([b"/x", b"%41%42", b"%4g", b"a%2Fb", b"",
                               b"https://e.com/?a=1&amp;b=2",
                               b"javascript:v(0)"])
            return (b"<a href=" + rng.choice([b'"', b"'"]) + href
                    + rng.choice([b'"', b"'"]) + b">" + text()
                    + rng.choice([b"</a>", b"</A>", b""]))
        if r < 0.66:  # meta
            mname = rng.choice([b"description", b"robots", b"keywords",
                                b"Description"])
            return b'<meta name="' + mname + b'" content="' + text() + b'">'
        if r < 0.70:
            return (b'<base href="'
                    + rng.choice([b"https://b.example/", b"/rel", b""])
                    + b'">')
        if r < 0.73:
            return (b'<html lang="'
                    + rng.choice([b"en", b"en-US", b"", b"zh"]) + b'">')
        if r < 0.77:  # title (unclosed variant eats the rest of the doc)
            return (b"<title" + rng.choice([b">", b" id=t>"]) + text()
                    + rng.choice([b"</title>", b"</TITLE>", b"</titl>",
                                  b"</title>", b""]))
        if r < 0.84:  # discard section; closer case matched or not
            sec = rng.choice([b"script", b"style", b"svg", b"symbol",
                              b"defs"])
            closer = rng.choice([sec, sec.upper(), sec.capitalize()])
            body = text() + rng.choice([b"<fake>", b"if(a>b){}", b"</almost"])
            return (b"<" + sec + b">" + body
                    + rng.choice([b"</" + closer + b">", b""]))
        if r < 0.91:  # comment (quote-skipping EndingOfTag rules)
            inner = rng.choice([b" c ", b" > ", b" -- ", b" <tags> ",
                                b' "a>b" ', b""])
            return b"<!--" + inner + rng.choice([b"-->", b"->", b">", b""])
        # stray noise
        return rng.choice([b"<", b"</", b"< ", b">", b"<>", b"</>",
                           b"\x00", b"\xc3", b"&#xZZ;", b"<!"])

    return b"".join(piece() for _ in range(rng.randint(1, 30)))


def test_fuzz_html_byte_identical(driver):
    rng = random.Random(20260819)
    docs = [_fuzz_doc(rng) for _ in range(600)]
    _assert_identical(driver, docs, [d[:60] for d in docs])


def test_fuzz_mutated_corpus_byte_identical(driver):
    """Truncate, byte-flip, and splice REAL fixture pages: truncation hits
    end-of-buffer handling at every automaton state (mid-tag, mid-entity,
    mid-comment, inside a discard section); flips corrupt tag names and
    quote pairing; splices create stray closers for tags never opened."""
    from mithril_spark.fixtures import generate_pages

    rng = random.Random(20260819)
    pages = [p["html"] for p in generate_pages(80, seed=42)]
    docs = []
    for h in pages:
        docs.append(h[:rng.randrange(len(h) + 1)])           # truncate
        flipped = bytearray(h)
        for _ in range(rng.randint(1, 8)):
            flipped[rng.randrange(len(flipped))] = rng.randrange(256)
        docs.append(bytes(flipped))                           # byte-flip
        other = pages[rng.randrange(len(pages))]
        docs.append(h[rng.randrange(len(h)):]                 # splice tails
                    + other[:rng.randrange(len(other))])
    _assert_identical(driver, docs, [d[:60] for d in docs])


def test_fuzz_normalizer_byte_identical(norm_driver):
    """Random byte tokens (all 5 fields, lengths straddling the 64-byte cap,
    high/NUL bytes, entity fragments) vs the compiled TokenNormalizer."""
    from mithril_spark.text.normalize import normalize

    rng = random.Random(20260819)
    pool = (b"abcdefghzZ" b"ABCDEFGH" b"0159"
            b".,-_'&;=|{}<>()[]$#@%!?/" b" \t" b"\x80\xc3\xa9\xff\x00")
    toks = []
    for _ in range(6000):
        n = rng.choice([0, 1, 2, 3, 5, 8, 13, 21, 34, 55, 63, 64, 65, 80])
        toks.append((rng.randrange(5),
                     bytes(rng.choice(pool) for _ in range(n))))
    inp = b"".join(b"%d %d\n%s\n" % (f, len(t), t) for f, t in toks)
    out = subprocess.run([norm_driver], input=inp, capture_output=True,
                         timeout=300).stdout
    i, res = 0, []
    while i < len(out):
        nl = out.index(b"\n", i)
        n = int(out[i:nl])
        res.append(out[nl + 1:nl + 1 + n])
        i = nl + 1 + n + 1
    assert len(res) == len(toks)
    for (f, t), got in zip(toks, res):
        assert got == normalize(t, f), (f, t[:60], got, normalize(t, f))


def _fuzz_query(rng: random.Random) -> str:
    atoms = ["a", "bb", "word", "AND", "OR", "NOT", "and", "Nota",
             "title:", "url:", "anchor:", "desc:", "TITLE:", ":",
             '"', "'", "(", ")", " ", "  ", "\t", "|", "2.5", "%41",
             "x'y", 'q"w']
    return "".join(rng.choice(atoms) for _ in range(rng.randint(0, 12)))


def test_fuzz_query_lexer_token_identical(lex_driver):
    rng = random.Random(20260819)
    _assert_lexer_identical(lex_driver,
                            [_fuzz_query(rng) for _ in range(800)])
