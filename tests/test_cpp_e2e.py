"""FULL-STACK differential: our engine vs the reference's own compiled
index builder + query engine, end to end.

The reference's IndexBuilder (index/src/main.cpp) consumes one gzipped
serialized data::Document per file; we serialize the SAME parsed fixture
docs (same process_page output, ids = url-sort rank, so docids align by
construction), build a real reference index with the reference's own
binary, and answer the full fixture query set through the reference's
QueryManager (QueryEngine ISR lowering + the production ranking pipeline).
Results are compared (docid, score, url), position-exact in list order.

Two reference DEFECTS make a byte-layout-dependent tail incomparable —
both in the sequential position cursors QueryManager threads through
ranking (SetupPositionIndexPointers):

* ``getPositionsFromByte`` (PositionIndex.cpp:587-638) bounds its scan by
  the term's TOTAL doc_count from wherever the cursor stands, so once the
  cursor exhausts the term's region it parses the NEXT TERM's bytes as
  (doc, flags, count) records — matches ranked after the term's last
  stored-positions doc can receive PHANTOM positions from unrelated data;
* ``hasPositionsFromByte`` (PositionIndex.cpp:531-571) consumes a whole
  real entry on every miss (returns the advanced pointer when
  curr_doc_id > target), so the description-presence cursor desyncs
  permanently at its first miss.

The reference's own PUBLIC lookups (getPositions / hasPositions — the
non-cursor API its own tests use) return the correct data and agree with
our store exactly (probed during development). Our engine implements the
evident intent (per-doc-correct lookups); the corrupted values depend on
the physical byte layout of positions.data and are not reproducible from
any faithful logical index. The test therefore computes, per query, the
first docid whose reference score can be touched by either defect (body
cursor exhausted, or first desc-cursor miss) and asserts EXACT equality
below it — and that every difference at or above it is thereby explained
(zero unexplained diffs), with a healthy count of fully-identical queries.
"""

import bisect
import gzip
import os
import shutil
import struct
import subprocess

import pytest

REF = "/root/reference"


def _compile(tmp_path_factory, name, sources, includes):
    gxx = shutil.which("g++") or shutil.which("clang++")
    if gxx is None:
        pytest.skip("no C++ compiler available")
    exe = str(tmp_path_factory.mktemp("cppe2e") / name)
    cmd = [gxx, "-std=c++20", "-O2", "-include", "cstring", "-include", "cmath"]
    for inc in includes:
        cmd += ["-I", inc]
    cmd += [*sources, "-o", exe]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        pytest.skip(f"reference compile failed: {proc.stderr[:500]}")
    return exe


INDEX_SOURCES = [
    f"{REF}/index/src/main.cpp",
    f"{REF}/index/src/InvertedIndex.cpp",
    f"{REF}/index/src/PositionIndex.cpp",
    f"{REF}/index/src/TermDictionary.cpp",
    f"{REF}/index/src/TermStore.cpp",
    f"{REF}/index/src/PostingBlock.cpp",
    f"{REF}/common/src/data/Reader.cpp",
    f"{REF}/common/src/data/Writer.cpp",
    "-lz", "-pthread",
]
QUERY_SOURCES = [
    "tests/cpp_ref/e2e_query_driver.cpp",
    f"{REF}/query/src/QueryManager.cpp",
    f"{REF}/query/src/Lexer.cpp",
    f"{REF}/query/src/intersect.cpp",
    f"{REF}/index/src/TermReader.cpp",
    f"{REF}/index/src/TermDictionary.cpp",
    f"{REF}/index/src/PositionIndex.cpp",
    f"{REF}/index/src/PostingBlock.cpp",
    f"{REF}/index/src/DocumentMapReader.cpp",
    f"{REF}/index/src/GenericTermReader.cpp",
    f"{REF}/index/src/ISRFactory.cpp",
    f"{REF}/index/src/IndexStreamReader.cpp",
    f"{REF}/index/src/NotIndexStreamReader.cpp",
    f"{REF}/index/src/TermAND.cpp",
    f"{REF}/index/src/TermOR.cpp",
    f"{REF}/index/src/TermQuote.cpp",
    f"{REF}/index/src/TermPhrase.cpp",
    f"{REF}/ranking/src/Ranker.cpp",
    f"{REF}/ranking/src/BM25.cpp",
    f"{REF}/ranking/src/StaticRanker.cpp",
    f"{REF}/ranking/src/DynamicRanker.cpp",
    f"{REF}/common/src/data/Reader.cpp",
    f"{REF}/common/src/data/Writer.cpp",
    "-lz", "-pthread",
]
INCLUDES = [
    "tests/cpp_ref/shim",
    f"{REF}/query/src", f"{REF}/index/src", f"{REF}/ranking/src",
    f"{REF}/common/include", f"{REF}/ranking/include",
]


def _u32(v: int) -> bytes:
    return struct.pack(">I", v)


def _s(b: bytes) -> bytes:
    return _u32(len(b)) + b


def _vs(words) -> bytes:
    """vector<string>: [u32 total incl NULs][NUL-terminated strings]
    (data/Serialize.h:121-141)."""
    return _u32(sum(len(w) + 1 for w in words)) + b"".join(
        bytes(w) + b"\0" for w in words
    )


def _write_reference_corpus(docs, crawl_dir: str) -> None:
    os.makedirs(crawl_dir + "/chunk_0")
    for i, d in enumerate(docs):
        payload = (_u32(i) + _s(d.url) + _vs(d.title_words)
                   + _vs(d.desc_words) + _vs(d.body_words)
                   + _vs(d.forward_links))
        with gzip.open(f"{crawl_dir}/chunk_0/doc_{i:010d}", "wb") as f:
            f.write(payload)


def _extra_queries(n: int = 40, seed: int = 987) -> list[str]:
    """Deterministic operator-rich queries over the fixture vocab — drives
    the reference's storage-backed TermQuote/TermPhrase/NotISR and Query.h
    lowering beyond QUERY_SET's grammar coverage."""
    import random

    from mithril_spark.fixtures import STOP_SAMPLE, VOCAB

    rng = random.Random(seed)
    pool = VOCAB + STOP_SAMPLE
    out = []
    for _ in range(n):
        r = rng.random()
        if r < 0.2:
            out.append(f'"{rng.choice(pool)} {rng.choice(pool)}"')
        elif r < 0.35:
            out.append(f"'{rng.choice(pool)} {rng.choice(pool)}'")
        elif r < 0.5:
            out.append(f"{rng.choice(pool)} NOT {rng.choice(pool)}")
        elif r < 0.65:
            out.append(
                f"({rng.choice(pool)} OR {rng.choice(pool)}) AND {rng.choice(pool)}"
            )
        elif r < 0.8:
            out.append(
                rng.choice(["title:", "url:", "anchor:", "desc:"])
                + rng.choice(pool) + " " + rng.choice(pool)
            )
        else:
            out.append(" ".join(rng.choice(pool)
                                for _ in range(rng.randint(2, 4))))
    return out


@pytest.fixture(scope="module")
def ref_stack(tmp_path_factory):
    builder = _compile(tmp_path_factory, "index_builder", INDEX_SOURCES,
                       INCLUDES)
    query = _compile(tmp_path_factory, "e2e_query", QUERY_SOURCES, INCLUDES)
    termdict = _compile(
        tmp_path_factory, "termdict_driver",
        ["tests/cpp_ref/termdict_driver.cpp",
         f"{REF}/index/src/TermDictionary.cpp"],
        INCLUDES,
    )
    return builder, query, termdict


def _differential_compare(query_exe, work, oracle, queries,
                          min_identical_frac=0.5):
    """Answer ``queries`` through the reference's compiled QueryManager
    over the index at ``work``/index and assert the defect-horizon-exact
    differential documented in the module docstring: full positional
    equality below each query's cursor-defect limit, every divergence
    explained by it, and a substantive fully-identical majority."""
    from mithril_spark.query.shard import TOP_K, evaluate_query
    from mithril_spark.ranking import tokenify_query
    from mithril_spark.text.normalize import STOPWORDS

    shard = oracle.shards[0]
    env = {**os.environ, "MITHRIL_CONF_DIR": f"{REF}/ranking/config"}
    out_path = work + "/answers.txt"
    r = subprocess.run(
        [query_exe, out_path, work + "/index"],
        input=("\n".join(queries) + "\n").encode(),
        env=env, capture_output=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-400:]
    lines = open(out_path).read().splitlines()
    blocks, i = [], 0
    while i < len(lines):
        assert lines[i].startswith("R ")
        n = int(lines[i][2:])
        blk = []
        for j in range(n):
            d, sc, url = lines[i + 1 + j].split(" ", 2)
            blk.append((int(d), int(sc), url))
        assert lines[i + 1 + n] == "END"
        blocks.append(blk)
        i += n + 2
    assert len(blocks) == len(queries)

    def clean_limit(q):
        """First docid whose REFERENCE score may be corrupted by the two
        cursor defects documented in the module docstring; None = none."""
        tokens, _si, _ni = tokenify_query(q)
        matches = [int(m) for m in evaluate_query(q, shard)]
        lim = None

        def upd(v):
            nonlocal lim
            lim = v if lim is None else min(lim, v)

        for term, _m in tokens:
            if term.encode() in STOPWORDS:
                continue
            entry = shard.positions.get(term)
            if entry is not None and len(entry[0]):
                later = [m for m in matches if m > int(entry[0][-1])]
                if later:
                    upd(later[0])  # body cursor exhausts its region
            dentry = shard.positions.get("%" + term)
            if dentry is not None and len(dentry[0]):
                ddocs = [int(x) for x in dentry[0]]
                for m in matches:
                    k = bisect.bisect_left(ddocs, m)
                    if k >= len(ddocs) or ddocs[k] != m:
                        upd(m)  # desc cursor desyncs at its first miss
                        break
        return lim

    fully_identical = 0
    explained = 0
    for q, ref in zip(queries, blocks):
        ours = [(int(d), int(s), u.decode("latin-1"))
                for d, s, u, _t in oracle.top_k(q)]
        if ours == ref:
            fully_identical += 1
            continue
        lim = clean_limit(q)
        assert lim is not None, (
            q, "results differ but no cursor defect applies")
        ours_clean = [t for t in ours if t[0] < lim]
        ref_clean = [t for t in ref if t[0] < lim]
        if len(ours) < TOP_K and len(ref) < TOP_K:
            # unsaturated lists admit every match: the clean prefixes must
            # be positionally identical
            assert ours_clean == ref_clean, (
                q, lim, ours_clean[:3], ref_clean[:3])
        else:
            # a SATURATED top-50 can crowd a clean doc out behind
            # corrupt-eligible (>= lim) competitors whose scores differ
            # between the stacks — seen at 400-doc fuzz scale, where the
            # uint32 wrap packs the list. Common clean docs must still
            # agree exactly and in relative order.
            common = {t[0] for t in ours_clean} & {t[0] for t in ref_clean}
            assert [t for t in ours_clean if t[0] in common] == \
                   [t for t in ref_clean if t[0] in common], (q, lim)
        # every diverging doc is at/above the defect horizon — or a clean
        # doc crowded out of the OTHER, saturated, list by docs above it
        od, rd = dict((d, (s, u)) for d, s, u in ours), dict(
            (d, (s, u)) for d, s, u in ref)
        for d in set(od) | set(rd):
            if od.get(d) != rd.get(d):
                if d < lim:
                    assert (d in od) != (d in rd), (q, d)  # common handled above
                    crowded = ref if d in od else ours
                    assert len(crowded) >= TOP_K, (q, d, lim)
                explained += 1
    # the comparison must be substantive, not vacuously tolerant
    assert fully_identical >= int(len(queries) * min_identical_frac), (
        fully_identical, len(queries))
    assert explained > 0  # the defect model is exercised, not dead code
    return fully_identical, explained


def test_reference_index_and_query_end_to_end(ref_stack, tmp_path_factory):
    from mithril_spark.fixtures import QUERY_SET, generate_pages
    from mithril_spark.oracle import OracleIndex
    from mithril_spark.query.shard import evaluate_query
    from mithril_spark.ranking import tokenify_query
    from mithril_spark.text.docproc import process_page
    from mithril_spark.text.normalize import STOPWORDS

    builder, query_exe, termdict_exe = ref_stack
    work = str(tmp_path_factory.mktemp("e2e"))
    pages = generate_pages(150, seed=42)
    docs = sorted(
        (d for d in (process_page(p["url"].encode(), p["html"])
                     for p in pages) if d is not None),
        key=lambda d: d.url,
    )
    _write_reference_corpus(docs, work + "/crawl")
    r = subprocess.run(
        [builder, work + "/crawl", f"--output={work}/index", "--force",
         "--quiet"],
        capture_output=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-400:]

    # same docid policy by construction: url-sorted dense ids
    oracle = OracleIndex.build(
        [(p["url"].encode(), p["html"]) for p in pages], num_shards=1
    )
    shard = oracle.shards[0]
    assert shard.doc_count == len(docs)

    # FULL dictionary equality: the reference's term dictionary and ours
    # are the same mapping — equal size, and every one of our terms is
    # present with an equal df (injection + equal cardinality = identity).
    # This gates tokenization/decoration/df-counting across the WHOLE
    # index, not just queried terms.
    our_terms = sorted(shard.postings)
    td_in = b"".join(
        b"%d\n%s\n" % (len(t.encode("latin-1")), t.encode("latin-1"))
        for t in our_terms
    )
    td_out = work + "/termdict.txt"
    r = subprocess.run([termdict_exe, td_out, work + "/index"],
                       input=td_in, capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr[-300:]
    td_lines = open(td_out).read().splitlines()
    assert td_lines[0] == f"SIZE {len(our_terms)}", (
        td_lines[0], len(our_terms))
    assert len(td_lines) == len(our_terms) + 1
    for t, line in zip(our_terms, td_lines[1:]):
        assert int(line) == len(shard.postings[t][0]), (
            t, line, len(shard.postings[t][0]))

    queries = list(QUERY_SET) + _extra_queries()
    _differential_compare(query_exe, work, oracle, queries)


def test_reference_multi_worker_merge_end_to_end(ref_stack, tmp_path_factory):
    """Two reference indexes (our shard split, local docids) answered by
    QueryManager's multi-worker path must merge to our 2-shard
    answer_query_on_shards output — gating the coordinator k-way merge and
    per-worker scoring together. Compared as (score, url) sequences (the
    reference returns worker-local docids); restricted to queries where no
    cursor defect (see module docstring) touches either shard."""
    from mithril_spark.fixtures import QUERY_SET, generate_pages
    from mithril_spark.oracle import OracleIndex
    from mithril_spark.query.shard import evaluate_query
    from mithril_spark.ranking import tokenify_query
    from mithril_spark.text.docproc import process_page
    from mithril_spark.text.normalize import STOPWORDS

    builder, query_exe, _termdict = ref_stack
    work = str(tmp_path_factory.mktemp("e2e_multi"))
    pages = generate_pages(150, seed=42)
    docs = sorted(
        (d for d in (process_page(p["url"].encode(), p["html"])
                     for p in pages) if d is not None),
        key=lambda d: d.url,
    )
    oracle = OracleIndex.build(
        [(p["url"].encode(), p["html"]) for p in pages], num_shards=2
    )
    shard_size = oracle.shards[0].doc_count
    # write one reference corpus per shard with LOCAL ids (the reference's
    # workers are independent indexes with their own docid spaces)
    index_dirs = []
    for s, shard in enumerate(oracle.shards):
        part = docs[s * shard_size:(s + 1) * shard_size]
        crawl = f"{work}/crawl_{s}"
        _write_reference_corpus(part, crawl)
        out = f"{work}/index_{s}"
        r = subprocess.run([builder, crawl, f"--output={out}", "--force",
                            "--quiet"], capture_output=True, timeout=300)
        assert r.returncode == 0, r.stderr[-400:]
        index_dirs.append(out)

    def shard_clean(q, shard) -> bool:
        tokens, _si, _ni = tokenify_query(q)
        matches = [int(m) for m in evaluate_query(q, shard)]
        for term, _m in tokens:
            if term.encode() in STOPWORDS:
                continue
            entry = shard.positions.get(term)
            if entry is not None and len(entry[0]):
                if any(m > int(entry[0][-1]) for m in matches):
                    return False
            dentry = shard.positions.get("%" + term)
            if dentry is not None and len(dentry[0]):
                ddocs = [int(x) for x in dentry[0]]
                for m in matches:
                    k = bisect.bisect_left(ddocs, m)
                    if k >= len(ddocs) or ddocs[k] != m:
                        return False
        return True

    queries = list(QUERY_SET)
    env = {**os.environ, "MITHRIL_CONF_DIR": f"{REF}/ranking/config"}
    out_path = work + "/answers.txt"
    r = subprocess.run(
        [query_exe, out_path, *index_dirs],
        input=("\n".join(queries) + "\n").encode(),
        env=env, capture_output=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-400:]
    lines = open(out_path).read().splitlines()
    blocks, i = [], 0
    while i < len(lines):
        n = int(lines[i][2:])
        blk = []
        for j in range(n):
            _d, sc, url = lines[i + 1 + j].split(" ", 2)
            blk.append((int(sc), url))
        blocks.append(blk)
        i += n + 2
    assert len(blocks) == len(queries)

    compared = 0
    for q, ref in zip(queries, blocks):
        if not all(shard_clean(q, s) for s in oracle.shards):
            continue
        ours = [(int(s), u.decode("latin-1"))
                for _d, s, u, _t in oracle.top_k(q)]
        assert ours == ref, (q, ours[:3], ref[:3])
        compared += 1
    assert compared >= len(queries) // 3, compared


@pytest.mark.slow
def test_reference_e2e_fuzz_scale(ref_stack, tmp_path_factory):
    """The 400-doc / 200-query differential (previously an offline run
    mentioned in README — VERDICT r03 #7), landed as a reproducible,
    deselected-by-default runner: the same defect-horizon-exact instrument
    as test_reference_index_and_query_end_to_end at ~3x corpus and ~4x
    query-fuzz volume and a fresh fuzz seed.

        python -m pytest tests/test_cpp_e2e.py -m slow -q
    """
    from mithril_spark.fixtures import QUERY_SET, generate_pages
    from mithril_spark.oracle import OracleIndex
    from mithril_spark.text.docproc import process_page

    builder, query_exe, _termdict = ref_stack
    work = str(tmp_path_factory.mktemp("e2e_fuzz"))
    pages = generate_pages(400, seed=42)
    docs = sorted(
        (d for d in (process_page(p["url"].encode(), p["html"])
                     for p in pages) if d is not None),
        key=lambda d: d.url,
    )
    _write_reference_corpus(docs, work + "/crawl")
    r = subprocess.run(
        [builder, work + "/crawl", f"--output={work}/index", "--force",
         "--quiet"],
        capture_output=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-400:]
    oracle = OracleIndex.build(
        [(p["url"].encode(), p["html"]) for p in pages], num_shards=1
    )
    queries = list(QUERY_SET) + _extra_queries(
        n=200 - len(QUERY_SET), seed=4242)
    assert len(queries) == 200
    # the byte-layout cursor defects bite more queries at 400 docs (longer
    # posting regions exhaust more often), so fewer queries are fully
    # identical than at 150 — but every divergence must still be explained
    _differential_compare(query_exe, work, oracle, queries,
                          min_identical_frac=0.4)


@pytest.mark.slow
def test_reference_e2e_fuzz_800(ref_stack, tmp_path_factory):
    """800 docs / 300 queries, a third fuzz seed: at this scale the
    defect horizon covers most ranked tails (~45% of queries stay fully
    identical), so the substantive assertion is the attribution one —
    every one of ~2k divergent result docs must be machine-explained by
    the two documented cursor defects, with zero unexplained."""
    from mithril_spark.fixtures import QUERY_SET, generate_pages
    from mithril_spark.oracle import OracleIndex
    from mithril_spark.text.docproc import process_page

    builder, query_exe, _termdict = ref_stack
    work = str(tmp_path_factory.mktemp("e2e_fuzz800"))
    pages = generate_pages(800, seed=42)
    docs = sorted(
        (d for d in (process_page(p["url"].encode(), p["html"])
                     for p in pages) if d is not None),
        key=lambda d: d.url,
    )
    _write_reference_corpus(docs, work + "/crawl")
    r = subprocess.run(
        [builder, work + "/crawl", f"--output={work}/index", "--force",
         "--quiet"],
        capture_output=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-400:]
    oracle = OracleIndex.build(
        [(p["url"].encode(), p["html"]) for p in pages], num_shards=1
    )
    queries = list(QUERY_SET) + _extra_queries(
        n=300 - len(QUERY_SET), seed=31337)
    fully_identical, explained = _differential_compare(
        query_exe, work, oracle, queries, min_identical_frac=0.3)
    assert explained > 500  # the attribution machinery is doing real work


@pytest.mark.slow
def test_reference_e2e_fuzz_1600(ref_stack, tmp_path_factory):
    """1600 docs / 400 queries, a fourth fuzz seed — the largest committed
    point on the differential-scale curve (150 -> 400 -> 800 -> 1600).
    Position regions are ~4x the 400-doc runner's, so the two documented
    cursor defects (module docstring) dominate even more ranked tails;
    the load-bearing assertion is attribution exhaustiveness: every
    divergent result doc machine-explained, zero unexplained."""
    from mithril_spark.fixtures import QUERY_SET, generate_pages
    from mithril_spark.oracle import OracleIndex
    from mithril_spark.text.docproc import process_page

    builder, query_exe, _termdict = ref_stack
    work = str(tmp_path_factory.mktemp("e2e_fuzz1600"))
    pages = generate_pages(1600, seed=42)
    docs = sorted(
        (d for d in (process_page(p["url"].encode(), p["html"])
                     for p in pages) if d is not None),
        key=lambda d: d.url,
    )
    _write_reference_corpus(docs, work + "/crawl")
    r = subprocess.run(
        [builder, work + "/crawl", f"--output={work}/index", "--force",
         "--quiet"],
        capture_output=True, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-400:]
    oracle = OracleIndex.build(
        [(p["url"].encode(), p["html"]) for p in pages], num_shards=1
    )
    queries = list(QUERY_SET) + _extra_queries(
        n=400 - len(QUERY_SET), seed=90210)
    fully_identical, explained = _differential_compare(
        query_exe, work, oracle, queries, min_identical_frac=0.2)
    assert explained > 1000  # attribution at the largest committed scale


@pytest.mark.slow
def test_reference_e2e_fuzz_3200(ref_stack, tmp_path_factory):
    """3200 docs / 500 queries, a fifth fuzz seed — extends the
    differential-scale curve (150 -> 400 -> 800 -> 1600 -> 3200). At this
    scale nearly every multi-term ranked tail crosses the reference's
    position-cursor defect horizon, so full identity is rare and the
    entire weight rests on attribution exhaustiveness: every divergent
    result doc machine-explained by the two documented cursor defects,
    zero unexplained."""
    from mithril_spark.fixtures import QUERY_SET, generate_pages
    from mithril_spark.oracle import OracleIndex
    from mithril_spark.text.docproc import process_page

    builder, query_exe, _termdict = ref_stack
    work = str(tmp_path_factory.mktemp("e2e_fuzz3200"))
    pages = generate_pages(3200, seed=42)
    docs = sorted(
        (d for d in (process_page(p["url"].encode(), p["html"])
                     for p in pages) if d is not None),
        key=lambda d: d.url,
    )
    _write_reference_corpus(docs, work + "/crawl")
    r = subprocess.run(
        [builder, work + "/crawl", f"--output={work}/index", "--force",
         "--quiet"],
        capture_output=True, timeout=3600,
    )
    assert r.returncode == 0, r.stderr[-400:]
    oracle = OracleIndex.build(
        [(p["url"].encode(), p["html"]) for p in pages], num_shards=1
    )
    queries = list(QUERY_SET) + _extra_queries(
        n=500 - len(QUERY_SET), seed=777001)
    fully_identical, explained = _differential_compare(
        query_exe, work, oracle, queries, min_identical_frac=0.1)
    assert explained > 1500  # attribution at the largest committed scale
