"""Deterministic synthetic `pages` corpus generator (FIXTURES.md §1).

Seeded (default 42), no wall-clock, shaped like the production input table
``pages(url, warc_ts, html, text, lang)``. The HTML grammar exercises every
reference parser branch: title routing, discard sections with tag-like junk,
comments containing '>', anchors (incl. %XX hrefs and nesting), base/embed/
meta (description, robots noindex, property), <html lang>, named/numeric/
invalid entities, acronym/number/punctuation token shapes, stopwords, and
adjacent word runs for quote/phrase queries.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

VOCAB = [
    "search", "engine", "index", "ranking", "crawler", "parser", "query",
    "vector", "matrix", "tensor", "spark", "shuffle", "partition", "mithril",
    "forge", "anvil", "hammer", "quartz", "basalt", "granite", "marble",
    "python", "lambda", "stream", "batch", "window", "join", "filter",
    "bloom", "sketch", "hash", "tree", "graph", "node", "edge", "page",
    "web", "text", "token", "term", "document", "corpus", "shard", "block",
    "delta", "codec", "score", "rank", "title", "anchor", "cache", "memory",
]
STOP_SAMPLE = ["the", "and", "of", "to", "in", "is", "for", "with", "on", "by"]
ACRONYMS = ["NASA", "HTML", "BM25", "API", "GPU", "JSON", "HTTP"]
ODD_TOKENS = [
    "3.14159", "2024", "foo|bar", "a=b", "www.example", "site.com",
    "x" * 70, "don't", "re-index", "C3PO", "半角", "café",
]
ENTITY_SNIPPETS = [
    "&amp;", "&lt;tag&gt;", "&nbsp;", "&alpha;&beta;", "&rsquo;", "&#65;",
    "&#x42;", "&#160;", "&bogus;", "&#xZZ;", "&#; ", "&unterminated",
    "&hellip;", "&euro;100",
]

DOMAINS = [
    ("https", "en.wikipedia.org", True),
    ("https", "github.com", True),
    ("https", "nature.com", True),
    ("https", "example.org", False),
    ("http", "blog.example.net", False),
    ("https", "news.site42.io", False),
    ("http", "a.b.c.deepsub.example.com", False),
    ("https", "averyveryverylongdomainname.info", False),
    ("https", "www.stackoverflow.com", False),
]
EXTENSIONS = [".html", ".php", "", ".htm", ".zip", ".asp"]


# A wide tail vocabulary (deterministic) so document frequencies of typical
# query terms sit well below N/2 — exercising the positive-idf BM25 regime,
# not just the uint32-wrap corner the tiny VOCAB alone would produce.
_ROOTS = [
    "gran", "bas", "quar", "ferr", "alum", "sil", "carb", "oxid", "hydr",
    "therm", "electr", "magn", "photo", "chrono", "geo", "bio", "astro",
    "micro", "macro", "poly", "mono", "iso", "meta", "para", "proto",
    "pseudo", "semi", "ultra", "infra", "hyper", "neuro", "cardio",
]
_SUFFIXES = [
    "ite", "ium", "ate", "ide", "ine", "one", "ase", "gen", "lith", "morph",
    "phase", "tron", "scope", "graph", "meter", "pod", "derm",
]
TAIL_VOCAB = [r + s for r in _ROOTS for s in _SUFFIXES]  # 544 words


def _words(rng: random.Random, n: int, *, stopword_rate: float = 0.3,
           topic: list[str] | None = None) -> list[str]:
    out = []
    for _ in range(n):
        r = rng.random()
        if r < stopword_rate:
            out.append(rng.choice(STOP_SAMPLE))
        elif r < stopword_rate + 0.05:
            out.append(rng.choice(ACRONYMS))
        elif r < stopword_rate + 0.08:
            out.append(rng.choice(ODD_TOKENS))
        elif topic is not None and r < stopword_rate + 0.48:
            out.append(rng.choice(topic))
        else:
            out.append(rng.choice(VOCAB))
    return out


def _make_url(rng: random.Random, i: int) -> str:
    scheme, domain, _ = DOMAINS[i % len(DOMAINS)]
    depth = rng.randint(0, 4)
    parts = [rng.choice(VOCAB) for _ in range(depth)]
    ext = rng.choice(EXTENSIONS)
    # 'd{i}' path segment makes every url unique by construction, which keeps
    # per-page generation independent (distributable via spark.range).
    path = "/".join(parts + [f"d{i}"])
    url = f"{scheme}://{domain}/{path}"
    if ext:
        url += ext
    if rng.random() < 0.2:
        url += f"?q={rng.choice(VOCAB)}&page={rng.randint(1, 3)}"
    if rng.random() < 0.1:
        url += f"/{rng.randint(10000, 99999)}"
    return url


def _make_html(rng: random.Random, i: int, scale: int = 1,
               n_pages: int | None = None, seed: int = 42) -> tuple[str, str]:
    """Returns (html, lang_attr); `scale` multiplies body size.

    With ``n_pages`` given, pages cross-link each other (deterministic
    targets regenerated from the target's own rng) so the link graph has
    real in-corpus edges — needed for a non-degenerate PageRank."""
    lang_roll = rng.random()
    if lang_roll < 0.75:
        lang = "en"
    elif lang_roll < 0.82:
        lang = rng.choice(["en-US", "en_GB"])
    elif lang_roll < 0.92:
        lang = rng.choice(["fr", "de", "zh"])
    else:
        lang = ""

    # per-doc topic: a narrow sample of the wide tail vocabulary, so most
    # content terms appear in only a small fraction of documents
    topic = [TAIL_VOCAB[rng.randrange(len(TAIL_VOCAB))] for _ in range(24)]
    title = " ".join(_words(rng, rng.randint(2, 7), stopword_rate=0.15,
                            topic=topic))
    has_title = rng.random() > 0.06
    noindex = rng.random() < 0.04
    desc = " ".join(_words(rng, rng.randint(4, 12), topic=topic))

    body_chunks: list[str] = []
    n_paras = rng.randint(2, 6) * scale
    for _ in range(n_paras):
        para = _words(rng, rng.randint(10, 60), topic=topic)
        # seed adjacent runs for quote/phrase queries
        if rng.random() < 0.15:
            para.extend(["search", "engine"])
        if rng.random() < 0.1:
            para.extend(["open", "source", "spark", "engine"])
        if rng.random() < 0.25:
            para.append(rng.choice(ENTITY_SNIPPETS))
        tag = rng.choice(["p", "div", "li", "section", "unknowntag", "b"])
        body_chunks.append(f"<{tag}>" + " ".join(para) + f"</{tag}>")

    if rng.random() < 0.4:
        body_chunks.append(
            "<script type=\"text/javascript\">var x = '<fake>'; if (a > b) { run(); }</script>"
        )
    if rng.random() < 0.25:
        body_chunks.append("<style>.cls > p { color: red; }</style>")
    if rng.random() < 0.2:
        body_chunks.append("<svg viewBox=\"0 0 1 1\"><path d=\"M0 0\"/></svg>")
    if rng.random() < 0.3:
        body_chunks.append("<!-- comment with > inside and <tags> too -->")
    if rng.random() < 0.5:
        href = rng.choice([
            "https://example.org/linked",
            "/relative/p%41th",
            "https://github.com/repo?a=1&b=2",
        ])
        body_chunks.append(
            f'<a href="{href}">anchor {rng.choice(VOCAB)} text</a>'
        )
    if rng.random() < 0.1:
        body_chunks.append('<a href="/x">outer <a href="/y">nested</a>')
    if n_pages and n_pages > 1 and rng.random() < 0.7:
        # in-corpus cross links: page j's url is a pure function of (seed, j)
        for _ in range(rng.randint(1, 3)):
            j = rng.randrange(n_pages)
            target = _make_url(random.Random((seed << 32) ^ j), j)
            body_chunks.append(
                f'<a href="{target}">see {rng.choice(VOCAB)}</a>'
            )
    if rng.random() < 0.15:
        body_chunks.append('<embed src="https://cdn.example.org/media.mp4">')
    if rng.random() < 0.1:
        body_chunks.append('<base href="https://base.example.org/">')

    rng.shuffle(body_chunks)

    head = []
    if has_title:
        head.append(f"<title>{title}</title>")
    head.append(f'<meta name="description" content="{desc}">')
    if noindex:
        head.append('<meta name="robots" content="noindex, nofollow">')
    if rng.random() < 0.3:
        head.append('<meta property="og:type" content="article">')

    lang_attr = f' lang="{lang}"' if lang else ""
    html = (
        f"<!DOCTYPE html><html{lang_attr}><head>" + "".join(head) + "</head><body>"
        + "\n".join(body_chunks)
        + "</body></html>"
    )
    return html, lang


def generate_page(i: int, seed: int = 42, scale: int = 1,
                  n_pages: int | None = None) -> dict:
    """Deterministic page #i — independent of all other pages, so the corpus
    can be generated distributed (each executor materializes its id range).
    ``n_pages`` (corpus size) only steers deterministic cross-link targets."""
    rng = random.Random((seed << 32) ^ i)
    t0 = datetime(2025, 1, 1, tzinfo=timezone.utc)
    url = _make_url(rng, i)
    html, lang = _make_html(rng, i, scale=scale, n_pages=n_pages, seed=seed)
    return {
        "url": url,
        "warc_ts": t0 + timedelta(seconds=17 * i),
        "html": html.encode("utf-8"),
        "text": None,
        "lang": lang,
    }


def generate_pages(n: int, seed: int = 42, scale: int = 1) -> list[dict]:
    """Rows of the `pages` table: url, warc_ts, html(bytes), text(None), lang."""
    return [generate_page(i, seed, scale, n_pages=n) for i in range(n)]


def generate_pages_df(spark, n: int, seed: int = 42, scale: int = 1,
                      partitions: int | None = None):
    """Distributed deterministic corpus: spark.range -> per-id generation."""
    import pyarrow as pa

    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism * 2, 8)

    def gen(batches):
        for batch in batches:
            ids = batch.column("id").to_pylist()
            rows = [generate_page(i, seed, scale, n_pages=n) for i in ids]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([r["url"] for r in rows], pa.string()),
                    pa.array([r["warc_ts"] for r in rows],
                             pa.timestamp("us", tz="UTC")),
                    pa.array([r["html"] for r in rows], pa.binary()),
                    pa.array([r["text"] for r in rows], pa.string()),
                    pa.array([r["lang"] for r in rows], pa.string()),
                ],
                names=["url", "warc_ts", "html", "text", "lang"],
            )

    return spark.range(0, n, numPartitions=partitions).mapInArrow(
        gen, schema=PAGES_SCHEMA
    )


def _b26(r: int) -> str:
    s = ""
    for _ in range(3):
        s += chr(ord("a") + r % 26)
        r //= 26
    return s


def zipf_term(r: int) -> str:
    """Name of zipf rank-r term (alpha-only so tokenization is trivial)."""
    return "zq" + _b26(r)


def generate_zipf_pages(n: int, seed: int = 7, n_terms: int = 2000) -> list[dict]:
    """Zipfian-df corpus: block-max WAND skip evidence needs df spread.

    Term ``zipf_term(r)`` (r in 0..n_terms) appears in exactly the docs
    ``i % (r+1) == off(r)`` (off is a deterministic per-term offset so doc 0
    isn't a universal attractor), giving df(r) = ~n/(r+1) — three decades of
    document frequency, the spread the flat `generate_pages` vocabulary
    lacks (its tail words all sit near df ~n/25, so rare-term posting gaps
    stay under the 128-doc block size and nothing ever skips).

    URLs are zero-padded in generation order, so url-rank docids == i and
    the modular posting gaps survive docid assignment; contiguous-range
    sharding (indexer `doc_id // shard_size`) preserves them per shard.
    """
    t0 = datetime(2025, 1, 1, tzinfo=timezone.utc)
    term_ranks: list[list[int]] = [[] for _ in range(n)]
    for r in range(n_terms):
        step = r + 1
        off = (r * 2654435761) % step
        for i in range(off, n, step):
            term_ranks[i].append(r)
    pages = []
    for i in range(n):
        rng = random.Random((seed << 32) ^ i)
        body: list[str] = []
        for j, r in enumerate(term_ranks[i]):
            body.append(zipf_term(r))
            if (i + j) % 3 == 0:  # tf variation (deterministic)
                body.append(zipf_term(r))
        body += [rng.choice(VOCAB) for _ in range(rng.randint(20, 80))]
        rng.shuffle(body)
        title = f"zipf {rng.choice(VOCAB)} {rng.choice(VOCAB)}"
        html = (
            f'<!DOCTYPE html><html lang="en"><head><title>{title}</title>'
            f'</head><body><p>{" ".join(body)}</p></body></html>'
        )
        pages.append({
            "url": f"https://zipf.example.org/p{i:06d}",
            "warc_ts": t0 + timedelta(seconds=i),
            "html": html.encode("utf-8"),
            "text": None,
            "lang": "en",
        })
    return pages


# The fixture query set (FIXTURES.md §3): covers every grammar production.
QUERY_SET = [
    "hello",
    "search",
    "search engine",
    "search AND engine",
    "search OR quartz",
    "NOT quartz",
    "search NOT engine",
    "(spark OR quartz) engine",
    '"search engine"',
    "'open spark'",
    "title:engine",
    "url:github",
    "desc:ranking",
    "anchor:anchor",
    "the AND search",
    "NASA",
    "BM25 ranking",
    "engine title:engine \"search engine\"",
    "spark shuffle partition",
    "granite OR marble OR basalt",
    "zzzznonexistent",
    "the of and",
    "index NOT (spark OR engine)",
    "'spark engine'",
    "crawler parser query ranking",
    # selective tail-vocabulary terms (positive-idf regime)
    "thermite",
    "photograph OR neurotron",
    "electrite magnscope",
    "title:isotron",
    "polygen AND search",
]


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_to_df(spark, rows: list[dict]):
    """Materialize generated pages as the canonical `pages` DataFrame."""
    data = [
        (r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows
    ]
    return spark.createDataFrame(data, schema=PAGES_SCHEMA)
