"""Per-document indexing pipeline shared by the oracle and the Spark UDFs.

Reference semantics: /root/reference/index/src/InvertedIndex.cpp:183-307
(``processField`` / ``IndexBuilder::process_document``) and
/root/reference/crawler/src/Worker.cpp:145-206 (admission + description).

One call = one crawled page: parse HTML, apply the admission filter, then
produce term frequencies, per-term field flags + flattened positions, and the
doc-map metadata row. The Spark indexer runs this inside ``mapInArrow``; the
oracle runs it directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .htmlparse import ParsedDocument, get_words, parse_document
from .normalize import (
    BODY,
    DESC,
    FIELD_FLAG,
    TITLE,
    URL,
    _NORM_CACHES,
    language_allowed,
    normalize,
    robots_nofollow,
    robots_noindex,
    should_store_positions,
    tokenize_url,
)

U16_MAX = 0xFFFF


@dataclass
class DocTerms:
    """Everything the index needs from one admitted document."""

    url: bytes
    title_words: list[bytes]
    desc_words: list[bytes]
    body_words: list[bytes]
    term_freqs: dict[bytes, int] = field(default_factory=dict)
    # term -> (field_flags, flat positions in field-index order BODY..DESC)
    term_positions: dict[bytes, tuple[int, list[int]]] = field(default_factory=dict)
    body_len: int = 0
    title_len: int = 0
    url_len: int = 0
    desc_len: int = 0
    total_term_count: int = 0
    # absolutized + canonicalized forward links (crawler Worker.cpp:195,
    # GetFollowURLs) — duplicates preserved; empty when robots nofollow
    forward_links: list[bytes] = field(default_factory=list)

    @property
    def text(self) -> bytes:
        """The extracted-text invariant: space-joined body words."""
        return b" ".join(self.body_words)


def _process_field(
    words: list[bytes],
    fld: int,
    term_freqs: dict[bytes, int],
    raw_positions: dict[bytes, list],
) -> int:
    """processField (InvertedIndex.cpp:183-211); returns kept-token count.

    ``raw_positions`` maps term -> ``[field_flags, flat_positions]``: because
    ``build_doc_terms`` processes fields in FIELD-INDEX order (BODY, TITLE,
    URL, DESC — the same order PositionIndex.cpp:81-99 flattens them), each
    field's positions append directly onto one flat list, identical to the
    old per-field-bucket + flatten pass but without allocating five lists
    per distinct term (~28% off the per-doc term accumulation)."""
    pos = 0
    tracking = True
    flag = FIELD_FLAG[fld]
    kept = 0
    # hot loop: hit the normalize memo directly (no call on repeats) and
    # bind dict methods once — same computation, fewer interpreter steps
    cache = _NORM_CACHES[fld]
    tf_get = term_freqs.get
    rp_get = raw_positions.get
    for word in words:
        normalized = cache.get(word)
        if normalized is None:
            normalized = normalize(word, fld)
        if normalized:
            term_freqs[normalized] = tf_get(normalized, 0) + 1
            kept += 1
            if tracking:
                if pos < U16_MAX:
                    entry = rp_get(normalized)
                    if entry is None:
                        entry = [0, []]
                        raw_positions[normalized] = entry
                    entry[0] |= flag
                    entry[1].append(pos)
                    pos += 1
                else:
                    tracking = False
    return kept


def extract_page(url: bytes, html: bytes) -> tuple[ParsedDocument, bool]:
    """Parse + admission filter (Worker.cpp:145-175). Returns (parsed, admitted)."""
    parsed = parse_document(html)
    if not parsed.title_words or not parsed.words:
        return parsed, False
    if not language_allowed(parsed.lang):
        return parsed, False
    if robots_noindex(parsed.metas):
        return parsed, False
    return parsed, True


def description_words(parsed: ParsedDocument) -> list[bytes]:
    desc = parsed.metas.get(b"description")
    return get_words(desc) if desc is not None else []


def build_doc_terms(url: bytes, parsed: ParsedDocument) -> DocTerms:
    """process_document (InvertedIndex.cpp:215-307) for one admitted page."""
    doc = DocTerms(
        url=url,
        title_words=parsed.title_words,
        desc_words=description_words(parsed),
        body_words=parsed.words,
    )
    raw_positions: dict[bytes, list] = {}
    total = 0
    url_tokens = tokenize_url(url)
    # Fields are processed in FIELD-INDEX order (BODY=0, TITLE=1, URL=2,
    # DESC=4) so each term's positions accumulate pre-flattened in the
    # order PositionIndex.cpp:81-99 emits them. Per-field position spaces
    # are independent (pos resets per field) and freq/len sums are
    # order-insensitive, so this equals the reference's processing order
    # (InvertedIndex.cpp:215-307) on every output.
    total += _process_field(doc.body_words, BODY, doc.term_freqs, raw_positions)
    total += _process_field(doc.title_words, TITLE, doc.term_freqs, raw_positions)
    total += _process_field(url_tokens, URL, doc.term_freqs, raw_positions)
    total += _process_field(doc.desc_words, DESC, doc.term_freqs, raw_positions)
    doc.total_term_count = total

    doc.body_len = len(doc.body_words)
    doc.title_len = len(doc.title_words)
    doc.url_len = len(url_tokens)
    doc.desc_len = len(doc.desc_words)

    # Keep positions only for selected terms (InvertedIndex.cpp:263-286 +
    # PositionIndex.cpp:81-99); the flat list is already in field-index
    # order by construction.
    for term, (flags, flat) in raw_positions.items():
        freq = doc.term_freqs[term]
        if should_store_positions(term, freq, doc.total_term_count):
            doc.term_positions[term] = (flags, flat)
    return doc


def process_page(url: bytes, html: bytes) -> DocTerms | None:
    """Full per-page pipeline; None when the page fails admission."""
    parsed, admitted = extract_page(url, html)
    if not admitted:
        return None
    doc = build_doc_terms(url, parsed)
    if not robots_nofollow(parsed.metas):
        from .links import follow_urls

        doc.forward_links = follow_urls(
            url, parsed.base or b"", [u for u, _anchor in parsed.links]
        )
    return doc
