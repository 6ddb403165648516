"""Single-pass HTML word-break parser, byte-faithful to the reference.

Reference semantics: /root/reference/common/src/html/Parser.cpp:299-459
(helpers :29-296), tag table /root/reference/common/include/html/Tags.h:48-210,
rules /root/reference/common/include/html/Parser.h:29-74. Everything operates
on ``bytes`` (the reference operates on the raw response body), which is what
makes the per-url byte-identical extracted-text invariant checkable.

Faithfully reproduced quirks (these are load-bearing for parity):

* Tag names NOT in the recognized table are *discarded as tags* — the lookup's
  fallthrough returns Discard, not OrdinaryText (reference Tags.cpp binary
  search), despite its own comment saying otherwise.
* A recognized tag with no closing ``>`` before end-of-buffer terminates
  parsing of the whole document (``HandleTagAction`` returns nullptr).
* Discard sections (``script``/``style``/``svg``/``symbol``/``defs``) are
  closed by a *case-sensitive* end-tag name match (Parser.cpp:378-386).
* Comment scan requires the closing ``>`` to be preceded by ``--``, honouring
  quote-skipping in ``EndingOfTag`` (Parser.cpp:198-205).
* ``%XX`` URL-decoding only accepts uppercase hex and keeps RFC 3986 reserved
  characters encoded (URL.cpp:454-497).
"""

from __future__ import annotations

import re

from .entities import decode_html_string

SPACE_BYTES = frozenset(b" \t\n\r\f\v")
_SPACE = b" \t\n\r\f\v"

# C-speed scanners for the hot per-byte loops. Each pattern is exactly the
# byte-class the loop it replaces tested, so the scan positions are
# identical — the byte-identity differential (test_spark_engine /
# test_cpp_differential) is the gate.
_WS_OR_LT_RE = re.compile(rb"[< \t\n\r\f\v]")  # text-run boundary
_NONSPACE_RE = re.compile(rb"[^ \t\n\r\f\v]")  # whitespace-run end
_NAME_END_RE = re.compile(rb"[ \t\n\r\f\v>]")  # tag-name boundary
_GT_OR_QUOTE_RE = re.compile(rb"[>\"']")  # tag-end scan stops

# Actions (Tags.h:26)
ORDINARY, TITLE, COMMENT, DISCARD, DISCARD_SECTION, ANCHOR, BASE, EMBED, META, HTML_TAG = range(10)

# Tag table values transcribed from Tags.h:48-210 (data, not code). Only
# non-Discard actions need listing: the lookup falls through to DISCARD for
# every *other* name too, so membership in the original table only matters
# for these special actions.
_SPECIAL_TAGS = {
    b"!--": COMMENT,
    b"a": ANCHOR,
    b"base": BASE,
    b"defs": DISCARD_SECTION,
    b"embed": EMBED,
    b"html": HTML_TAG,
    b"meta": META,
    b"script": DISCARD_SECTION,
    b"style": DISCARD_SECTION,
    b"svg": DISCARD_SECTION,
    b"symbol": DISCARD_SECTION,
    b"title": TITLE,
}

MAX_LINKS_IN_A_DOCUMENT = 5000

_ASCII_LOWER = bytes(
    c + 32 if 0x41 <= c <= 0x5A else c for c in range(256)
)


def lookup_possible_tag(name: bytes) -> int:
    """Case-insensitive tag lookup; unknown names -> DISCARD (reference quirk)."""
    return _SPECIAL_TAGS.get(name.translate(_ASCII_LOWER), DISCARD)


def get_words(s: bytes) -> list[bytes]:
    """Split on C ``isspace`` bytes, drop empties (Util.cpp:93-110)."""
    return s.split()  # bytes.split() splits exactly on ASCII whitespace incl. \v\f


_RESERVED = frozenset(b":/?#[]@!$&'()*+,;=")


def decode_url(u: bytes) -> bytes:
    """Percent-decode with uppercase-hex-only digits, keeping reserved chars."""
    if b"%" not in u:
        return u
    out = bytearray()
    i = 0
    n = len(u)
    while i < n:
        c = u[i]
        if c == 0x25 and i + 2 < n:  # '%' with two following bytes available
            high = u[i + 1]
            if 0x30 <= high <= 0x39:
                v = (high - 0x30) << 4
            elif 0x41 <= high <= 0x46:
                v = (high - 0x41 + 10) << 4
            else:
                out.append(c)
                i += 1
                continue
            low = u[i + 2]
            if 0x30 <= low <= 0x39:
                v |= low - 0x30
            elif 0x41 <= low <= 0x46:
                v |= low - 0x41 + 10
            else:
                out.append(c)
                i += 1
                continue
            if v not in _RESERVED:
                out.append(v)
                i += 3
            else:
                out.append(c)
                i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out)


class ParsedDocument:
    __slots__ = ("words", "title_words", "links", "metas", "base", "lang")

    def __init__(self) -> None:
        self.words: list[bytes] = []
        self.title_words: list[bytes] = []
        self.links: list[tuple[bytes, list[bytes]]] = []  # (url, anchor_text)
        self.metas: dict[bytes, bytes] = {}
        self.base: bytes = b""
        self.lang: bytes = b""


def _name_ending_of_tag(s: bytes, start: int, n: int) -> int:
    """Scan to whitespace/'>' from ``start``; '!--' found mid-name ends it.

    Equivalence note: an '!--' whose '!' precedes the boundary has both
    '-' bytes before it too ('-' is not a boundary byte), so searching the
    needle inside [start, boundary) reproduces the per-byte scan exactly.
    """
    m = _NAME_END_RE.search(s, start, n)
    bnd = m.start() if m else n
    j = s.find(b"!--", start, bnd)
    return j + 3 if j != -1 else bnd


def _ending_of_tag(s: bytes, i: int, n: int) -> int | None:
    """Position of closing '>' skipping quoted attr values; None if unclosed."""
    while i < n:
        m = _GT_OR_QUOTE_RE.search(s, i, n)
        if m is None:
            return None
        i = m.start()
        c = s[i]
        if c == 0x3E:  # '>'
            return i
        # '"' or "'": skip to the matching close quote (unbounded find,
        # past n, exactly as the byte loop did)
        k = s.find(b'"' if c == 0x22 else b"'", i + 1)
        if k == -1:
            return None
        i = k + 1
    return None


def _after_ending_of_tag(s: bytes, i: int, n: int) -> int | None:
    e = _ending_of_tag(s, i, n)
    return None if e is None else e + 1


def _process_tag_attributes(s: bytes, start: int, end: int, attr: bytes) -> bytes:
    """Find ``attr="value"`` scanning whitespace-delimited tokens (Parser.cpp:121-174)."""
    alen = len(attr)
    while start < end:
        while start < end and s[start] in SPACE_BYTES:
            start += 1
        if start >= end or s[start] == 0x3E:  # '>'
            return b""
        remaining = end - start
        if remaining >= alen + 1 and s[start : start + alen] == attr and s[start + alen] == 0x3D:  # '='
            start += alen + 1
            while start < end and s[start] in SPACE_BYTES:
                start += 1
            if start < end and (s[start] == 0x22 or s[start] == 0x27):
                quote = s[start]
                start += 1
                attr_start = start
                k = s.find(bytes((quote,)), start, end)
                if k != -1:
                    return s[attr_start:k]
                start = end  # consumed to end without closing quote
        # Skip non-matching token
        while start < end and s[start] not in SPACE_BYTES and s[start] != 0x3E:
            if (s[start] == 0x22 or s[start] == 0x27) and s[start - 1] == 0x3D:
                quote = s[start]
                start += 1
                k = s.find(bytes((quote,)), start, end)
                start = end if k == -1 else k
                continue
            start += 1
    return b""


def parse_document(doc: bytes, parsed: ParsedDocument | None = None) -> ParsedDocument:
    """Transcription of ParseDocument (Parser.cpp:299-459) over bytes."""
    if parsed is None:
        parsed = ParsedDocument()
    words = parsed.words
    title_words = parsed.title_words
    links = parsed.links
    metas = parsed.metas

    n = len(doc)
    i = 0

    in_title = False
    in_anchor = False
    discard_section = False
    base_done = False
    discard_name = b""

    cw_start = 0
    cw_len = 0
    needs_decode = False

    cur_link_url: bytes = b""
    cur_link_anchor: list[bytes] = []

    def collect_current_word() -> None:
        nonlocal cur_link_anchor
        if cw_len == 0:
            return
        word = doc[cw_start : cw_start + cw_len]
        if needs_decode:
            sub_words = get_words(decode_html_string(word))
        else:
            sub_words = (word,)
        for sub in sub_words:
            if in_anchor:
                cur_link_anchor.append(sub)
            if in_title:
                title_words.append(sub)
            else:
                words.append(sub)

    while i < n:
        c = doc[i]
        if c in SPACE_BYTES:
            collect_current_word()
            m = _NONSPACE_RE.search(doc, i + 1, n)
            i = m.start() if m else n
            cw_start = i
            cw_len = 0
            needs_decode = False
            continue

        if c == 0x3C:  # '<'
            name_start = i + 1
            end_tag = False
            if name_start < n and doc[name_start] == 0x2F:  # '/'
                name_start += 1
                end_tag = True
            name_end = _name_ending_of_tag(doc, name_start, n)
            if name_end >= n:
                # No valid tag end — ordinary text
                cw_len += 1
                i += 1
                continue
            if doc[name_end - 1] == 0x2F:  # trailing '/' of '<br/>'
                end_tag = True
                name_end -= 1

            if discard_section:
                if not end_tag:
                    i += 1
                    continue
                if doc[name_start:name_end] == discard_name:
                    discard_section = False
                    e = _ending_of_tag(doc, name_end, n)
                    if e is not None:
                        i = e
                    i += 1
                else:
                    i += 1
                    nxt = doc.find(b"<", i)
                    i = n if nxt == -1 else nxt
                cw_start = i
                cw_len = 0
                continue

            action = lookup_possible_tag(doc[name_start:name_end])
            # (The reference's ORDINARY branch is unreachable: the lookup falls
            # through to DISCARD for unknown names. Kept for shape parity.)
            if action == ORDINARY:
                cw_len += 1
                i += 1
                continue

            collect_current_word()

            # --- HandleTagAction (Parser.cpp:176-296) ---
            new_i: int | None
            if action == DISCARD:
                new_i = _after_ending_of_tag(doc, name_end, n)
            elif action == TITLE:
                in_title = not end_tag
                new_i = _after_ending_of_tag(doc, name_end, n)
            elif action == COMMENT:
                if end_tag:
                    new_i = name_end
                else:
                    e = _ending_of_tag(doc, name_end, n)
                    while e is not None and not (doc[e - 2] == 0x2D and doc[e - 1] == 0x2D):
                        e = _ending_of_tag(doc, e + 1, n)
                    new_i = None if e is None else e + 1
            elif action == DISCARD_SECTION:
                if end_tag:
                    new_i = _after_ending_of_tag(doc, name_end, n)
                else:
                    discard_name = doc[name_start:name_end]
                    discard_section = True
                    new_i = _after_ending_of_tag(doc, name_end, n)
            elif action == ANCHOR:
                if end_tag:
                    if in_anchor and len(links) < MAX_LINKS_IN_A_DOCUMENT:
                        links.append((cur_link_url, cur_link_anchor))
                        cur_link_url = b""
                        cur_link_anchor = []
                        in_anchor = False
                    new_i = _after_ending_of_tag(doc, name_end, n)
                else:
                    href = _process_tag_attributes(doc, name_start, n, b"href")
                    if href:
                        if in_anchor and len(links) < MAX_LINKS_IN_A_DOCUMENT:
                            links.append((cur_link_url, cur_link_anchor))
                        cur_link_url = decode_html_string(decode_url(href))
                        cur_link_anchor = []
                        in_anchor = True
                    new_i = _after_ending_of_tag(doc, name_start, n)
            elif action == BASE:
                if end_tag:
                    new_i = _after_ending_of_tag(doc, name_end, n)
                elif not base_done:
                    raw_base = _process_tag_attributes(doc, name_start, n, b"href")
                    parsed.base = decode_html_string(decode_url(raw_base))
                    base_done = True
                    new_i = _after_ending_of_tag(doc, name_start, n)
                else:
                    new_i = _after_ending_of_tag(doc, name_end, n)
            elif action == EMBED:
                if end_tag:
                    new_i = _after_ending_of_tag(doc, name_end, n)
                else:
                    src = _process_tag_attributes(doc, name_start, n, b"src")
                    if src and len(links) < MAX_LINKS_IN_A_DOCUMENT:
                        links.append((decode_html_string(decode_url(src)), []))
                    new_i = _after_ending_of_tag(doc, name_start, n)
            elif action == META:
                if end_tag:
                    new_i = _after_ending_of_tag(doc, name_end, n)
                else:
                    name = _process_tag_attributes(doc, name_start, n, b"name")
                    if not name:
                        name = _process_tag_attributes(doc, name_start, n, b"property")
                    content_raw = _process_tag_attributes(doc, name_start, n, b"content")
                    content = decode_html_string(content_raw)
                    if name and content:
                        metas[name] = content
                    new_i = _after_ending_of_tag(doc, name_start, n)
            else:  # HTML_TAG
                if end_tag:
                    new_i = _after_ending_of_tag(doc, name_end, n)
                else:
                    parsed.lang = _process_tag_attributes(doc, name_start, n, b"lang")
                    new_i = _after_ending_of_tag(doc, name_start, n)

            if new_i is None:
                return parsed
            i = new_i
            cw_start = i
            cw_len = 0
            needs_decode = False
            continue

        # Normal text: bulk-process the whole region up to the next '<'
        # (C-speed find + split). Equivalence: within a '<'-free region the
        # per-byte loop collects exactly the whitespace-split tokens, with
        # needs_decode true iff '&' occurs inside that token; a trailing
        # token not closed by whitespace stays pending in cw (the next tag
        # either flushes it or — unclosed-tag quirk — extends it).
        if not discard_section:
            if cw_len == 0:
                p = doc.find(b"<", i)
                if p == -1:
                    p = n
                seg = doc[i:p]
                toks = seg.split()
                tail = toks.pop() if seg[-1] not in SPACE_BYTES else None
                if toks:
                    if b"&" not in seg and not in_anchor:
                        (title_words if in_title else words).extend(toks)
                    else:
                        for w in toks:
                            subs = (
                                get_words(decode_html_string(w))
                                if b"&" in w
                                else (w,)
                            )
                            for sub in subs:
                                if in_anchor:
                                    cur_link_anchor.append(sub)
                                if in_title:
                                    title_words.append(sub)
                                else:
                                    words.append(sub)
                if tail is not None:
                    cw_start = p - len(tail)
                    cw_len = len(tail)
                    needs_decode = b"&" in tail
                else:
                    cw_start = p
                    cw_len = 0
                    needs_decode = False
                i = p
                continue
            # Continuation of a pending word (only reachable via the
            # unclosed-tag quirk, where '<' joins the current word):
            # single-run scan with the original per-run semantics.
            m = _WS_OR_LT_RE.search(doc, i, n)
            nxt = m.start() if m else n
            if not needs_decode and doc.find(b"&", i, nxt) != -1:
                needs_decode = True
            cw_len += nxt - i
            i = nxt
        else:
            # Discarded text bytes have no side effects — skip the whole
            # run; spaces/'<' keep their branches' exact semantics.
            m = _WS_OR_LT_RE.search(doc, i, n)
            i = m.start() if m else n

    collect_current_word()

    if in_anchor and cur_link_url and len(links) < MAX_LINKS_IN_A_DOCUMENT:
        links.append((cur_link_url, cur_link_anchor))
    return parsed
