"""Result snippets, faithful to the reference's web-tier generator.

Reference semantics (/root/reference/web/src/Snippets.h):
* combinedText       :146-177 — "title . desc  body", each word + ' '
  (with the trailing-space quirks: '. ' after title, extra ' ' after desc);
* getDocumentText    :76-93  — combined text, else description, else '';
* generateSnippet    :183-217 — positions-based extraction first, then a
  case-insensitive substring search, then the document head;
* findCharPositionFromTokenIndex :224-243 — whitespace-hop heuristic;
* getSnippetBoundaries :246-285 — +-75 chars, extended to sentence
  punctuation within 100 chars;
* extractSnippetFromPositions :287-328 — middle occurrence across all
  matched terms, ellipses when clipped;
* extractSnippetFromSubstring :330-364 — first term >= 3 chars found in
  lowercased text, +-150 chars;
* getFallbackSnippet :366-383 — first 75 chars, extended <= 50 to a
  sentence end.

The storage layer differs by design: the reference re-reads gzipped crawl
chunks through an LRU (DocumentAccessor, Snippets.h:28-143); here the
documents already live in the ``stage_raw`` parquet of the index, so the
engine fetches the top-k rows with a pruned scan (url IN (...)) — the
lookup cache is the parquet page cache / block manager.
"""

from __future__ import annotations


def combined_text(title_words: list[str], desc: str, body: str) -> str:
    """combinedText (Snippets.h:146-177) + getDocumentText fallbacks."""
    if body:
        result = ""
        if title_words:
            for w in title_words:
                result += w + " "
            result += ". "
        if desc:
            for w in desc.split(" "):
                result += w + " "
            result += " "
        for w in body.split(" "):
            result += w + " "
        return result
    if desc:
        result = ""
        for w in desc.split(" "):
            result += w + " "
        return result
    return ""


# C-locale std::isspace set (Snippets.h:230-236). NOT str.isspace: the
# text here is latin-1-decoded bytes, and Python additionally treats
# '\xa0' (NBSP, a lawful byte of multi-byte entity expansions) and
# '\x85' as whitespace — which would count phantom token separators and
# shift every position-based snippet off the reference (code-review r5).
_C_SPACE = frozenset(" \t\n\v\f\r")


def _char_pos_of_token(text: str, token_index: int) -> int:
    """findCharPositionFromTokenIndex (Snippets.h:224-243)."""
    pos = 0
    count = 0
    n = len(text)
    while pos < n and count < token_index:
        while pos < n and text[pos] not in _C_SPACE:
            pos += 1
        while pos < n and text[pos] in _C_SPACE:
            pos += 1
        count += 1
    return pos


def _boundaries(text: str, pos: int, context: int = 75) -> tuple[int, int]:
    """getSnippetBoundaries (Snippets.h:246-285)."""
    n = len(text)
    start = pos - context if pos > context else 0
    end = min(pos + context, n)

    if start > 0:
        p = start
        limit = p - 100 if p > 100 else 0
        while p > limit:
            if text[p] in ".!?":
                p += 1
                break
            p -= 1
        start = p
    if end < n:
        p = end
        limit = min(p + 100, n)
        while p < limit:
            if text[p] in ".!?":
                p += 1
                break
            p += 1
        end = p
    return start, end


def _clip(text: str, start: int, end: int) -> str:
    snippet = text[start:end]
    if start > 0:
        snippet = "..." + snippet
    if end < len(text):
        snippet += "..."
    return snippet


def _from_positions(text: str, positions: dict[str, list[int]]) -> str:
    """extractSnippetFromPositions (Snippets.h:287-328): middle occurrence."""
    char_positions = []
    n = len(text)
    for term, pos_vec in positions.items():
        for token_pos in pos_vec:
            cp = _char_pos_of_token(text, token_pos)
            if cp < n:
                char_positions.append((cp, term))
    if not char_positions:
        return ""
    char_positions.sort()
    pos, _term = char_positions[len(char_positions) // 2]
    start, end = _boundaries(text, pos)
    return _clip(text, start, end)


def _from_substring(text: str, query_terms: list[str]) -> str:
    """extractSnippetFromSubstring (Snippets.h:330-364)."""
    lower_text = text.lower()
    for term in query_terms:
        if len(term) < 3:
            continue
        pos = lower_text.find(term.lower())
        if pos != -1:
            start, end = _boundaries(text, pos, 150)
            return _clip(text, start, end)
    return ""


def _fallback(text: str) -> str:
    """getFallbackSnippet (Snippets.h:366-383)."""
    max_length = 75
    if len(text) <= max_length:
        return text
    end = max_length
    limit = min(len(text), max_length + 50)
    while end < limit:
        if text[end] in ".!?":
            end += 1
            break
        end += 1
    return text[:end] + "..."


def generate_snippet(
    text: str,
    query_terms: list[str],
    positions: dict[str, list[int]] | None = None,
) -> str:
    """generateSnippet (Snippets.h:183-217) over prefetched text."""
    if not text:
        return "No content available"
    if positions:
        snippet = _from_positions(text, positions)
        if snippet:
            return snippet
    snippet = _from_substring(text, query_terms)
    if snippet:
        return snippet
    return _fallback(text)
