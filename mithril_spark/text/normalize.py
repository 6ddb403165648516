"""Token normalization pipeline, byte-faithful to the reference.

Reference semantics: /root/reference/index/src/TextPreprocessor.h:114-255
(normalize phases), :33-112 (stopword set), :143-157 (field decoration);
/root/reference/index/src/InvertedIndex.cpp:149-181 (tokenizeUrl);
/root/reference/index/src/PositionIndex.cpp:108-136 (shouldStorePositions);
/root/reference/common/src/http/Response.cpp:159-175 (ContentLanguageMatches)
with /root/reference/crawler/src/Globals.h:12 (AllowedLanguages).

Faithfully reproduced quirks:

* ``shouldReject`` runs *before* case folding / punctuation normalization, so
  ``=``, ``|``, ``//``, ``www.``, ``.com`` are matched on the trimmed raw token.
* ``isValidToken`` only rejects bytes equal to 0x80 or 0xFF (the reference's
  ``find_first_of("\\x80\\xFF")`` searches for those two *characters*, not the
  range), plus requires at least one ASCII letter.
* ``smartCaseFold`` keeps tokens whose every byte is an ASCII uppercase letter
  (len > 1), so ``NASA`` survives but ``NASA1`` is lowercased.
* Inner punctuation runs collapse to a single ASCII space, so normalized terms
  can contain spaces (``don't`` -> ``don t``).
* Stopwords are dropped only for BODY-field tokens.
"""

from __future__ import annotations

# Field model (TextPreprocessor.h:13-31)
BODY, TITLE, URL, ANCHOR, DESC, ALL = range(6)
FIELD_FLAG = {BODY: 1, TITLE: 2, URL: 4, ANCHOR: 8, DESC: 16}
FIELD_PREFIX = {TITLE: b"#", URL: b"@", ANCHOR: b"$", DESC: b"%"}

# Stopword list transcribed from TextPreprocessor.h:41-80 (data, not code).
STOPWORDS: frozenset[bytes] = frozenset(
    w.encode() for w in (
        "a an the this that these those some any all no every each few more "
        "most other such what which whose i me my mine myself you your yours "
        "yourself yourselves he him his himself she her hers herself it its "
        "itself we us our ours ourselves they them their theirs themselves "
        "about above across after afterwards again against along already also "
        "although always am among amongst amount and another anyhow anyone "
        "anything anyway anywhere are around as at back be became because "
        "become becomes becoming been before beforehand behind being below "
        "beside besides between beyond bill both bottom but by call can cannot "
        "cant co con could couldnt cry de describe detail do done down due "
        "during eg eight either eleven else elsewhere empty enough etc even "
        "ever everyone everything everywhere except fill find fire first five "
        "for former formerly forty found four from front full further get give "
        "go had has hasnt have having hence here hereafter hereby herein "
        "hereupon how however hundred ie if in inc indeed interest into is "
        "keep last latter latterly least less ltd made many may meanwhile "
        "might mill moreover mostly move much must name namely neither never "
        "nevertheless next nine nobody none noone nor not nothing now nowhere "
        "of off often on once one only onto or others otherwise out over own "
        "part per perhaps please put rather re same see seem seemed seeming "
        "seems serious several should show side since sincere six sixty so "
        "somehow someone something sometime sometimes somewhere still system "
        "take ten than then thence there thereafter thereby therefore therein "
        "thereupon thick thin third though three through throughout thru thus "
        "to together too top toward towards twelve twenty two un under until "
        "up upon very via was well were when whence whenever where whereafter "
        "whereas whereby wherein whereupon wherever whether while whither who "
        "whoever whole whom why will with within without would yet"
    ).split()
)

_SPACES = frozenset(b" \t\n\r\f\v")
TRIM_CHARS = frozenset(b" \t\n\r\f\v!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")
_PUNCT = frozenset(
    b"!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"
)  # C ispunct over ASCII
_ALPHA = frozenset(b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
_DIGIT = frozenset(b"0123456789")
_UPPER_ONLY = frozenset(b"ABCDEFGHIJKLMNOPQRSTUVWXYZ")
_ASCII_LOWER_TABLE = bytes(c + 32 if 0x41 <= c <= 0x5A else c for c in range(256))


def _strip_html_tags(s: bytes) -> bytes:
    # '<'/'{' enter tag mode, '>'/'}' leave it (TextPreprocessor.h:172-186)
    if b"<" not in s and b"{" not in s and b">" not in s and b"}" not in s:
        return s
    out = bytearray()
    in_tag = False
    for c in s:
        if c == 0x3C or c == 0x7B:
            in_tag = True
        elif c == 0x3E or c == 0x7D:
            in_tag = False
        elif not in_tag:
            out.append(c)
    return bytes(out)


def _remove_html_entities(s: bytes) -> bytes:
    # Delete '&'..';' spans; unterminated '&' stops (TextPreprocessor.h:188-197)
    pos = s.find(b"&")
    if pos == -1:
        return s
    out = s
    while True:
        pos = out.find(b"&")
        if pos == -1:
            return out
        end = out.find(b";", pos)
        if end == -1:
            return out
        out = out[:pos] + out[end + 1 :]


def _smart_trim(s: bytes) -> bytes:
    i, j = 0, len(s)
    while i < j and s[i] in TRIM_CHARS:
        i += 1
    while j > i and s[j - 1] in TRIM_CHARS:
        j -= 1
    return s[i:j]


def _should_reject(s: bytes) -> bool:
    if not s:
        return True
    all_digits = True
    for c in s:
        if c not in _DIGIT:
            all_digits = False
            break
    if all_digits:
        return True
    if (
        b"//" in s
        or b"|" in s
        or b"=" in s
        or b"www." in s
        or b".com" in s
    ):
        return True
    return len(s) > 64


def _smart_case_fold(s: bytes) -> bytes:
    if len(s) > 1 and all(c in _UPPER_ONLY for c in s):
        return s  # preserve all-caps acronyms
    return s.translate(_ASCII_LOWER_TABLE)


def _normalize_punctuation(s: bytes) -> bytes:
    out = bytearray()
    prev_punct = False
    for c in s:
        if c in _PUNCT:
            if not prev_punct and out:
                out.append(0x20)
                prev_punct = True
        else:
            out.append(c)
            prev_punct = False
    return bytes(out)


def _is_valid_token(s: bytes) -> bool:
    if 0x80 in s or 0xFF in s:
        return False
    return any(c in _ALPHA for c in s)


def decorate_token(token: bytes, field: int) -> bytes:
    prefix = FIELD_PREFIX.get(field)
    return prefix + token if prefix else token


# Pure-function memo: web text repeats tokens heavily, so the per-worker
# cache removes most normalize() work. Bounded to keep executor memory flat.
# One dict per field (BODY..ALL) — avoids a tuple-key allocation per call.
_NORM_CACHES: tuple[dict[bytes, bytes], ...] = tuple({} for _ in range(ALL + 1))
_NORM_CACHE_MAX = 100_000  # per field


def normalize(token: bytes, field: int = BODY) -> bytes:
    """TokenNormalizer::normalize — b'' means rejected."""
    cache = _NORM_CACHES[field]
    cached = cache.get(token)
    if cached is not None:
        return cached
    # Fast path: lowercase pure-ASCII-alpha tokens skip every phase except
    # the length cap, stopword drop and decoration (provably equivalent:
    # no tags/entities/trim chars/digits/punct/upper/0x80/0xFF present).
    if token.isalpha() and token.islower():
        if len(token) > 64:
            result = b""
        elif field == BODY and token in STOPWORDS:
            result = b""
        else:
            result = decorate_token(token, field)
    else:
        result = _normalize_slow(token, field)
    if len(cache) < _NORM_CACHE_MAX:
        cache[token] = result
    return result


def _normalize_slow(token: bytes, field: int) -> bytes:
    if not token:
        return b""
    processed = _strip_html_tags(token)
    processed = _remove_html_entities(processed)
    processed = _smart_trim(processed)
    if _should_reject(processed):
        return b""
    processed = _smart_case_fold(processed)
    processed = _normalize_punctuation(processed)
    if _is_valid_token(processed):
        if field == BODY and processed in STOPWORDS:
            return b""
        return decorate_token(processed, field)
    return b""


_URL_DELIMS = frozenset(b"/.-_?&=")


def tokenize_url(url: bytes) -> list[bytes]:
    """Split a url on ``/.-_?&=`` runs, dropping empties (InvertedIndex.cpp:149-181)."""
    tokens: list[bytes] = []
    n = len(url)
    start = 0
    while start < n and url[start] in _URL_DELIMS:
        start += 1
    if start >= n:
        return tokens
    while start < n:
        end = start
        while end < n and url[end] not in _URL_DELIMS:
            end += 1
        if end < n:
            if end > start:
                tokens.append(url[start:end])
            start = end + 1
            while start < n and url[start] in _URL_DELIMS:
                start += 1
            if start >= n:
                break
        else:
            tokens.append(url[start:])
            break
    return tokens


def should_store_positions(term: bytes, freq: int, total_terms: int) -> bool:
    """PositionIndex::shouldStorePositions (PositionIndex.cpp:108-136)."""
    if term:
        prefix = term[0]
        if prefix == 0x23 or prefix == 0x25 or prefix in _UPPER_ONLY:  # '#', '%', upper
            return True
        if prefix == 0x40:  # '@'
            return b"/" in term
    if term in STOPWORDS:
        return False
    if freq > 3000 or (total_terms > 0 and freq > total_terms // 8):
        return False
    return freq > 2


# --- language admission (Response.cpp:159-175, Globals.h:12) ---

def _insensitive(s: bytes) -> bytes:
    return s.translate(_ASCII_LOWER_TABLE)


def content_language_matches(val: bytes, lang: bytes) -> bool:
    if not lang:
        return True
    semi = val.find(b";")
    if semi != -1:
        val = val[:semi]
    if lang.endswith(b"*"):
        return _insensitive(val).startswith(_insensitive(lang[:-1]))
    return _insensitive(val) == _insensitive(lang)


ALLOWED_LANGUAGES = (b"en", b"en-*", b"en_*")


def language_allowed(html_lang: bytes) -> bool:
    """Empty lang attr is allowed; otherwise must match en / en-* / en_*."""
    if not html_lang:
        return True
    return any(content_language_matches(html_lang, lang) for lang in ALLOWED_LANGUAGES)


def get_comma_separated_list(s: bytes) -> list[bytes]:
    """Split on ',' trimming C whitespace; empties kept (Util.cpp:80-92)."""
    parts = s.split(b",")
    return [p.strip(b" \t\n\r\f\v") for p in parts]


def robots_noindex(metas: dict[bytes, bytes]) -> bool:
    robots = metas.get(b"robots")
    if robots is None:
        return False
    return any(rule == b"noindex" for rule in get_comma_separated_list(robots))


def robots_nofollow(metas: dict[bytes, bytes]) -> bool:
    """GetRobotsMeta NoFollow (crawler/src/Worker.cpp:67-85): an indexed
    page with nofollow contributes no forward links (Worker.cpp:176-183)."""
    robots = metas.get(b"robots")
    if robots is None:
        return False
    return any(rule == b"nofollow" for rule in get_comma_separated_list(robots))
