"""Forward-link absolutization + URL canonicalization, faithful to reference.

Reference semantics:
* SplitPath/JoinPath/ResolvePath   common/include/Util.h:20-78
* ParseURL                         common/src/http/URL.cpp:227-321
* IsValidDomain(Label)             common/src/http/URL.cpp:61-97
* CleanQueryParameters             common/src/http/URL.cpp:105-170
  (discard set common/src/http/URL.cpp:25-55)
* CanonicalizeURL                  common/src/http/URL.cpp:323-381
* MakeAbsoluteLink                 common/src/html/Link.cpp:11-83
* GetFollowURLs                    crawler/src/Worker.cpp:304-340 — the
  host/base-path blacklists there are crawl-frontier policy (out of scope
  per the north rule) and are intentionally NOT applied here.

Quirks preserved: CanonicalizeURL's slash-collapse / fragment-strip /
ResolvePath run over the whole path INCLUDING the query string (so ".."
and "//" inside a query are rewritten), and query parameters are sorted by
name after dropping the tracking set.
"""

from __future__ import annotations

MAX_HOST_SIZE = 253  # http/URL.h:14

NON_CRAWLABLE_PREFIXES = (
    "javascript:", "data:", "mailto:", "tel:", "sms:", "ftp:", "#",
    "about:", "file:", "ws:", "wss:",
)

# common/src/http/URL.cpp:25-55 (data, not code)
DISCARD_QUERY_PARAMS = frozenset((
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "_ga", "_gl", "_gac", "gclid",
    "ref", "referrer", "referer", "source",
    "_", "_t", "timestamp", "nocache", "random", "rand",
    "sid", "session_id", "sessionid", "visitor_id", "visitorid",
))


def split_path(path: str) -> list[str]:
    """SplitPath (Util.h:20-46): leading slash skipped, trailing kept."""
    segments = []
    start = 1 if path.startswith("/") else 0
    while True:
        end = path.find("/", start)
        if end == -1:
            segments.append(path[start:])
            break
        segments.append(path[start:end])
        start = end + 1
    return segments


def resolve_path(path: str) -> str:
    """ResolvePath (Util.h:59-72): '..' pops, '.' drops, '/'-rejoin."""
    resolved: list[str] = []
    for segment in split_path(path):
        if segment == ".." and resolved:
            resolved.pop()
        elif segment != ".":
            resolved.append(segment)
    return "".join("/" + s for s in resolved)


def _is_valid_domain(host: str) -> bool:
    """IsValidDomain (URL.cpp:61-97)."""
    if not host or len(host) > MAX_HOST_SIZE:
        return False
    if host[0] == "." or host[-1] == ".":
        return False
    for label in host.split("."):
        if not label or len(label) > 63:
            return False
        if label[0] == "-" or label[-1] == "-":
            return False
        # std::isalnum in the C locale: ASCII alphanumerics only
        if not all(c == "-" or "0" <= c <= "9" or "a" <= c <= "z"
                   or "A" <= c <= "Z" for c in label):
            return False
    return True


def parse_url(s: str) -> tuple[str, str, str, str] | None:
    """ParseURL (URL.cpp:227-321) -> (scheme, host, port, path) or None."""
    scheme_end = s.find(":")
    if scheme_end <= 0:
        return None
    scheme = s[:scheme_end].lower()
    if scheme not in ("http", "https"):
        return None
    i = scheme_end + 1
    if not s.startswith("//", i):
        return None
    i += 2
    authority_start = i
    host_end = authority_start
    n = len(s)
    while host_end < n:
        c = s[host_end]
        if c == "[":
            return None  # no IPv6
        if c in (":", "/", "?", "#"):
            break
        host_end += 1
    host = s[authority_start:host_end]
    if not host or not _is_valid_domain(host):
        return None
    i = host_end
    port = ""
    if i < n and s[i] == ":":
        i += 1
        port_start = i
        while i < n and s[i] not in ("/", "?", "#"):
            i += 1
        port = s[port_start:i]
        # ::isdigit is ASCII-only (Python str.isdigit accepts unicode digits)
        if not port or not all("0" <= c <= "9" for c in port):
            return None
        if not 1 <= int(port) <= 65535:
            return None
    return scheme, host, port, s[i:]


def clean_query_parameters(path: str) -> str:
    """CleanQueryParameters (URL.cpp:105-170): drop tracking params, sort
    the rest by name, '=' omitted for empty values."""
    query_pos = path.find("?")
    if query_pos == -1:
        return path
    base_path = path[:query_pos]
    if query_pos == len(path) - 1:
        return base_path
    params = []
    for param in path[query_pos + 1:].split("&"):
        eq = param.find("=")
        if eq != -1:
            name, value = param[:eq], param[eq + 1:]
        else:
            name, value = param, ""
        if name not in DISCARD_QUERY_PARAMS:
            params.append((name, value))
    params.sort(key=lambda p: p[0])
    if not params:
        return base_path
    return base_path + "?" + "&".join(
        n + ("=" + v if v else "") for n, v in params
    )


def canonicalize_url(scheme: str, host: str, port: str, path: str) -> str:
    """CanonicalizeURL (URL.cpp:323-381) -> full canonical url string."""
    scheme = scheme.lower()
    host = host.lower()
    out = scheme + "://" + host
    if port and not ((scheme == "http" and port == "80")
                     or (scheme == "https" and port == "443")):
        out += ":" + port
    clean = []
    prev_slash = False
    if not path or path[0] != "/":
        clean.append("/")
        prev_slash = True
    for c in path:
        if c == "/":
            if not prev_slash:
                clean.append("/")
                prev_slash = True
            continue
        prev_slash = False
        if c == "#":
            break
        clean.append(c)
    clean_path = clean_query_parameters(resolve_path("".join(clean)))
    return out + clean_path


def make_absolute_link(page_url: str, base: str, href: str) -> str | None:
    """MakeAbsoluteLink (Link.cpp:11-83)."""
    if not href:
        return None
    for prefix in NON_CRAWLABLE_PREFIXES:
        if href.startswith(prefix):
            return None
    if href.startswith("http://") or href.startswith("https://"):
        return href
    parsed = parse_url(page_url)
    if parsed is None:
        return None
    scheme, host, port, cur_path = parsed
    port_part = ":" + port if port else ""
    if href.startswith("//"):
        return scheme + ":" + href
    if href[0] == "/":
        return scheme + "://" + host + port_part + resolve_path(href)
    if base:
        if base[0] == "/":
            base_path = base
        elif base.startswith("http://") or base.startswith("https://"):
            path_start = base.find("/", base.find("//") + 2)
            base_path = base[path_start:] if path_start != -1 else ""
        else:
            base_path = "/" + base
    else:
        base_path = cur_path
    last_slash = base_path.rfind("/")
    if last_slash != -1:
        base_path = base_path[: last_slash + 1]
    resolved = resolve_path(base_path + href)
    return scheme + "://" + host + port_part + resolved


def follow_urls(page_url: bytes, base: bytes, links: list[bytes]) -> list[bytes]:
    """GetFollowURLs (Worker.cpp:304-340) minus the frontier blacklists:
    absolutize -> parse -> canonicalize, duplicates preserved (PageRank's
    GetLinkNode counts each occurrence, PageRank.cpp:236-239)."""
    page = page_url.decode("latin-1")
    base_s = base.decode("latin-1") if base else ""
    out: list[bytes] = []
    for href in links:
        absolute = make_absolute_link(page, base_s, href.decode("latin-1"))
        if absolute is None:
            continue
        parsed = parse_url(absolute)
        if parsed is None:
            continue
        out.append(canonicalize_url(*parsed).encode("latin-1"))
    return out
