"""Forward-link absolutization/canonicalization units (text/links.py).

Reference: common/include/Util.h (ResolvePath static_asserts),
common/src/html/Link.cpp, common/src/http/URL.cpp.
"""

from mithril_spark.text.links import (
    canonicalize_url,
    clean_query_parameters,
    follow_urls,
    make_absolute_link,
    parse_url,
    resolve_path,
)


def test_resolve_path_reference_asserts():
    # the exact static_asserts from Util.h:74-78
    assert resolve_path("/a/b/./c/d/../e/f") == "/a/b/c/e/f"
    assert resolve_path("/a/../../../c") == "/c"
    assert resolve_path("/a/./././.") == "/a"
    assert resolve_path("/a/././././") == "/a/"


def test_parse_url():
    assert parse_url("https://Example.COM:8080/p?q#f") == (
        "https", "Example.COM", "8080", "/p?q#f")
    assert parse_url("http://a.b/") == ("http", "a.b", "", "/")
    assert parse_url("ftp://x.com/") is None          # scheme whitelist
    assert parse_url("https://[::1]/") is None        # no IPv6
    assert parse_url("https://bad_host/") is None     # invalid label char
    assert parse_url("https://-bad.com/") is None     # leading dash
    assert parse_url("https://x.com:0/") is None      # port range
    assert parse_url("https://x.com:99999/") is None
    assert parse_url("https:x.com") is None           # missing //
    assert parse_url("noscheme") is None


def test_clean_query_parameters():
    assert clean_query_parameters("/p?b=2&a=1") == "/p?a=1&b=2"  # sorted
    assert clean_query_parameters("/p?utm_source=x&a=1") == "/p?a=1"
    assert clean_query_parameters("/p?ref=r") == "/p"
    assert clean_query_parameters("/p?") == "/p"
    assert clean_query_parameters("/p?flag") == "/p?flag"  # no '=' kept bare
    assert clean_query_parameters("/plain") == "/plain"


def test_canonicalize_url():
    assert canonicalize_url("HTTPS", "ExAmple.com", "443", "/a//b/../c#frag") \
        == "https://example.com/a/c"
    assert canonicalize_url("http", "x.com", "8080", "p") \
        == "http://x.com:8080/p"
    assert canonicalize_url("http", "x.com", "80", "/") == "http://x.com/"


def test_make_absolute_link():
    page = "https://host.com/dir/page.html"
    assert make_absolute_link(page, "", "https://o.com/x") == "https://o.com/x"
    assert make_absolute_link(page, "", "//cdn.com/y") == "https://cdn.com/y"
    assert make_absolute_link(page, "", "/root/../z") == "https://host.com/z"
    assert make_absolute_link(page, "", "rel.html") \
        == "https://host.com/dir/rel.html"
    assert make_absolute_link(page, "/base/", "rel.html") \
        == "https://host.com/base/rel.html"
    assert make_absolute_link(page, "https://b.com/bd/x.html", "rel.html") \
        == "https://host.com/bd/rel.html"  # base contributes PATH only
    assert make_absolute_link(page, "", "javascript:void(0)") is None
    assert make_absolute_link(page, "", "#anchor") is None
    assert make_absolute_link(page, "", "mailto:a@b.c") is None
    assert make_absolute_link(page, "", "") is None


def test_follow_urls_end_to_end():
    got = follow_urls(
        b"https://host.com/a/b.html", b"",
        [b"/x?b=2&a=1", b"https://Up.COM:443/q//r", b"tel:123",
         b"bad host",  # a valid RELATIVE href (space survives into path)
         b"/x?b=2&a=1"],  # duplicate preserved
    )
    assert got == [
        b"https://host.com/x?a=1&b=2",
        b"https://up.com/q/r",
        b"https://host.com/a/bad host",
        b"https://host.com/x?a=1&b=2",
    ]
