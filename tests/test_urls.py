"""URL canonicalization: RFC 3986 normalization set + tracking strip."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as hst

from django_datastream_spark.functions.urls import (
    canonicalize_urls,
    normalize_url,
    registrable_domain,
)


@pytest.mark.parametrize(
    "messy,clean",
    [
        (
            "HTTP://Example.COM:80/a/../b?utm_source=x&b=2&a=1#top",
            "http://example.com/b?a=1&b=2",
        ),
        ("https://Host.net:443/", "https://host.net/"),
        ("https://host.net:8443/x", "https://host.net:8443/x"),
        ("http://h.io", "http://h.io/"),
        ("http://h.io/a/./b/", "http://h.io/a/b/"),
        ("http://h.io/%41%7e?x=%41", "http://h.io/A~?x=A"),
        (
            "http://h.io/p?gclid=g&fbclid=f&ref=r&keep=1",
            "http://h.io/p?keep=1",
        ),
        ("http://h.io/p?b=&a=", "http://h.io/p?a=&b="),
        ("http://trailing.dot./x", "http://trailing.dot/x"),
    ],
)
def test_normalize_url_cases(messy, clean):
    assert normalize_url(messy) == clean
    # idempotent
    assert normalize_url(clean) == clean


def test_normalize_url_rejects():
    for bad in ("ftp://x/y", "not a url", "//no-scheme.com/x", "http://"):
        with pytest.raises(ValueError):
            normalize_url(bad)


def test_registrable_domain_heuristic():
    assert registrable_domain("a.b.example.com") == "example.com"
    assert registrable_domain("www.bbc.co.uk") == "bbc.co.uk"
    assert registrable_domain("example.com") == "example.com"
    assert registrable_domain("localhost") == "localhost"


@settings(max_examples=40, deadline=None)
@given(u=hst.text(max_size=120))
def test_normalize_total(u):
    try:
        c = normalize_url("http://x.io/" + u)
        assert normalize_url(c) == c  # idempotence on every success
    except ValueError:
        pass


def test_canonicalize_urls_spark_stage(spark):
    rows = [
        (0, "HTTP://A.Example.ORG:80/x/../y?utm_campaign=c&z=9"),
        (1, "mailto:someone@example.com"),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"]: r for r in canonicalize_urls(df).collect()}
    assert got[0]["canonical_url"] == "http://a.example.org/y?z=9"
    assert got[0]["domain"] == "example.org"
    assert got[1]["canonical_url"] is None and got[1]["url_err"]
    assert got[2]["url_err"] == "null url"


def test_robots_decision_rfc9309():
    from django_datastream_spark.functions.urls import robots_decision

    robots = (
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/ok/\n"     # LONGER than the Disallow: wins
        "Disallow: /tmp\n"
        "Disallow: /*.pdf$\n"       # wildcard + anchor
        "Allow: /downloads/*.pdf$\n"
    )
    cases = {
        "http://h.io/public/page": True,
        "http://h.io/private/x": False,
        "http://h.io/private/ok/y": True,   # longest-match, NOT stdlib
        "http://h.io/tmpfile": False,       # prefix rule
        "http://h.io/doc.pdf": False,
        "http://h.io/doc.pdf.html": True,   # $ anchor holds
        "http://h.io/downloads/a.pdf": True,
    }
    for u, want in cases.items():
        assert robots_decision(robots, u) is want, u
    # agent groups: most-specific wins over *
    grouped = (
        "User-agent: badbot\nDisallow: /\n\n"
        "User-agent: *\nDisallow: /secret/\n"
    )
    assert robots_decision(grouped, "http://h.io/x", "BadBot/1.0") is False
    assert robots_decision(grouped, "http://h.io/x", "goodbot") is True
    assert robots_decision(grouped, "http://h.io/secret/x", "goodbot") is False
    # empty Disallow allows everything
    assert robots_decision("User-agent: *\nDisallow:\n", "http://h.io/a")


def test_robots_allowed_spark_stage(spark):
    from django_datastream_spark.functions.urls import robots_allowed

    robots = "User-agent: *\nDisallow: /private/\n"
    rows = [
        (0, robots, "http://h.io/public/page"),
        (1, robots, "http://h.io/private/x"),
        (2, None, "http://h.io/anything"),
        (3, robots, None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, robots_txt string, url string"
    )
    got = {r["doc_id"]: r["allowed"] for r in robots_allowed(df).collect()}
    assert got[0] is True and got[1] is False
    assert got[2] is True and got[3] is None
