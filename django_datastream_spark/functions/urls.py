"""URL canonicalization — the dedup key of every crawl pipeline.

A crawl sees the same page as ``HTTP://Example.COM:80/a/../b?utm_source=x&b=2&a=1#top``
and ``http://example.com/b?a=1&b=2``; canonicalizing before dedup is
what collapses them. Rules implemented (the standard, RFC 3986 §6
normalization set plus the tracking-parameter strip every corpus
pipeline applies):

- scheme and host lowercase; default ports dropped (http:80,
  https:443)
- dot-segments resolved (``/a/./b/../c`` -> ``/a/c``), empty path ->
  ``/``
- fragment removed
- query parameters SORTED (key, then value) with tracking params
  dropped (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``, ``ref``)
- percent-encoding normalized for unreserved characters
  (``%41`` -> ``A``), hex digits uppercased otherwise

Pure stdlib ``urllib.parse``; the Spark stage is an Arrow-batched
column transform (URLs are strings — no shuffle, no driver). The
registrable-domain helper is an explicit heuristic (documented public
two-label rule + a small ccSLD list), not a PSL dependency."""

from __future__ import annotations

from typing import Iterator
from urllib.parse import parse_qsl, quote, unquote, urlencode, urlsplit

from pyspark.sql import DataFrame

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_TRACKING = {"fbclid", "gclid", "msclkid", "ref"}
#: common two-label public suffixes (heuristic subset, documented)
_CC_SLD = {
    "co.uk", "org.uk", "ac.uk", "com.au", "co.jp", "com.br", "co.in",
    "com.cn", "co.kr", "com.mx", "co.za", "com.tr",
}


def _resolve_dots(path: str) -> str:
    out: list[str] = []
    for seg in path.split("/"):
        if seg == "." or seg == "":
            continue
        if seg == "..":
            if out:
                out.pop()
            continue
        out.append(seg)
    norm = "/" + "/".join(out)
    if path.endswith("/") and norm != "/":
        norm += "/"
    return norm


def _requote(s: str, safe: str) -> str:
    # decode-then-encode normalizes %-escapes of unreserved chars and
    # uppercases remaining hex digits
    return quote(unquote(s), safe=safe)


def normalize_url(u: str) -> str:
    """Canonical form of an absolute http(s) URL; raises ValueError on
    anything else (relative refs, other schemes, empty host)."""
    parts = urlsplit(u.strip())
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        raise ValueError(f"unsupported scheme {parts.scheme!r}")
    host = (parts.hostname or "").lower().rstrip(".")
    if not host:
        raise ValueError("URL has no host")
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS[scheme]:
        netloc = f"{host}:{port}"
    path = _requote(_resolve_dots(parts.path or "/"), safe="/:@!$&'()*+,;=~-._")
    q = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if not (k.lower().startswith("utm_") or k.lower() in _TRACKING)
    ]
    query = urlencode(sorted(q))
    return f"{scheme}://{netloc}{path}" + (f"?{query}" if query else "")


def registrable_domain(host: str) -> str:
    """Heuristic eTLD+1: last two labels, or three when the two-label
    suffix is a known ccSLD (co.uk family). A pipeline that needs the
    full Public Suffix List plugs it in here."""
    labels = host.lower().rstrip(".").split(".")
    if len(labels) <= 2:
        return ".".join(labels)
    if ".".join(labels[-2:]) in _CC_SLD:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """Append ``out_col`` (+ ``domain``, ``url_err``); Arrow-batched,
    per-row quarantine, shuffle-free — the stage before groupBy-dedup
    on the canonical key."""
    cols = df.columns

    def run(batches) -> Iterator:
        import pandas as pd
        from urllib.parse import urlsplit as _us

        for pdf in batches:
            canon, dom, err = [], [], []
            for u in pdf[url_col]:
                if u is None:
                    canon.append(None)
                    dom.append(None)
                    err.append("null url")
                    continue
                try:
                    c = normalize_url(str(u))
                    canon.append(c)
                    dom.append(registrable_domain(_us(c).hostname or ""))
                    err.append(None)
                except ValueError as e:
                    canon.append(None)
                    dom.append(None)
                    err.append(str(e)[:200])
            out = pdf[cols].copy()
            out[out_col] = canon
            out["domain"] = dom
            out["url_err"] = err
            yield out

    in_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(
        run, f"{in_schema}, {out_col} string, domain string, url_err string"
    )


# ---------------------------------------------------------------------------
# robots.txt evaluation (RFC 9309) — the crawl-compliance filter
# ---------------------------------------------------------------------------
def _robots_rules(body: str, agent: str) -> list[tuple[bool, str]]:
    """Parse a robots.txt body -> the [(is_allow, pattern)] group for
    ``agent`` (most-specific matching User-agent group; '*' fallback),
    per RFC 9309 grouping rules."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    in_rules = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:  # a new group starts
                groups.append((agents, rules))
                agents, rules = [], []
                in_rules = False
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_rules = True
            if val:  # empty Disallow means allow-all: no rule
                rules.append((key == "allow", val))
        # crawl-delay/sitemap etc. are ignored for matching
    if agents or rules:
        groups.append((agents, rules))
    al = agent.lower()
    best: list[tuple[bool, str]] | None = None
    best_len = -1
    for ags, rs in groups:
        for a in ags:
            if a == "*" and best_len < 0:
                best = rs
            elif a != "*" and a in al and len(a) > best_len:
                best, best_len = rs, len(a)
    return best or []


def _robots_match(pattern: str, path: str) -> int:
    """RFC 9309 pattern match ('*' wildcard, '$' end anchor); returns
    the pattern LENGTH on match (the longest-match precedence key) or
    -1."""
    import re

    anchored = pattern.endswith("$")
    pat = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(seg) for seg in pat.split("*"))
    if anchored:
        rx += "$"
    return len(pattern) if re.match(rx, path) else -1


def robots_decision(body: str, url: str, agent: str = "*") -> bool:
    """RFC 9309 longest-match decision (Allow wins length ties) —
    stricter than the stdlib robotparser, which still implements the
    1994 first-match rule."""
    from urllib.parse import urlsplit

    parts = urlsplit(url)
    path = parts.path or "/"
    if parts.query:
        path += "?" + parts.query
    best_len, best_allow = -1, True
    for is_allow, pattern in _robots_rules(body, agent):
        ml = _robots_match(pattern, path)
        if ml > best_len or (ml == best_len and is_allow and not best_allow):
            if ml >= 0:
                best_len, best_allow = ml, is_allow
    return best_allow


def robots_allowed(
    df: DataFrame,
    robots_col: str = "robots_txt",
    url_col: str = "url",
    agent: str = "*",
    out_col: str = "allowed",
) -> DataFrame:
    """Append ``out_col``: whether ``agent`` may fetch ``url_col``
    under the row's ``robots_col`` body — RFC 9309 semantics
    (longest-match precedence, Allow wins ties, '*'/'$' patterns,
    most-specific agent group), which the stdlib parser does NOT
    implement (it is first-match). A crawl pipeline joins each record
    to its host's robots body and filters on this BEFORE ingestion; a
    NULL/empty body allows everything (the protocol default).
    Arrow-batched with a per-batch rule memo keyed by the body (hosts
    repeat heavily under Zipf), shuffle-free."""
    cols = df.columns

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            allowed = []
            for body, u in zip(pdf[robots_col], pdf[url_col]):
                if u is None:
                    allowed.append(None)
                    continue
                if body is None or not str(body).strip():
                    allowed.append(True)
                    continue
                allowed.append(robots_decision(str(body), str(u), agent))
            out = pdf[cols].copy()
            out[out_col] = pd.array(allowed, dtype="boolean")
            yield out

    in_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(run, f"{in_schema}, {out_col} boolean")
