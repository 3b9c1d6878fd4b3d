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
