"""HTML → text extraction — the step between the WARC crawl source and
the text-quality operators (trafilatura's job, spelled with the stdlib
``html.parser`` since the container has no extraction libraries).

Behavior (the subset that matters for corpus building):

- ``script``/``style``/``noscript``/``template`` subtrees contribute
  NOTHING (the classic boilerplate leak);
- block-level boundaries (p, div, li, br, headings, table rows, ...)
  become newlines, inline tags concatenate;
- character/entity references decode (``convert_charrefs``);
- whitespace collapses per line (runs of blanks -> one space, blank
  lines dropped) — the normalization every extractor applies;
- the ``<title>``, anchor hrefs, and a text/markup byte ratio come
  along as metadata (the ratio is a standard boilerplate signal).

Spark stage: Arrow-batched ``mapInPandas``, per-row quarantine — a
pathological page yields an error row, never a task failure. The
parser is the stdlib's tolerant non-validating one, so real-world tag
soup parses the way browsers lex it.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

from pyspark.sql import DataFrame

_SKIP = {"script", "style", "noscript", "template"}
_BLOCK = {
    "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5",
    "h6", "tr", "td", "th", "table", "section", "article", "header",
    "footer", "blockquote", "pre", "hr", "form", "figure", "nav",
}


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.title_parts: list[str] = []
        self.links: list[str] = []
        self._skip_depth = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip_depth += 1
        elif tag == "title":
            self._in_title = True
        elif tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)
        if tag in _BLOCK:
            self.chunks.append("\x00")

    def handle_endtag(self, tag):
        if tag in _SKIP and self._skip_depth:
            self._skip_depth -= 1
        elif tag == "title":
            self._in_title = False
        if tag in _BLOCK:
            self.chunks.append("\x00")

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._in_title:
            self.title_parts.append(data)
        else:
            self.chunks.append(data)


def html_to_text(html: str) -> dict:
    """Extract (title, text, links, text_ratio) from an HTML page."""
    p = _Extractor()
    p.feed(html)
    p.close()
    # \x00 sentinels mark BLOCK boundaries; raw newlines inside data are
    # ordinary HTML whitespace and collapse like spaces
    lines = []
    for raw_line in "".join(p.chunks).split("\x00"):
        line = " ".join(raw_line.split())
        if line:
            lines.append(line)
    text = "\n".join(lines)
    title = " ".join("".join(p.title_parts).split())
    n_html = len(html.encode("utf-8"))
    return {
        "title": title or None,
        "text": text,
        "links": p.links,
        "text_ratio": (
            len(text.encode("utf-8")) / n_html if n_html else 0.0
        ),
    }


def extract_html_text(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(id, html) -> (id, title, text, n_links, text_ratio, parse_err).
    Arrow-batched, shuffle-free, per-row quarantine."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for did, page in zip(pdf[id_col], pdf[html_col]):
                if page is None:
                    rows.append(
                        {
                            id_col: did, "title": None, "text": None,
                            "n_links": None, "text_ratio": None,
                            "parse_err": "null html",
                        }
                    )
                    continue
                try:
                    r = html_to_text(str(page))
                    rows.append(
                        {
                            id_col: did,
                            "title": r["title"],
                            "text": r["text"],
                            "n_links": len(r["links"]),
                            "text_ratio": r["text_ratio"],
                            "parse_err": None,
                        }
                    )
                except Exception as e:  # noqa: BLE001 — quarantine
                    rows.append(
                        {
                            id_col: did, "title": None, "text": None,
                            "n_links": None, "text_ratio": None,
                            "parse_err": str(e)[:200],
                        }
                    )
            yield pd.DataFrame(rows)

    # id column keeps ITS OWN type (string/int doc ids pass through
    # typed instead of hitting an Arrow cast error — r7 ADVICE)
    id_t = df.schema[id_col].dataType.simpleString()
    return df.mapInPandas(
        run,
        f"{id_col} {id_t}, title string, text string, n_links int, "
        "text_ratio double, parse_err string",
    )
