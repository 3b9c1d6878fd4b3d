"""PDF text extraction — the document-corpus workhorse format, as a
from-spec subset (ISO 32000 / PDF 1.4) in pure stdlib.

Real training corpora are full of PDFs; the extraction libraries
(pdfminer, PyMuPDF) aren't in this container, but the format's TEXT
layer is tractable from the public spec:

- **Object graph**: ``N G obj ... endobj`` bodies located by a
  tolerant scan (real-world xref tables are broken often enough that
  every serious extractor falls back to scanning), trailer ``/Root``
  → catalog ``/Pages`` → ``/Kids`` tree → page ``/Contents`` (ref or
  array of refs) resolved properly, so text comes out in PAGE ORDER,
  not file order.
- **Streams**: raw or ``/FlateDecode`` (stdlib zlib). Other filters
  (DCT, LZW, crypt) raise with the reason — honest boundary.
- **Content interpretation**: BT/ET text blocks; ``Tj``, ``'``,
  ``"`` and ``TJ`` (array form with kerning numbers) emit strings;
  ``Td``/``TD``/``T*`` line moves emit newlines; PDF string syntax
  is fully handled — ``\\(`` ``\\)`` ``\\\\`` ``\\n`` ``\\r`` ``\\t``
  ``\\b`` ``\\f``, 1-3 digit octal escapes, line continuations, and
  hex strings ``<...>``. Bytes decode as cp1252 (WinAnsi, the
  builder's declared encoding).

``build_simple_pdf`` writes a GENUINE PDF (header, objects, Flate
content streams, xref table with correct offsets, trailer) — the
ground truth for tests/oracles and the write half for corpus
round-trips. Spark stage: Arrow-batched flat map, per-document
quarantine, no shuffle.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

from pyspark.sql import DataFrame


# ---------------------------------------------------------------------------
# builder
# ---------------------------------------------------------------------------
def _esc(s: str) -> bytes:
    out = s.encode("cp1252", errors="replace")
    return out.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(
        b")", b"\\)"
    )


def build_simple_pdf(pages: list[list[str]]) -> bytes:
    """pages: list of pages, each a list of text lines -> a real
    single-font PDF 1.4 (Helvetica/WinAnsi, Flate content streams,
    valid xref)."""
    objs: list[bytes] = []  # 1-indexed object bodies (without N 0 obj)

    npages = len(pages)
    # object numbering: 1 catalog, 2 pages, 3 font, then per page:
    # 4+2i page, 5+2i content
    kids = b" ".join(
        b"%d 0 R" % (4 + 2 * i) for i in range(npages)
    )
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % npages
    )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /WinAnsiEncoding >>"
    )
    for i, lines in enumerate(pages):
        content = bytearray(b"BT /F1 12 Tf 72 720 Td 14 TL\n")
        for j, line in enumerate(lines):
            if j:
                content += b"T*\n"
            content += b"(" + _esc(line) + b") Tj\n"
        content += b"ET"
        flate = zlib.compress(bytes(content))
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Resources << /Font << /F1 3 0 R >> >>"
            b" /Contents %d 0 R >>" % (5 + 2 * i)
        )
        objs.append(
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
            % len(flate) + flate + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % n + body + b"\nendobj\n"
    xref_off = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_off)
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b", re.S)
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")


_STREAM_KW = re.compile(rb"stream\r?\n")


def _find_objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """num -> (dict/body bytes, stream bytes or None). Tolerant scan
    with two safeguards binary stream data forces: a direct /Length
    bounds the stream extent (compressed bytes may CONTAIN 'endobj'
    or 'endstream' by chance), and matches that fall inside an
    already-consumed object's extent are skipped (streams may contain
    'N 0 obj'-shaped bytes too)."""
    objs = {}
    consumed = 0
    for m in _OBJ_RE.finditer(data):
        if m.start() < consumed:
            continue  # phantom match inside a previous object's stream
        num = int(m.group(1))
        hdr_end = m.end()
        endobj = data.find(b"endobj", hdr_end)
        sm = _STREAM_KW.search(data, hdr_end)
        stream = None
        if sm is not None and (endobj < 0 or sm.start() < endobj):
            body = data[hdr_end : sm.start()]
            lm = re.search(rb"/Length\s+(\d+)\b(?!\s+0\s+R)", body)
            if lm:
                slen = int(lm.group(1))
                stream = data[sm.end() : sm.end() + slen]
                if len(stream) < slen:
                    raise ValueError("stream shorter than /Length")
                es = data.find(b"endstream", sm.end() + slen)
            else:  # indirect /Length: fall back to keyword scan
                es = data.find(b"endstream", sm.end())
                stream = data[sm.end() : es] if es >= 0 else None
                if stream is not None:
                    if stream.endswith(b"\r\n"):
                        stream = stream[:-2]
                    elif stream.endswith(b"\n"):
                        stream = stream[:-1]
            if es < 0 or stream is None:
                raise ValueError("stream without endstream")
            endobj = data.find(b"endobj", es)
        else:
            body = data[hdr_end:endobj] if endobj >= 0 else None
        if endobj < 0 or body is None:
            continue
        consumed = endobj + 6
        objs[num] = (body, stream)
    if not objs:
        raise ValueError("no PDF objects found")
    return objs


def _dict_value(body: bytes, key: bytes) -> bytes | None:
    m = re.search(re.escape(key) + rb"\s*", body)
    if not m:
        return None
    return body[m.end() :]


def _resolve_stream(body: bytes, stream: bytes) -> bytes:
    if re.search(rb"/Filter\s*/FlateDecode\b", body) or re.search(
        rb"/Filter\s*\[\s*/FlateDecode\s*\]", body
    ):
        try:
            return zlib.decompress(stream)
        except zlib.error as e:
            raise ValueError(f"bad Flate stream: {e}") from e
    if re.search(rb"/Filter", body):
        m = re.search(rb"/Filter\s*(/\w+|\[[^\]]*\])", body)
        raise ValueError(
            f"unsupported stream filter {m.group(1).decode()!r}"
            if m
            else "unsupported stream filter"
        )
    return stream


def _content_refs(page_body: bytes) -> list[int]:
    v = _dict_value(page_body, b"/Contents")
    if v is None:
        return []
    if v[:1] == b"[":
        arr = v[1 : v.find(b"]")]
        return [int(g) for g in _REF_RE.findall(arr)]
    m = _REF_RE.match(v)
    return [int(m.group(1))] if m else []


def _page_order(objs) -> list[int]:
    """Catalog -> Pages tree -> ordered page object numbers; falls
    back to file order of /Type /Page objects when the graph is
    damaged (what tolerant extractors do)."""
    root = None
    for num, (body, _s) in objs.items():
        if b"/Type" in body and b"/Catalog" in body:
            m = re.search(rb"/Pages\s+(\d+)\s+0\s+R", body)
            if m:
                root = int(m.group(1))
            break
    order: list[int] = []

    def walk(num, depth=0):
        if depth > 32 or num not in objs:
            return
        body, _s = objs[num]
        if b"/Kids" in body:
            v = _dict_value(body, b"/Kids")
            arr = v[1 : v.find(b"]")] if v is not None and v[:1] == b"[" else b""
            for g in _REF_RE.findall(arr):
                walk(int(g), depth + 1)
        elif b"/Page" in body:
            order.append(num)

    if root is not None:
        walk(root)
    if not order:
        order = [
            n for n, (b, _s) in sorted(objs.items())
            if re.search(rb"/Type\s*/Page\b", b)
        ]
    return order


_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _parse_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ( ) string starting at data[i] == '('; returns (bytes,
    index after the closing paren)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n:
        c = data[i : i + 1]
        if c == b"\\":
            nxt = data[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif nxt.isdigit():
                j = i + 1
                oct_digits = b""
                while j < n and len(oct_digits) < 3 and data[j : j + 1].isdigit():
                    oct_digits += data[j : j + 1]
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
            elif nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and data[i : i + 1] == b"\n":
                    i += 1
            else:
                i += 1  # lone backslash: drop per spec
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out += c
            i += 1
        else:
            out += c
            i += 1
    raise ValueError("unterminated PDF string")


def _extract_content_text(content: bytes) -> list[str]:
    """Interpret a content stream's text operators -> list of lines."""
    lines: list[str] = []
    cur: list[str] = []
    i, n = 0, len(content)
    in_text = False
    pending: list[bytes] = []  # strings since last operator scan

    def newline():
        lines.append("".join(cur))
        cur.clear()

    while i < n:
        c = content[i : i + 1]
        if c == b"(":
            s, i = _parse_string(content, i)
            pending.append(s)
            continue
        if c == b"<" and content[i + 1 : i + 2] != b"<":
            j = content.find(b">", i)
            if j < 0:
                raise ValueError("unterminated hex string")
            hx = re.sub(rb"\s", b"", content[i + 1 : j])
            if len(hx) % 2:
                hx += b"0"
            pending.append(bytes.fromhex(hx.decode("ascii", "replace")))
            i = j + 1
            continue
        if c.isalpha() or c in (b"'", b'"', b"*"):
            j = i
            while j < n and (content[j : j + 1].isalpha()
                             or content[j : j + 1] in (b"'", b'"', b"*")):
                j += 1
            op = content[i:j]
            i = j
            if op == b"BT":
                in_text = True
            elif op == b"ET":
                in_text = False
                if cur:
                    newline()
            elif op in (b"Tj",) and in_text:
                for s in pending:
                    cur.append(s.decode("cp1252", errors="replace"))
            elif op == b"TJ" and in_text:
                for s in pending:
                    cur.append(s.decode("cp1252", errors="replace"))
            elif op in (b"'", b'"') and in_text:
                if cur:
                    newline()
                for s in pending:
                    cur.append(s.decode("cp1252", errors="replace"))
            elif op in (b"Td", b"TD", b"T*") and in_text:
                if cur:
                    newline()
            pending.clear()
            continue
        i += 1
    if cur:
        newline()
    return lines


def extract_pdf_text(payload: bytes) -> list[list[str]]:
    """PDF -> per-page line lists. Supports the subset documented in
    the module docstring; raises ValueError on non-PDFs, unsupported
    filters, and structurally broken files."""
    try:
        return _extract_inner(payload)
    except IndexError as e:
        raise ValueError(f"malformed PDF: {e}") from e


def _extract_inner(payload: bytes) -> list[list[str]]:
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload (no %PDF header)")
    objs = _find_objects(payload)
    pages = _page_order(objs)
    if not pages:
        raise ValueError("no pages found")
    out = []
    for pn in pages:
        body, _s = objs[pn]
        text: list[str] = []
        for cn in _content_refs(body):
            if cn not in objs:
                raise ValueError(f"missing content object {cn}")
            cbody, cstream = objs[cn]
            if cstream is None:
                raise ValueError("page contents is not a stream")
            text.extend(
                _extract_content_text(_resolve_stream(cbody, cstream))
            )
        out.append(text)
    return out


# ---------------------------------------------------------------------------
# Spark stage
# ---------------------------------------------------------------------------
PDF_TEXT_SCHEMA = (
    "doc_id long, n_pages int, n_lines int, text string, parse_err string"
)


def extract_pdf_text_column(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """(id, pdf bytes) -> per-document extracted text (pages joined by
    form feeds, lines by newlines) + counts; Arrow-batched, per-row
    quarantine."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[content_col]):
                try:
                    pages = extract_pdf_text(bytes(p or b""))
                    rows.append(
                        {
                            id_col: did,
                            "n_pages": len(pages),
                            "n_lines": sum(len(pg) for pg in pages),
                            "text": "\f".join(
                                "\n".join(pg) for pg in pages
                            ),
                            "parse_err": None,
                        }
                    )
                except ValueError as e:
                    rows.append(
                        {
                            id_col: did, "n_pages": None,
                            "n_lines": None, "text": None,
                            "parse_err": str(e)[:200],
                        }
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, PDF_TEXT_SCHEMA)
