"""Encoding repair — the "fix the crawl's mojibake" pass every text
corpus needs (ftfy's core trick, spelled with stdlib codecs).

The classic corruption: UTF-8 bytes read as cp1252/latin-1, so
``café`` arrives as ``cafÃ©`` (and doubly-encoded text nests the
damage). The repair is the inverse round trip: re-encode the text
with the single-byte codec and STRICT-decode as UTF-8 — random
single-byte text almost never forms valid multi-byte UTF-8
sequences, so a successful strict decode is overwhelming evidence
the text was mojibake (the same acceptance rule ftfy uses).

- cp1252 is tried first (its 0x80–0x9F printables — ``€ ” ‰`` — are
  what Windows-side corruption produces); latin-1 second (maps every
  code point below 0x100, catching the C1-control leftovers).
- Up to 3 rounds unwind double/triple encoding.
- Pure ASCII and already-clean text are FIXED POINTS: the repair
  either changes nothing or strictly removes damage — never
  introduces it (idempotence is property-tested).

Spark stage: Arrow-batched column transform, no shuffle.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame


def fix_mojibake(s: str, max_rounds: int = 3) -> str:
    """Undo UTF-8-read-as-cp1252/latin-1 damage; returns the input
    unchanged when no strict inverse round trip applies."""
    cur = s
    for _ in range(max_rounds):
        raw = None
        for codec in ("cp1252", "latin-1"):
            try:
                raw = cur.encode(codec)
                break
            except UnicodeEncodeError:
                continue
        if raw is None:
            break
        try:
            fixed = raw.decode("utf-8")
        except UnicodeDecodeError:
            break
        if fixed == cur:
            break
        cur = fixed
    return cur


def repair_text_encoding(
    df: DataFrame, text_col: str = "text", out_col: str = "text_fixed"
) -> DataFrame:
    """Append ``out_col`` (mojibake-repaired text) and ``was_fixed``.
    Arrow-batched, shuffle-free; nulls pass through."""
    cols = df.columns

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            fixed, changed = [], []
            for t in pdf[text_col]:
                if t is None:
                    fixed.append(None)
                    changed.append(None)
                    continue
                f = fix_mojibake(str(t))
                fixed.append(f)
                changed.append(f != t)
            out = pdf[cols].copy()
            out[out_col] = fixed
            out["was_fixed"] = pd.array(changed, dtype="boolean")
            yield out

    in_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(
        run, f"{in_schema}, {out_col} string, was_fixed boolean"
    )


# ---------------------------------------------------------------------------
# tolerant JSON repair — scraped-metadata cleanup
# ---------------------------------------------------------------------------
def repair_json(s: str) -> str:
    """Repair the almost-JSON that scraped metadata actually contains
    — single-quoted strings, unquoted identifier keys, trailing
    commas, Python literals (True/False/None) — and return the
    CANONICAL form (json.dumps, sorted keys). A real tokenizer, not
    regexes: quote conversion must not touch commas or brackets
    INSIDE strings. Raises ValueError when the repaired text still
    isn't JSON (garbage stays quarantined, never guessed)."""
    import json

    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c in "\"'":
            content, i = _read_quoted(s, i)
            out.append(json.dumps(content))
        elif c.isalpha() or c == "_":
            # exponent tail of a number already emitted (1.5e3, 2E+10):
            # digits stream through the fall-through branch one char at
            # a time, so a numeric predecessor is a single digit chunk
            if c in "eE" and out and out[-1][-1:].isdigit():
                j = i + 1
                if j < n and s[j] in "+-":
                    j += 1
                k = j
                while k < n and s[k].isdigit():
                    k += 1
                if k > j:
                    out.append(s[i:k])
                    i = k
                    continue
            j = i
            while j < n and (s[j].isalnum() or s[j] == "_"):
                j += 1
            word = s[i:j]
            if word == "True":
                out.append("true")
            elif word == "False":
                out.append("false")
            elif word in ("None", "NaN"):
                out.append("null")
            elif word in ("true", "false", "null"):
                out.append(word)
            else:  # bare identifier: an unquoted key or enum value
                out.append(json.dumps(word))
            i = j
        elif c == ",":
            k = i + 1
            while k < n and s[k].isspace():
                k += 1
            if k < n and s[k] in "}]":
                i += 1  # trailing comma: drop
            else:
                out.append(c)
                i += 1
        else:
            out.append(c)
            i += 1
    try:
        obj = json.loads("".join(out))
    except json.JSONDecodeError as e:
        raise ValueError(f"unrepairable JSON: {e}") from e
    return json.dumps(obj, sort_keys=True)


_JSON_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
    "/": "/", "\\": "\\", '"': '"', "'": "'",
}


def _read_quoted(s: str, i: int) -> tuple[str, int]:
    """Read a single- or double-quoted string starting at s[i];
    returns (decoded content, index past the closing quote)."""
    q = s[i]
    i += 1
    out: list[str] = []
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\":
            if i + 1 >= n:
                raise ValueError("dangling escape in string")
            nxt = s[i + 1]
            if nxt == "u" and i + 5 < n:
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
                continue
            out.append(_JSON_ESCAPES.get(nxt, nxt))
            i += 2
            continue
        if c == q:
            return "".join(out), i + 1
        out.append(c)
        i += 1
    raise ValueError("unterminated string")


def repair_json_column(
    df: DataFrame, json_col: str = "meta", out_col: str = "meta_fixed"
) -> DataFrame:
    """Append ``out_col`` (canonical repaired JSON) and ``json_err``;
    Arrow-batched, per-row quarantine, shuffle-free."""
    cols = df.columns

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            fixed, errs = [], []
            for t in pdf[json_col]:
                if t is None:
                    fixed.append(None)
                    errs.append("null json")
                    continue
                try:
                    fixed.append(repair_json(str(t)))
                    errs.append(None)
                except ValueError as e:
                    fixed.append(None)
                    errs.append(str(e)[:200])
            out = pdf[cols].copy()
            out[out_col] = fixed
            out["json_err"] = errs
            yield out

    in_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(
        run, f"{in_schema}, {out_col} string, json_err string"
    )
