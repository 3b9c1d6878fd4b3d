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
