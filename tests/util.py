"""Shared oracle-compare helpers (mirrors the driver's canonicalization:
columns sorted by name, rows sorted, floats to tolerance)."""

from __future__ import annotations

import math

import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_frames_equal(a: pd.DataFrame, b: pd.DataFrame, atol: float = 1e-9) -> None:
    assert len(a) == len(b), f"rowcount {len(a)} vs {len(b)}"
    assert sorted(a.columns) == sorted(b.columns), (
        f"columns {sorted(a.columns)} vs {sorted(b.columns)}"
    )
    a, b = canon(a), canon(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            for i, (x, y) in enumerate(zip(av, bv)):
                xn = x is None or (isinstance(x, float) and math.isnan(x))
                yn = y is None or (isinstance(y, float) and math.isnan(y))
                if xn or yn:
                    assert xn and yn, f"col {c} row {i}: {x} vs {y}"
                else:
                    assert abs(float(x) - float(y)) <= atol, (
                        f"col {c} row {i}: {x} vs {y}"
                    )
        else:
            assert av.astype(str).equals(bv.astype(str)), (
                f"col {c} differs: "
                f"{[(i, x, y) for i, (x, y) in enumerate(zip(av.astype(str), bv.astype(str))) if x != y][:5]}"
            )
