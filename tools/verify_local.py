"""Local replica of the driver's correctness gate.

For every entry in ``__spark_entry__.queries()`` with an oracle, run the
Spark plan and the DuckDB SQL on the same sf dir, then compare:
row count, column names, and an order-insensitive value comparison
(columns sorted by name, rows sorted, floats to 1e-9).

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if len(a) != len(b):
        return False, f"rowcount {len(a)} vs {len(b)}"
    if sorted(a.columns) != sorted(b.columns):
        return False, f"columns {sorted(a.columns)} vs {sorted(b.columns)}"
    a, b = canon(a), canon(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = all(
                (math.isnan(x) and math.isnan(y))
                if (isinstance(x, float) and isinstance(y, float) and (math.isnan(x) or math.isnan(y)))
                else (x is None and y is None)
                if (x is None or y is None or (x != x and y != y))
                else abs(float(x) - float(y)) <= 1e-9
                for x, y in zip(av.fillna(float("nan")), bv.fillna(float("nan")))
            )
        else:
            ok = av.astype(str).equals(bv.astype(str))
        if not ok:
            mism = [
                (i, x, y)
                for i, (x, y) in enumerate(zip(av, bv))
                if str(x) != str(y)
            ][:5]
            return False, f"col {c} differs, first: {mism}"
    return True, "ok"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as se
    from django_datastream_spark.session import get_spark

    spark = get_spark("verify-local")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = se.queries()
    oracles = se.oracle_sql()
    failures = []
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name:28s} rows={len(sdf):6d} (no oracle — rows-only) {t_spark:5.1f}s")
            results[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(sdf), "oracle_rows": None, "err": "no_oracle",
            }
            continue
        odf = con.execute(oracles[name]).df()
        ok, msg = frames_equal(sdf, odf)
        status = "PASS" if ok else "FAIL"
        print(f"  {name:28s} {status} rows={len(sdf):6d} {t_spark:5.1f}s {'' if ok else msg}")
        results[name] = {
            "rows_match": len(sdf) == len(odf),
            "schema_match": sorted(sdf.columns) == sorted(odf.columns),
            "hash_match": ok,
            "spark_rows": len(sdf), "oracle_rows": len(odf),
            "err": None if ok else msg,
        }
        if not ok:
            failures.append((name, msg))
    out_json = os.environ.get("VERIFY_LOCAL_JSON")
    if out_json and not only:
        import json

        with open(out_json, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {out_json} ({len(results)} queries)")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[f[0] for f in failures]}")
        return 1
    print("all queries match the DuckDB oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
