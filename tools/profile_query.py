"""Per-query profiling harness for the optimization rounds (guide §1).

Usage:
    python tools/profile_query.py [--runs N] [--explain DIR/suffix] q59 q65 ...

Times each named declared query in isolation with the noop sink (same
methodology as bench.py: best-of-N min + median), labels jobs via
setJobDescription, and optionally writes `.explain("formatted")` to
plans/r11/<query>_<suffix>.txt.

Query names may be the full registry key or any unique prefix (q59 →
q59_fuzzy_pairs).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    explain_to: str | None = None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif args[i] == "--explain":
            explain_to = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from django_datastream_spark.plans import declared
    from django_datastream_spark.session import get_spark

    resolved = []
    for n in names:
        hits = [k for k in declared.QUERIES if k == n or k.startswith(n + "_") or k.startswith(n)]
        exact = [k for k in declared.QUERIES if k == n]
        if exact:
            resolved.append(exact[0])
        elif len(hits) == 1:
            resolved.append(hits[0])
        else:
            raise SystemExit(f"ambiguous or unknown query {n!r}: {hits}")

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()

    if explain_to:
        base, suffix = explain_to.rsplit("/", 1)
        os.makedirs(base, exist_ok=True)
        for name in resolved:
            df = declared.QUERIES[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(base, f"{name.split('_')[0]}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"explain -> {path}")

    samples: dict[str, list[float]] = {n: [] for n in resolved}
    for _ in range(runs):
        for name in resolved:
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            declared.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    for name in resolved:
        s = samples[name]
        if not s:
            continue
        print(
            f"{name:46s} min {min(s):7.3f}  median {statistics.median(s):7.3f}"
            f"  all {[round(x, 3) for x in s]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
