"""Declarative data-quality constraint checking (Deequ/dbt-test shape).

A pipeline promotes a batch only if its constraints hold; the operator
form is "rules in, violation counts out" so the whole rule set runs as
ONE aggregation pass over the table — N rules cost one scan, not N
(each rule becomes a conditional-sum column in a single hash
aggregate; Catalyst collapses them into one WholeStageCodegen span).

Referential rules (``exists_in``) are the exception that needs a join:
they run as a broadcast-or-shuffle left-anti count per rule, unioned
into the same result frame — at 100 TB the dimension side is the small
one, so these stay broadcast left-antis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_constraints(
    df: DataFrame,
    rules: dict[str, str],
    references: dict[str, tuple[DataFrame, str, str]] | None = None,
) -> DataFrame:
    """Evaluate named SQL-predicate ``rules`` ({name: boolean SQL
    expr that should hold for every row}) and optional referential
    ``references`` ({name: (dim_df, fk_col, pk_col)}) over ``df``.

    Returns (rule, violations, checked) — one row per rule, computed
    in one scan for predicate rules plus one anti-join per referential
    rule. NULL predicate results count as violations (a rule that
    cannot be evaluated did not hold)."""
    if not rules and not references:
        raise ValueError("no rules given")
    pieces = []
    names = list(rules)
    # positional internal aliases (__r0, __r1, ...): rule NAMES appear
    # only as string literals in the output, so a rule called
    # "_checked" or containing dots can never collide with internal
    # columns or be misparsed as a nested-field reference
    if rules:
        aggs = [F.count(F.lit(1)).alias("__checked")]
        for i, name in enumerate(names):
            aggs.append(
                # coalesce: SUM over an EMPTY table is NULL, but an
                # empty batch has zero violations, not unknown —
                # a gate comparing violations == 0 must pass it
                F.coalesce(
                    F.sum(
                        F.when(
                            F.expr(rules[name]).eqNullSafe(F.lit(True)), 0
                        ).otherwise(1)
                    ),
                    F.lit(0),
                ).alias(f"__r{i}")
            )
        wide = df.agg(*aggs)
        # unpivot the single wide row into (rule, violations, checked)
        pieces.append(
            wide.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(n).alias("rule"),
                                F.col(f"__r{i}")
                                .cast("long")
                                .alias("violations"),
                                F.col("__checked").cast("long").alias(
                                    "checked"
                                ),
                            )
                            for i, n in enumerate(names)
                        ]
                    )
                ).alias("r")
            ).select("r.*")
        )
    if references:
        # ONE row-count frame shared by every referential rule —
        # recomputing it per rule would re-scan the fact table
        checked = df.agg(F.count(F.lit(1)).cast("long").alias("checked"))
        for name, (dim, fk, pk) in references.items():
            viol = (
                df.select(F.col(fk))
                .join(
                    F.broadcast(dim.select(F.col(pk).alias(fk)).distinct()),
                    fk,
                    "left_anti",
                )
                .agg(
                    F.lit(name).alias("rule"),
                    F.count(F.lit(1)).cast("long").alias("violations"),
                )
                .crossJoin(checked)
            )
            pieces.append(viol)
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out
