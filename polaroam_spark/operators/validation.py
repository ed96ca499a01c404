"""Data-quality expectations — declarative row-level rules evaluated
in ONE aggregation pass, the pre-training-ingest gate ("no null ids,
epochs in range, text under 1 MB") that decides whether a batch
lands or quarantines.

Beyond-reference component: rules are plain Column predicates, so
everything stays JVM-side expression work; a thousand rules cost one
scan. No collect — the report is itself a (tiny) DataFrame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate_expectations(
    df: DataFrame, rules: dict[str, Column]
) -> DataFrame:
    """Evaluate named boolean rules over every row; returns one row
    per rule: ``[rule, n_rows, n_pass, n_fail, pass_rate]``. A NULL
    rule result (e.g. a comparison against a NULL column) counts as a
    FAIL — an expectation that cannot be evaluated is not met, and
    counting it as pass would let null-riddled batches sail through.
    An EMPTY batch passes vacuously (pass_rate 1.0, zero counts):
    no-data increments are routine in per-batch ingest and must not
    quarantine.

    All rules fold into a single aggregation (one scan, map-side
    combined); the per-rule unpivot happens over the RULE LIST,
    bounded by rule count, not data size.
    """
    if not rules:
        raise ValueError("at least one rule is required")
    names = list(rules)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, name in enumerate(names):
        cond = rules[name]
        aggs.append(
            # outer coalesce: sum over ZERO rows is NULL, which would
            # poison pass_rate (None < threshold raises) on an empty
            # batch
            F.coalesce(
                F.sum(
                    F.coalesce(
                        cond.cast("boolean"), F.lit(False)
                    ).cast("long")
                ),
                F.lit(0),
            ).alias(f"_p{i}")
        )
    row = df.agg(*aggs)
    per_rule = [
        row.select(
            F.lit(name).alias("rule"),
            F.col("_n").alias("n_rows"),
            F.col(f"_p{i}").alias("n_pass"),
            (F.col("_n") - F.col(f"_p{i}")).alias("n_fail"),
            F.when(F.col("_n") == 0, F.lit(1.0))
            .otherwise(
                F.col(f"_p{i}").cast("double")
                / F.col("_n").cast("double")
            )
            .alias("pass_rate"),
        )
        for i, name in enumerate(names)
    ]
    out = per_rule[0]
    for p in per_rule[1:]:
        out = out.unionByName(p)
    return out


def enforce_expectations(
    df: DataFrame,
    rules: dict[str, Column],
    min_pass_rate: float = 1.0,
) -> DataFrame:
    """Gate a batch on its expectations: raises ``ValueError`` naming
    every rule whose pass rate falls below ``min_pass_rate``,
    otherwise returns ``df`` unchanged. The report is tiny (one row
    per rule), so the single collect here is bounded by rule count.
    """
    report = validate_expectations(df, rules).collect()
    bad = [
        f"{r.rule}: {r.pass_rate:.4f} ({r.n_fail} failing rows)"
        for r in report
        if r.pass_rate < min_pass_rate
    ]
    if bad:
        raise ValueError(
            "expectations below min_pass_rate "
            f"{min_pass_rate}: " + "; ".join(bad)
        )
    return df
