"""Skew mitigation utilities.

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime, but two patterns still need explicit salting at 100 TB:

- a single hot group in an aggregation (one reducer gets the world:
  e.g. a bot uid with 10^9 pings) — ``salted_groupby_agg`` runs the
  aggregation in two stages, first over (key, salt) then over key.
  Correct for any algebraic aggregate (sum/count/min/max).
- a shuffle join against a table with hot keys —
  ``salted_join_hot_keys`` replicates the small side only for the
  detected hot keys (broadcast of the hot-key list) and salts the big
  side, leaving cold keys on the normal path.

Both are pure DataFrame rewrites — no RDDs, no custom partitioners —
so they compose with AQE and whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, col_name: str = "_salt") -> DataFrame:
    """Append a uniform salt in [0, buckets) from xxhash64 of all
    columns mixed with ``monotonically_increasing_id`` — the id term
    spreads byte-identical duplicate rows (a bot emitting the same
    ping 10^9 times) across buckets, which a pure content hash cannot.

    Tradeoff: the id depends on partition layout, so salt values are
    not stable across reruns/retries. That is safe everywhere a salt
    is used here — two-stage algebraic aggregation and hot-key joins
    (small side replicated to every bucket) are correct under ANY salt
    assignment; the salt only shapes the shuffle distribution."""
    return df.withColumn(
        col_name,
        F.pmod(
            F.xxhash64(F.monotonically_increasing_id(), *df.columns),
            F.lit(buckets),
        ),
    )


def salted_groupby_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 32,
) -> DataFrame:
    """Two-stage aggregation for hot grouping keys.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {"sum", "count", "min", "max"}. Stage 1 aggregates per
    (keys, salt) — splitting a hot key across ``buckets`` reducers —
    stage 2 recombines per keys (sum/sum/min/max of partials).

    >>> salted_groupby_agg(pings, ["uid"], {"n": ("*", "count"),
    ...                                     "t": ("time_diff", "sum")})
    """
    first_stage = []
    second_stage = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            first_stage.append(F.count(col).alias(out))
            second_stage.append(F.sum(out).cast("long").alias(out))
        elif fn == "sum":
            first_stage.append(F.sum(col).alias(out))
            second_stage.append(F.sum(out).alias(out))
        elif fn == "min":
            first_stage.append(F.min(col).alias(out))
            second_stage.append(F.min(out).alias(out))
        elif fn == "max":
            first_stage.append(F.max(col).alias(out))
            second_stage.append(F.max(out).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate: {fn}")

    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "_salt").agg(*first_stage)
    return partial.groupBy(*keys).agg(*second_stage)


def hot_keys(
    df: DataFrame, key: str, threshold_rows: int = 1_000_000
) -> DataFrame:
    """Keys whose row count exceeds ``threshold_rows`` — the candidate
    set for explicit salting. One cheap count aggregation."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > threshold_rows)
        .select(key)
    )


def salted_join_hot_keys(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot: DataFrame,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with explicit salting for
    the keys in ``hot`` (from :func:`hot_keys`).

    Hot path: big-side rows get a deterministic salt in [0, buckets);
    the small side is exploded ``buckets``x for hot keys only; join on
    (key, salt). Cold path: plain join. Union of both preserves exact
    join semantics for ``inner`` and ``left`` (big-side-preserving)
    joins; ``right``/``full`` are rejected — an unmatched hot small
    row exists ``buckets`` times on the salted path and would be
    emitted once per replica.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join_hot_keys supports how='inner'|'left' only; "
            "right/full would duplicate unmatched exploded small-side "
            "rows"
        )
    hot = F.broadcast(hot.select(key).withColumn("_hot", F.lit(True)))

    big_flagged = big.join(hot, on=key, how="left")
    big_hot = big_flagged.filter(F.col("_hot")).drop("_hot")
    big_cold = big_flagged.filter(F.col("_hot").isNull()).drop("_hot")

    small_flagged = small.join(hot, on=key, how="left")
    small_hot = small_flagged.filter(F.col("_hot")).drop("_hot")
    small_cold = small_flagged.filter(F.col("_hot").isNull()).drop("_hot")

    # mix in a per-row id so duplicate hot-key rows spread (see
    # with_salt); any salt assignment joins correctly because the
    # small side is replicated to every bucket
    big_salted = with_salt(big_hot, buckets)
    small_salted = small_hot.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))

    joined_hot = big_salted.join(
        small_salted, on=[key, "_salt"], how=how
    ).drop("_salt")
    joined_cold = big_cold.join(small_cold, on=key, how=how)
    return joined_hot.unionByName(joined_cold)
