"""Time-series regularization — per-key resampling onto a fixed
grid with interpolation/gap-fill. The hypertable operation that turns
irregular event streams into the aligned series every downstream
rollup, forecast, or feature join expects.

Beyond-reference component (the reference's temporal surface is
sessionization + interval compaction; it has no resampler).

Scale shape: one shuffle keyed by the series key, then two
within-partition window scans (ascending for the backward neighbor,
descending for the forward one — the second sort is partition-local,
no extra exchange). The grid is generated per key with
``sequence``/``explode`` — never a driver-side loop — and is bounded
to the key's observed range, so a sparse key never inflates into a
global calendar.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: int,
    how: str = "linear",
) -> DataFrame:
    """Resample each key's series onto the ``step``-aligned epoch
    grid covering its observed range; returns
    ``[key_col, ts_col, value_col]`` with one row per grid point.

    - ``how='linear'``: linear interpolation between the bracketing
      observations, exact at grid points that coincide with an
      observation (guarded explicitly — ``v1 + (v2-v1)*1.0`` is not
      bit-exact in floats).
    - ``how='locf'``: last observation carried forward.

    Grid bounds use pure INTEGER arithmetic
    (``ceil_div(min)*step .. floor_div(max)*step``), so every grid
    point is bracketed by observations on both sides — no
    extrapolation ambiguity — and any engine reproduces the same
    grid (float division would round differently at exact
    multiples). Duplicate (key, ts) observations collapse to their
    MIN value first: an order-independent choice, unlike mean over
    3+ floats. Keys whose range contains no aligned grid point emit
    nothing.
    """
    if how not in ("linear", "locf"):
        raise ValueError(f"unsupported how={how!r}")
    step = int(step)
    if step <= 0:
        raise ValueError("step must be a positive number of seconds")

    obs = (
        df.select(
            F.col(key_col).alias("_k"),
            F.col(ts_col).cast("long").alias("_t"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .filter(
            F.col("_k").isNotNull()
            & F.col("_t").isNotNull()
            & F.col("_v").isNotNull()
        )
        .groupBy("_k", "_t")
        .agg(F.min("_v").alias("_v"))
    )
    # smallest multiple of step >= min, largest <= max — via pmod
    # (non-negative remainder), correct for any sign, pure integers
    bounds = obs.groupBy("_k").agg(
        (F.min("_t") + F.pmod(-F.min("_t"), F.lit(step)))
        .cast("long")
        .alias("_g0"),
        (F.max("_t") - F.pmod(F.max("_t"), F.lit(step)))
        .cast("long")
        .alias("_g1"),
    )
    grid = bounds.filter(F.col("_g1") >= F.col("_g0")).select(
        "_k",
        F.explode(
            F.sequence("_g0", "_g1", F.lit(step).cast("long"))
        ).alias("_t"),
    )
    unioned = grid.select(
        "_k", "_t", F.lit(None).cast("double").alias("_v"),
        F.lit(0).alias("_is_obs"),
    ).unionByName(
        obs.select("_k", "_t", "_v", F.lit(1).alias("_is_obs"))
    )

    # backward scan: at equal _t the obs row (is_obs=1) must come
    # BEFORE the grid row so "previous observation" includes a
    # same-timestamp observation
    w_back = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_is_obs").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward scan mirrors it
    w_fwd = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").desc(), F.col("_is_obs").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ov = F.when(F.col("_is_obs") == 1, F.col("_v"))
    ot = F.when(F.col("_is_obs") == 1, F.col("_t"))
    enriched = (
        unioned.withColumn("_v1", F.last(ov, ignorenulls=True).over(w_back))
        .withColumn("_t1", F.last(ot, ignorenulls=True).over(w_back))
        .withColumn("_v2", F.last(ov, ignorenulls=True).over(w_fwd))
        .withColumn("_t2", F.last(ot, ignorenulls=True).over(w_fwd))
        .filter(F.col("_is_obs") == 0)
    )
    if how == "locf":
        value = F.col("_v1")
    else:
        interp = F.col("_v1") + (F.col("_v2") - F.col("_v1")) * (
            (F.col("_t") - F.col("_t1")).cast("double")
            / (F.col("_t2") - F.col("_t1")).cast("double")
        )
        value = (
            F.when(F.col("_t2") == F.col("_t"), F.col("_v2"))
            .when(F.col("_t1") == F.col("_t"), F.col("_v1"))
            .otherwise(interp)
        )
    return enriched.select(
        F.col("_k").alias(key_col),
        F.col("_t").alias(ts_col),
        value.alias(value_col),
    )
