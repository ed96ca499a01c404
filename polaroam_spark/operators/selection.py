"""Exact distributed global selection (top-k without a global sort).

The naive exact global top-k — ``row_number() OVER (ORDER BY ...)``
— moves every row into ONE task: Spark plans an empty-frame window as
a single partition, so the "skinny sort" stalls or OOMs at billions
of rows. This module provides the scale path: an exact, deterministic
top-k by ``(score DESC, key ASC)`` whose every stage is distributed
and whose every intermediate frame is a PURE FILTER of the input, so
a lost block / task retry recomputes the identical rows (no reliance
on Spark's seeded range sampler, which re-draws per materialization).

Used by :func:`polaroam_spark.operators.sampling.gumbel_topk_sample`
(the DSIR sampling step) and usable standalone for any "exact top-k
of a huge frame" need the reference's LIMIT-after-SORT covers
(reference read_localize_write.py drives sorted heads through Polars'
single-node sort; here the same semantics must hold on a cluster).
"""

from __future__ import annotations

import math
import warnings

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_global_topk(
    df: DataFrame,
    k: int,
    score_col: str,
    key_col: str,
    *,
    driver_cap: int = 1_000_000,
    single_part_cap: int = 2_000_000,
    sample_target: int = 200_000,
    seed: int = 17,
    max_rounds: int = 8,
) -> DataFrame:
    """EXACT top-``k`` rows of ``df`` by ``(score DESC, key ASC)``,
    computed without ever sorting the full frame in one task.

    Semantics are identical to
    ``df.withColumn(r, row_number().over(Window.orderBy(desc(score),
    key))).filter(r <= k)`` — same rows, bit-for-bit — but the plan
    scales:

    - ``k <= driver_cap``: ``orderBy(...).limit(k)``, which Catalyst
      plans as ``TakeOrderedAndProject`` — per-partition top-k heaps
      merged on the driver, O(k) driver memory, no shuffle of the
      losers.
    - ``k > driver_cap``: iterative threshold refinement (classic
      distributed selection). Each round runs exactly TWO passes
      over the candidate band (r20, guide §2.4/§5 — previously
      three or more: count, a collected hash sample, verify): (a)
      ONE aggregation computes the band size together with a
      fixed-fraction ``percentile_approx`` grid of its scores
      (O(grid) driver bytes instead of a ``sample_target``-row
      collect), (b) candidate thresholds are read off the grid
      around the ``need/band`` quantile ± a margin covering the
      grid resolution and the sketch's deterministic rank-error
      bound, and VERIFIED with one exact count: rows above ``hi``
      are provably in the top-k (kept by filter, never shuffled),
      rows below ``lo`` provably out. A failed verification widens
      the margin and re-verifies against the SAME grid — retries
      re-run only the cheap count pass, never a new sample. The
      band shrinks ~100x per round; once the remaining ``need``
      fits ``driver_cap`` (or the band fits ``single_part_cap``)
      the tail is resolved exactly. The grid only steers
      EFFICIENCY — correctness comes from the verified counts, so
      a bad quantile estimate costs a retry, never a wrong row.

    Determinism: kept sets are filters ``score > hi`` with ``hi``
    an exact collected double, so task retries within a run filter
    the identical rows; ties on ``score`` stay in the band and are
    resolved by the final exact rank with the ``key`` tiebreak. The
    returned ROWS are the exact top-k regardless of which
    thresholds a run's sketch happened to produce (every kept
    filter is count-verified).

    Preconditions: ``score_col`` non-NULL (filter first; NaN follows
    Spark's NaN-greatest ordering on both paths but differs from
    ANSI oracles — keep NaN out of scored frames).

    ``sample_target`` sizes the quantile grid
    (``~16*sqrt(sample_target)`` points, clamped to [16, 2048]) —
    the name predates the r20 grid rewrite, when it was a collected
    sample's row budget. ``seed`` is retained for API compatibility;
    the grid path draws no sample, so it is unused.

    Degenerate guard: if a round cannot shrink the band (e.g. nearly
    all scores identical, so no threshold separates it), the band is
    ranked in a single partition regardless of size, with a
    ``UserWarning`` — exact result, degraded plan, never wrong.
    """
    k = int(k)
    if k <= 0:
        return df.limit(0)
    score = F.col(score_col).cast("double")
    key = F.col(key_col)

    def _take_ordered(frame: DataFrame, n: int) -> DataFrame:
        return frame.orderBy(score.desc(), key.asc()).limit(int(n))

    if k <= int(driver_cap):
        return _take_ordered(df, k)

    def _rank_band(frame: DataFrame, n: int) -> DataFrame:
        w = Window.orderBy(score.desc(), key.asc())
        return (
            frame.withColumn("_topk_rn", F.row_number().over(w))
            .filter(F.col("_topk_rn") <= F.lit(int(n)))
            .drop("_topk_rn")
        )

    hi: "float | None" = None  # score > hi  => definitely kept
    lo: "float | None" = None  # score <= lo => definitely out
    need = k

    def _band_filter():
        f = F.lit(True)
        if hi is not None:
            f = f & (score <= F.lit(hi))
        if lo is not None:
            f = f & (score > F.lit(lo))
        return f

    # quantile grid: GRID+1 fixed fractions, so the one aggregation
    # below needs no prior knowledge of the band size; accuracy is
    # percentile_approx's deterministic rank-error knob (error <=
    # rows/accuracy)
    grid_n = max(
        16, min(2048, int(math.sqrt(max(1, int(sample_target)))) * 16)
    )
    acc = 10_000
    grid_fracs = [i / grid_n for i in range(grid_n + 1)]

    prev_cached: "DataFrame | None" = None
    for rnd in range(int(max_rounds)):
        band = df.filter(_band_filter())
        if need <= int(driver_cap):
            tail = _take_ordered(band, need)
            break
        # each refinement round runs two actions on the band (the
        # size+grid aggregation, verify counts, retries) — from the
        # SECOND round on, cache it so they don't each re-derive the
        # upstream lineage (r12 code review). Round 1's band is the
        # whole input: materializing the full corpus to save a few
        # skinny scans is the wrong trade at any scale (measured on
        # the 20M trivial-lineage probe: caching round 1 costs 8.8 s
        # vs 5.9 s uncached), while later bands are a few percent
        # and shrinking ~100x per round. Pure-filter determinism is
        # unaffected: a lost block recomputes the identical rows.
        if rnd >= 1:
            band = band.persist()
            if prev_cached is not None:
                prev_cached.unpersist()
            prev_cached = band
        # ONE pass: band size + the quantile grid (r20 — replaces
        # the separate count() and the sample_target-row collected
        # hash sample)
        row = band.agg(
            F.count("*").alias("_n"),
            F.percentile_approx(
                score,
                F.array(*[F.lit(f) for f in grid_fracs]),
                F.lit(acc),
            ).alias("_g"),
        ).collect()[0]
        bc = int(row["_n"])
        grid = row["_g"]
        if bc <= need:
            # invariant kept + bc >= k means bc == need here: every
            # band row provably qualifies — keep the (distributed,
            # pure-filter) band as-is; ranking it in one task would
            # recreate the stall this module exists to remove
            tail = band
            break
        if bc <= int(single_part_cap):
            tail = _rank_band(band, need)
            break
        q = 1.0 - float(need) / float(bc)
        new_hi = new_lo = None
        if grid:
            # margin covers one grid cell + the sketch's worst-case
            # rank error on both candidates
            eps = 2.0 / grid_n + 2.0 / acc
            for _ in range(4):  # widen margins until counts verify
                i_hi = min(grid_n, int(math.ceil((q + eps) * grid_n)))
                i_lo = max(0, int(math.floor((q - eps) * grid_n)))
                cand_hi = (
                    float(grid[i_hi]) if i_hi < grid_n else math.inf
                )
                cand_lo = (
                    float(grid[i_lo]) if i_lo > 0 else -math.inf
                )
                cnt = band.agg(
                    F.count(
                        F.when(score > F.lit(cand_hi), 1)
                    ).alias("chi"),
                    F.count(
                        F.when(score > F.lit(cand_lo), 1)
                    ).alias("clo"),
                ).collect()[0]
                c_hi, c_lo = int(cnt["chi"]), int(cnt["clo"])
                if c_hi <= need and c_lo >= need:
                    if math.isfinite(cand_hi) and c_hi > 0:
                        new_hi, need = cand_hi, need - c_hi
                    if math.isfinite(cand_lo) and c_lo < bc:
                        new_lo = cand_lo
                    break
                eps = min(1.0, eps * 2.0)
        progressed = False
        if new_hi is not None and (hi is None or new_hi < hi):
            hi, progressed = new_hi, True
        if new_lo is not None and (lo is None or new_lo > lo):
            lo, progressed = new_lo, True
        if not progressed:
            warnings.warn(
                f"exact_global_topk: band of {bc} rows has no "
                "separating score threshold (near-constant scores?) "
                "— resolving it in a single-partition rank; exact "
                "but not distributed",
                UserWarning,
                stacklevel=2,
            )
            tail = _rank_band(band, need)
            break
    else:
        warnings.warn(
            f"exact_global_topk: {max_rounds} refinement rounds did "
            "not shrink the band under the caps — resolving the "
            "remainder in a single-partition rank",
            UserWarning,
            stacklevel=2,
        )
        tail = _rank_band(df.filter(_band_filter()), need)

    if prev_cached is not None:
        # the returned frame must not pin executor storage (the
        # cache-registry lesson): release the round cache — tail is
        # a pure filter of df, so its one consumption-time recompute
        # is deterministic and costs a single scan
        prev_cached.unpersist()
    if hi is None:
        return tail
    return df.filter(score > F.lit(hi)).unionByName(tail)
