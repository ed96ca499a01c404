"""Temporal join operators Spark lacks natively — as-of join and
point-in-interval join — built as shuffle-efficient compositions of
DataFrame ops (SURVEY.md §2c notes the reference has neither; these
are the custom-operator extensions the build brief calls for).

- ``asof_join``: for each left row, the most recent right row at or
  before its timestamp (per key). Implemented with the union +
  last-non-null-propagation idiom: ONE shuffle on the key, one
  in-partition sort, no join explosion — the classic
  merge-as-you-sort plan, which beats the naive
  join-then-rank-then-filter (that one materializes every candidate
  pair).
- ``point_in_interval_join``: match point rows to interval rows that
  contain them. Intervals are replicated onto fixed-size time buckets
  (explode over the covered bucket range), points map to exactly one
  bucket, candidates equi-join on (key, bucket) and exact-filter —
  the standard range-bucketing rewrite that keeps the join an
  equi-join at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "timestamp",
    right_ts: str = "timestamp",
    tolerance: int | None = None,
    suffix: str = "_right",
    time_chunk: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: append the nearest right row per ``on`` key;
    unmatched left rows keep nulls. ``direction='backward'`` (default)
    matches the latest right row with ``right_ts <= left_ts``;
    ``'forward'`` the earliest with ``right_ts >= left_ts``.
    ``tolerance`` (same unit as the timestamps) drops matches farther
    than ``tolerance`` from ``left_ts`` on the match side.

    Ties: a right row at exactly ``left_ts`` matches in both
    directions (right sorts before left at equal timestamps).

    Forward is backward on NEGATED timestamps — one sign flip on the
    internal sort key, so both directions share one plan shape, the
    same tie rule, and the same ``time_chunk`` hot-key guard.

    ``time_chunk`` is the HOT-KEY GUARD (off by default). The base
    plan windows over ``partitionBy(on)`` — one task per key, so a key
    carrying most of the rows becomes a single straggler task (2.3×
    wall measured at 10M rows with a 50% hot key; linear in hot-key
    size — see BASELINE.md round-5 probe). With ``time_chunk=C``
    (same unit as the timestamps) the timeline splits into C-sized
    chunks and the big window partitions by ``(key, chunk)`` instead:

    1. per (key, chunk) the latest right payload in that chunk — one
       small aggregate of the right side;
    2. a per-key prefix scan over CHUNKS (rows = chunks, not data)
       propagates the latest payload from all earlier chunks into
       each left-occupied chunk — the carry-in;
    3. carry-ins enter the main union as synthetic right rows at
       chunk start, so the (key, chunk) window sees exactly what the
       (key) window would have seen.

    Identical results to the base plan (property-tested); costs one
    extra shuffle of the left side (the distinct (key, chunk)
    request set), so use it when keys are skewed, not by default.
    Pick C so a hot key's rows-per-chunk is comfortably one task
    (~1M rows); a burst inside one chunk remains one task.
    """
    reserved = {"_ts", "_side", "_payload", "_match",
                "_chunk", "_cside", "_cpay", "_ci"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        # silent collision would produce ambiguous columns or a wrong
        # union, not an error — fail loudly instead
        raise ValueError(
            f"asof_join reserves column names {sorted(reserved)}; "
            f"rename {sorted(clash)} in the input frames first"
        )
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}"
        )
    sign = 1 if direction == "backward" else -1
    rpayload = [c for c in right.columns if c != on]
    # output-name collision check up front: a right column whose
    # suffixed name ALSO exists on the left would emit two identical
    # column names — ambiguous downstream, so fail loudly now
    out_names = list(left.columns) + [
        f"{c}{suffix}" if c in left.columns else c for c in rpayload
    ]
    dups = sorted({n for n in out_names if out_names.count(n) > 1})
    if dups:
        raise ValueError(
            f"asof_join output would contain duplicate column names "
            f"{dups}: the suffixed right column collides with an "
            f"existing left column; pass a different suffix"
        )
    # SQL as-of semantics: a null key or null timestamp matches
    # nothing. Dropping such RIGHT rows achieves both sides of that —
    # null-key/null-ts left rows then sit in window partitions (or
    # sort positions) with no right rows before them and get a null
    # match, instead of null keys matching each other as partition
    # values.
    right = right.filter(
        F.col(on).isNotNull() & F.col(right_ts).isNotNull()
    )
    payload = F.struct(*[F.col(c) for c in rpayload])
    r = right.select(
        F.col(on),
        (F.col(right_ts).cast("long") * sign).alias("_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
    )
    # multiple right rows at the same (key, ts) would be unordered
    # window peers and last() would pick one nondeterministically —
    # collapse to the struct-max payload (arbitrary but stable)
    r = r.groupBy(on, "_ts", "_side").agg(
        F.max("_payload").alias("_payload")
    )
    lcols = left.columns
    l = left.select(
        "*",
        (F.col(left_ts).cast("long") * sign).alias("_ts"),
        F.lit(1).alias("_side"),
    )

    # Build union frames with identical schemas explicitly.
    l2 = l.withColumn(
        "_payload", F.lit(None).cast(r.schema["_payload"].dataType)
    )
    r2 = r.select(
        *[
            F.col(on).alias(c) if c == on else F.lit(None).cast(
                left.schema[c].dataType
            ).alias(c)
            for c in lcols
        ],
        "_ts",
        "_side",
        "_payload",
    )
    combined = l2.unionByName(r2)

    if time_chunk is None:
        w = (
            Window.partitionBy(on)
            .orderBy("_ts", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        C = int(time_chunk)
        if C <= 0:
            raise ValueError("time_chunk must be a positive duration")
        ptype = r.schema["_payload"].dataType
        # (1) latest right payload per (key, chunk): max-of-struct
        # picks the row with the greatest _ts (payload max on ties —
        # same rule as the per-(key, ts) collapse above)
        carry = (
            r.withColumn("_chunk", F.floor(F.col("_ts") / C))
            .groupBy(on, "_chunk")
            .agg(F.max(F.struct("_ts", "_payload")).alias("_c"))
            .select(
                on,
                "_chunk",
                F.lit(1).alias("_cside"),
                F.col("_c._payload").alias("_cpay"),
            )
        )
        # (2) chunks that contain left rows request a carry-in; the
        # prefix scan runs over CHUNK rows per key (horizon/C rows,
        # not data rows). A request at chunk c sorts before the carry
        # produced IN chunk c, so it sees strictly-earlier chunks.
        requests = (
            l.select(
                F.col(on), F.floor(F.col("_ts") / C).alias("_chunk")
            )
            .dropDuplicates()
            .select(
                on,
                "_chunk",
                F.lit(0).alias("_cside"),
                F.lit(None).cast(ptype).alias("_cpay"),
            )
        )
        cw = (
            Window.partitionBy(on)
            .orderBy("_chunk", "_cside")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry_in = (
            carry.unionByName(requests)
            .withColumn(
                "_ci", F.last("_cpay", ignorenulls=True).over(cw)
            )
            .filter(
                (F.col("_cside") == 0) & F.col("_ci").isNotNull()
            )
        )
        # (3) synthetic right rows at chunk start (side -2 sorts
        # before real in-chunk right rows at the same timestamp)
        synth = carry_in.select(
            *[
                F.col(on).alias(c)
                if c == on
                else F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in lcols
            ],
            (F.col("_chunk") * C).cast("long").alias("_ts"),
            F.lit(-2).alias("_side"),
            F.col("_ci").alias("_payload"),
            "_chunk",
        )
        combined = (
            combined.withColumn(
                "_chunk", F.floor(F.col("_ts") / C)
            ).unionByName(synth)
        )
        w = (
            Window.partitionBy(on, "_chunk")
            .orderBy("_ts", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    matched = combined.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)

    if tolerance is not None:
        # cast: the payload keeps the right timestamp in its original
        # type (possibly TIMESTAMP) while _ts is already long (and
        # sign-flipped for direction='forward' — flip the payload ts
        # the same way so the distance check stays one inequality)
        matched = matched.withColumn(
            "_match",
            F.when(
                F.col(f"_match.{right_ts}").cast("long") * sign
                >= F.col("_ts") - F.lit(int(tolerance)),
                F.col("_match"),
            ),
        )

    out_cols = [F.col(c) for c in lcols]
    for c in rpayload:
        name = f"{c}{suffix}" if c in lcols else c
        out_cols.append(F.col(f"_match.{c}").alias(name))
    return matched.select(*out_cols)


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | None = None,
    point_ts: str = "timestamp",
    start_col: str = "t_start",
    end_col: str = "t_end",
    bucket_size: int = 86400,
    how: str = "inner",
    point_id: str | None = None,
    suffix: str = "_ival",
) -> DataFrame:
    """Join point rows to the interval rows containing them
    (``start <= point <= end``), optionally also keyed by ``on``.

    ``bucket_size`` trades replication for candidate pruning: each
    interval appears in ``(len / bucket_size) + 1`` buckets; pick it
    near the typical interval LENGTH (measured: oversizing 24× cost
    6.8× wall at 10M points — BASELINE.md round-5 probe).

    Interval columns whose names also exist on the point side (other
    than the ``on`` key) are renamed with ``suffix`` — the same rule
    as :func:`asof_join` — so neither mode emits ambiguous duplicate
    columns (inner) or silently drops the interval's copy (left).

    ``how='inner'`` (default) emits one row per (point, containing
    interval). ``how='left'`` additionally keeps points contained by
    NO interval, with null interval columns — it requires
    ``point_id`` naming a UNIQUE point key, because the bucketed plan
    cannot otherwise distinguish "no interval in my bucket" from
    "bucket-mates that fail containment" and would silently drop
    rows: the left variant is the inner result re-joined to the full
    point set on ``point_id`` (one extra shuffle on the point key).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"how must be 'inner' or 'left', got {how!r}"
        )
    if how == "left" and point_id is None:
        raise ValueError(
            "how='left' requires point_id (a unique point key): "
            "without it unmatched points are indistinguishable from "
            "failed bucket candidates"
        )
    clash = {"_bucket"} & (set(points.columns) | set(intervals.columns))
    if clash:
        raise ValueError(
            "point_in_interval_join reserves column name '_bucket'; "
            "rename it in the input frames first"
        )
    b = int(bucket_size)
    if b <= 0:
        # division by a non-positive bucket silently yields null
        # buckets (and an empty/all-null result) under non-ANSI Spark
        raise ValueError("bucket_size must be a positive duration")
    shared = [
        c
        for c in intervals.columns
        if c in points.columns and c != on
    ]
    if shared:
        renames = {c: f"{c}{suffix}" for c in shared}
        taken = set(points.columns) | set(intervals.columns)
        bad = sorted(n for n in renames.values() if n in taken)
        if bad:
            raise ValueError(
                f"point_in_interval_join suffix rename collides with "
                f"existing columns {bad}; pass a different suffix"
            )
        intervals = intervals.select(
            *[
                F.col(c).alias(renames.get(c, c))
                for c in intervals.columns
            ]
        )
        start_col = renames.get(start_col, start_col)
        end_col = renames.get(end_col, end_col)
    ivals = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(start_col) / b).cast("long"),
                (F.col(end_col) / b).cast("long"),
            )
        ),
    )
    pts = points.withColumn(
        "_bucket", (F.col(point_ts) / b).cast("long")
    )
    keys = ["_bucket"] + ([on] if on else [])
    joined = pts.join(ivals, on=keys, how="inner")
    cond = (F.col(point_ts) >= F.col(start_col)) & (
        F.col(point_ts) <= F.col(end_col)
    )
    inner = joined.filter(cond).drop("_bucket")
    if how == "inner":
        return inner
    ival_cols = [c for c in intervals.columns if c not in points.columns]
    matches = inner.select(point_id, *ival_cols)
    return points.join(matches, on=point_id, how="left")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str | None = None,
    left_start: str = "t_start",
    left_end: str = "t_end",
    right_start: str = "t_start",
    right_end: str = "t_end",
    bucket_size: int = 86400,
    suffix: str = "_r",
) -> DataFrame:
    """Pairs of OVERLAPPING intervals across two tables
    (``l.start <= r.end AND r.start <= l.end``), optionally also
    keyed by ``on`` — the interval-interval sibling of
    :func:`point_in_interval_join` (meeting conflicts, session
    concurrency, downtime attribution).

    Scale shape: each side explodes into the time buckets it spans
    and candidates meet in a bucket equi-join — never a cross
    product. A pair overlapping across k shared buckets would emit k
    times; instead of a distinct (an extra shuffle over the whole
    result), each pair is kept only in its CANONICAL bucket —
    ``max(floor(l.start/b), floor(r.start/b))``, the first bucket the
    pair shares — which dedupes for free in the same filter. Pick
    ``bucket_size`` near the typical interval length (same tradeoff
    as j8's probe: longer intervals replicate across more buckets).

    Right-side columns colliding with left names (other than ``on``)
    are renamed with ``suffix``.
    """
    b = int(bucket_size)
    if b <= 0:
        raise ValueError("bucket_size must be a positive duration")
    clash = {"_bucket"} & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            "interval_overlap_join reserves column name '_bucket'; "
            "rename it in the input frames first"
        )
    renames = {
        c: f"{c}{suffix}"
        for c in right.columns
        if c in left.columns and c != on
    }
    if renames:
        right = right.select(
            *[F.col(c).alias(renames.get(c, c)) for c in right.columns]
        )
        right_start = renames.get(right_start, right_start)
        right_end = renames.get(right_end, right_end)

    lb = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(left_start) / b).cast("long"),
                (F.col(left_end) / b).cast("long"),
            )
        ),
    )
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(right_start) / b).cast("long"),
                (F.col(right_end) / b).cast("long"),
            )
        ),
    )
    keys = ["_bucket"] + ([on] if on else [])
    overlap = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    canonical = F.col("_bucket") == F.greatest(
        (F.col(left_start) / b).cast("long"),
        (F.col(right_start) / b).cast("long"),
    )
    return (
        lb.join(rb, on=keys, how="inner")
        .filter(overlap & canonical)
        .drop("_bucket")
    )
