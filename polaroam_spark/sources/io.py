"""Ingest / localize / partitioned write — the reference's entry path
(reference read_localize_write.py) re-expressed Spark-first.

Every step stays declarative so Catalyst pushes the projection and the
``error < threshold`` predicate into the parquet/CSV scan (check with
``.explain``: PushedFilters + pruned ReadSchema), and the partitioned
write is the built-in dynamic-partition parquet writer instead of the
reference's polario HiveDataset.

The timezone idiom (reference read_localize_write.py:19-27) is subtle
and preserved exactly: the UTC instant is converted to local wall
clock, the wall clock is re-stamped as UTC, and THAT epoch becomes the
canonical ``timestamp`` — i.e. downstream hour-of-day logic sees local
time while the column stays a plain epoch. With the session timezone
pinned to UTC (session.py), ``unix_timestamp(from_utc_timestamp(ts,
tz))`` is that exact composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: vendor column layout of the parquet sample (reference
#: read_localize_write.py:11-13)
PARQUET_VENDOR_COLUMNS = {
    "_c0": "uid",
    "_c2": "latitude",
    "_c3": "longitude",
    "_c5": "timestamp",
    "_c4": "error",
}

#: vendor column layout of the headerless CSV sample (reference
#: read_localize_write.py:53-55); Spark names headerless CSV columns
#: _c0.. while Polars names them column_1.., hence the offset.
CSV_VENDOR_COLUMNS = {
    "_c0": "uid",
    "_c2": "latitude",
    "_c3": "longitude",
    "_c5": "timestamp",
    "_c4": "error",
}


def _rename_project(df: DataFrame, columns: dict[str, str]) -> DataFrame:
    return df.select(
        *[F.col(src).alias(dst) for src, dst in columns.items()]
    )


def read_pings_parquet(
    spark: SparkSession,
    path: str,
    columns: dict[str, str] | None = None,
    max_error: float | None = 20.0,
) -> DataFrame:
    """Scan vendor parquet, rename to the canonical ping schema, and
    filter by GPS accuracy (reference read_localize_write.py:8-17).
    Glob paths work as in the reference; prefer partition-column
    filters over path globs so Catalyst prunes partitions.
    """
    df = spark.read.parquet(path)
    if columns:
        df = _rename_project(df, columns)
    if max_error is not None and "error" in df.columns:
        df = df.filter(F.col("error") < F.lit(float(max_error)))
    return df


def read_pings_csv(
    spark: SparkSession,
    path: str,
    columns: dict[str, str] | None = None,
    sep: str = ",",
    max_error: float | None = 30.0,
    timestamp_unit: str = "ms",
) -> DataFrame:
    """Scan headerless (optionally gzipped — Spark decompresses by
    extension) vendor CSV (reference read_localize_write.py:50-59).
    Millisecond vendor timestamps are scaled to seconds
    (reference's ``timestamp / 1000``).
    """
    df = spark.read.csv(path, sep=sep, header=False, inferSchema=True)
    if columns:
        df = _rename_project(df, columns)
    if max_error is not None and "error" in df.columns:
        df = df.filter(F.col("error") < F.lit(float(max_error)))
    # only scale when the canonical column exists — without a rename
    # map the columns are still _c0.. and there is nothing to scale
    if timestamp_unit == "ms" and "timestamp" in df.columns:
        df = df.withColumn(
            "timestamp", (F.col("timestamp") / 1000).cast("long")
        )
    return df


def localize_timestamps(df: DataFrame, tz: str) -> DataFrame:
    """Bake local wall-clock time into the epoch ``timestamp`` and add
    the ``date_trunc`` partition key (reference
    read_localize_write.py:19-27; see module docstring).
    """
    local = F.from_utc_timestamp(F.timestamp_seconds("timestamp"), tz)
    return df.withColumns(
        {
            "timestamp": F.unix_timestamp(local),
            "date_trunc": F.date_format(local, "yyyy-MM-dd"),
        }
    )


def hash_uid(df: DataFrame, uid_col: str = "uid") -> DataFrame:
    """Deterministic 63-bit integer uid from the string uid.

    The reference intends ``sha256(uid) % 2**63`` but actually hashes
    the literal string ``"uid"`` for every row — a bug that collapses
    all users to one id (reference read_localize_write.py:38-46, 57).
    We implement the clear intent: sha-256 of the *column value*,
    folded to a non-negative long by taking the top 15 hex digits
    (60 bits). Divergence documented; the exact modulus differs from
    the reference's ``% 2**63`` but both are stable injective-enough
    fingerprints.
    """
    return df.withColumn(
        uid_col,
        F.conv(F.substring(F.sha2(F.col(uid_col).cast("string"), 256), 1, 15), 16, 10).cast(
            "long"
        ),
    )


def users_with_min_days(
    df: DataFrame, min_days: int = 7, date_col: str = "date_trunc"
) -> DataFrame:
    """Keep users observed on more than ``min_days - 1`` distinct days
    (reference read_localize_write.py:62-83: n_unique > 6 ⇒ ≥ 7).
    Implemented as a semi join against the qualifying-uid set — the
    reference's inner join + drop adds a column only to drop it.
    """
    qualifying = (
        df.groupBy("uid")
        .agg(F.countDistinct(date_col).alias("n_days"))
        .filter(F.col("n_days") >= F.lit(int(min_days)))
        .select("uid")
    )
    return df.join(qualifying, on="uid", how="left_semi")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str = "date_trunc",
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet write (reference
    read_localize_write.py:29-33 via polario; here the built-in
    dynamic-partition writer). Snappy parquet, one directory per
    ``partition_col`` value.
    """
    df.write.mode(mode).partitionBy(partition_col).parquet(path)


def write_sorted_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str = "date_trunc",
    sort_cols: tuple[str, ...] = ("uid", "timestamp"),
    mode: str = "overwrite",
) -> None:
    """Partitioned write with rows clustered and sorted inside each
    output file: repartition by the partition column (one shuffle, so
    each task owns whole partitions — no small-file explosion from
    every task writing every partition) and sort within partitions by
    ``sort_cols``. Sorted (uid, timestamp) runs compress far better
    (RLE/dictionary) and give downstream per-user scans row-group
    locality — at 100 TB the difference between a layout and a heap.
    """
    (
        df.repartition(partition_col)
        .sortWithinPartitions(partition_col, *sort_cols)
        .write.mode(mode)
        .partitionBy(partition_col)
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str = "uid",
    num_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed + sorted managed table: rows are hashed
    into ``num_buckets`` files per partition by ``bucket_col`` and
    sorted within each bucket.

    Two tables bucketed the same way join WITHOUT a shuffle — Spark
    recognizes the co-located layout and plans a sort-merge join with
    zero Exchange on either side (verified in tests via .explain).
    At 100 TB this converts the dominant join cost (shuffling both
    sides) into a local merge. Bucketing requires the table catalog
    (``saveAsTable``), not a bare path.
    """
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def write_csv(
    df: DataFrame, path: str, sep: str = ",", mode: str = "overwrite"
) -> None:
    """CSV sink (reference get_stops_and_clusters.py:168, 185)."""
    df.write.mode(mode).option("sep", sep).option("header", True).csv(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = "gzip",
) -> None:
    """JSON-Lines sink — the interchange format most LLM training
    pipelines ingest/emit (one JSON object per line, gzip-splittable
    per file). Spark's native json writer: one file per partition, so
    upstream partitioning controls shard count/size.

    Beyond-reference component (the reference has parquet/CSV only).
    """
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark, path: str, schema=None) -> DataFrame:
    """JSON-Lines scan. Pass ``schema`` in production: without it
    Spark runs a full inference pre-pass over the data — a 2× read at
    100 TB — and silently widens disagreeing rows to string.
    Gzip-compressed inputs are detected by extension; .gz files are
    not splittable, so shard size should be controlled at write time.
    """
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def upsert_parquet(
    spark,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    version_col: str,
) -> None:
    """Keyed upsert into a bare-parquet dataset: union the current
    contents with ``updates`` and keep, per key, the row with the
    highest ``version_col`` (ties break toward the update by input
    order of the union — pass a strictly increasing version to avoid
    relying on it). The poor-man's MERGE for deployments without a
    table format; on Delta/Iceberg use the native MERGE INTO instead,
    which this mirrors semantically.

    The merged frame is materialized BEFORE the overwrite
    (session.materialize: a RELIABLE checkpoint when a checkpoint dir
    is configured, localCheckpoint otherwise): Spark reads lazily, so
    writing over the path a plan still reads from would race the scan
    of its own input — and an executor-local checkpoint dying mid-
    overwrite would destroy the dataset with no recompute path, which
    is why the reliable variant matters here more than anywhere.
    The checkpoint is released once the write lands. Rewrite cost is
    the whole dataset — at scale, partition the data and restrict the
    upsert to affected partitions.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from polaroam_spark.session import materialize, release

    current = spark.read.parquet(path)
    merged = current.unionByName(updates)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc()
    )
    latest = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    latest = materialize(latest)
    # release only AFTER a successful write: if the overwrite dies
    # midway, the checkpoint is the sole surviving copy of the data
    latest.write.mode("overwrite").parquet(path)
    release(latest)


def compact_files(
    spark,
    path: str,
    target_files: int,
) -> None:
    """Rewrite a parquet dataset into ``target_files`` files — the
    small-file compaction every long-running ingest needs (thousands
    of per-batch files turn scan planning and open() overhead into
    the bottleneck long before data volume does). Uses coalesce (no
    shuffle) when reducing file count. Same read-before-overwrite
    reliable materialization as :func:`upsert_parquet`.
    """
    from polaroam_spark.session import materialize, release

    df = spark.read.parquet(path).coalesce(int(target_files))
    df = materialize(df)
    # success-only release — see upsert_parquet
    df.write.mode("overwrite").parquet(path)
    release(df)


def collect_column_stats(
    df: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """Per-column statistics — ``[col_name, n_rows, n_nulls,
    n_distinct, min_str, max_str]`` — the ANALYZE-style summary that
    drives partition pruning decisions, skew diagnosis, and data
    validation gates. One aggregation pass computes every column's
    stats (a struct per column), then unpivots driver-side over the
    COLUMN LIST (bounded by schema width, not data size); min/max are
    stringified so one schema fits all column types.
    """
    from pyspark.sql import functions as F

    cols = list(cols or df.columns)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs.append(
            F.struct(
                F.sum(F.col(c).isNull().cast("long")).alias("nulls"),
                F.count_distinct(F.col(c)).alias("ndv"),
                F.min(F.col(c)).cast("string").alias("mn"),
                F.max(F.col(c)).cast("string").alias("mx"),
            ).alias(f"_s{i}")
        )
    row = df.agg(*aggs)
    per_col = [
        row.select(
            F.lit(c).alias("col_name"),
            F.col("_n").alias("n_rows"),
            F.col(f"_s{i}")["nulls"].alias("n_nulls"),
            F.col(f"_s{i}")["ndv"].alias("n_distinct"),
            F.col(f"_s{i}")["mn"].alias("min_str"),
            F.col(f"_s{i}")["mx"].alias("max_str"),
        )
        for i, c in enumerate(cols)
    ]
    out = per_col[0]
    for p in per_col[1:]:
        out = out.unionByName(p)
    return out


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """Write a DataFrame as ORC — the columnar interchange format of
    the Hive/Presto ecosystem (Spark ships the reader/writer
    natively; same predicate-pushdown and column-pruning behavior as
    parquet, different ecosystem). The reference is parquet-only;
    this exists so a lake whose upstream emits ORC needs no
    conversion step."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC dataset (glob/directory semantics identical to
    ``spark.read.parquet``; filters and projected columns push into
    the scan the same way — verify with ``.explain``)."""
    return spark.read.orc(path)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
    status_col: str = "diff_status",
) -> DataFrame:
    """Keyed diff between two snapshots of the same dataset — the
    change-data-capture half of :func:`upsert_parquet`: given
    yesterday's and today's snapshot, which keys were ``added``,
    ``removed``, or ``changed`` (and what do they look like now)?

    Output: ``[*key_cols, *compare_cols as old_<c>, *compare_cols as
    new_<c>, status_col]`` — one row per key present in either side;
    ``unchanged`` rows are dropped unless ``include_unchanged`` (at
    snapshot scale the unchanged set IS the dataset; the diff is
    interesting precisely because it is small). ``compare_cols``
    defaults to every shared non-key column. A key duplicated within
    one side raises no error here — every pairing appears — so
    de-duplicate first if keys are not unique (the upsert contract).

    Change detection is per-column NULL-SAFE equality (``<=>``),
    decided in the join condition's output columns, not via a
    stringified row hash — no formatting pitfalls on doubles /
    timestamps and no md5 cost. Plan shape: ONE full-outer
    shuffle join on the key (both sides hash-partition once; with
    both snapshots bucketed on the key it is exchange-free — the
    write_bucketed_table path), then pure JVM boolean expressions.
    That single key-shuffle is the floor for any keyed diff; at
    100 TB, partition snapshots by ingest date and diff per
    partition so only changed partitions move.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    shared = [c for c in old.columns if c in set(new.columns)]
    if compare_cols is None:
        compare_cols = [c for c in shared if c not in set(key_cols)]
    missing = [
        c
        for c in list(key_cols) + list(compare_cols)
        if c not in old.columns or c not in new.columns
    ]
    if missing:
        raise ValueError(
            f"columns {missing} not present on both sides"
        )
    o = old.select(
        *key_cols,
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, on=list(key_cols), how="full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out = j.withColumn(status_col, status).drop("_in_old", "_in_new")
    if not include_unchanged:
        out = out.filter(F.col(status_col) != "unchanged")
    return out


def file_pruning_report(
    spark: SparkSession,
    path: str,
    column: str,
    lo,
    hi,
) -> DataFrame:
    """Per-file data-skipping report for a parquet dataset: for each
    file, the footer min/max of ``column`` and whether a scan with
    the predicate ``column BETWEEN lo AND hi`` must read it —
    ``[file, n_rows, col_min, col_max, would_scan]``. This is the
    measurement behind layout decisions (:func:`write_sorted_
    partitioned`, the z-order key): a layout is earning its keep
    exactly when this report prunes most files for the workload's
    predicates, and a report that scans everything says the sort/
    partition column is wrong.

    Footer reads are DISTRIBUTED: the file list (one driver-side
    listing, bounded by file count) fans out through
    ``mapInPandas``, each task opening only its files' footers via
    ``pyarrow`` — no data pages are read anywhere, so the cost is
    O(files), not O(bytes). Conservative on absent statistics: a
    file whose footer lacks min/max for the column reports NULL
    bounds and ``would_scan=true`` (never prune on missing
    evidence). Min/max are returned as strings (parquet stats are
    typed per file; the string form is portable across numeric and
    string columns — cast downstream when comparing numerically).
    """
    import pandas as pd
    from pyspark.sql import types as T

    import pyarrow.fs as pafs

    fs, root = pafs.FileSystem.from_uri(path) if "://" in path else (
        pafs.LocalFileSystem(),
        path,
    )
    info = fs.get_file_info(pafs.FileSelector(root, recursive=True))
    files = sorted(
        f.path
        for f in info
        if f.type == pafs.FileType.File
        and f.path.endswith(".parquet")
    )
    if not files:
        raise ValueError(
            f"file_pruning_report: no parquet files under {path}"
        )
    flist = spark.createDataFrame(
        [(f,) for f in files], "file string"
    ).repartition(min(len(files), 64))
    col_name = column
    lo_v, hi_v = lo, hi
    schema = T.StructType(
        [
            T.StructField("file", T.StringType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("col_min", T.StringType()),
            T.StructField("col_max", T.StringType()),
            T.StructField("would_scan", T.BooleanType()),
        ]
    )

    # the worker rebuilds the filesystem from the ORIGINAL uri, not
    # from the listed paths: pyarrow listings return SCHEME-LESS
    # paths ("bucket/key"), so deriving the fs from them would open
    # object-store files through LocalFileSystem and fail
    src_uri = path if "://" in path else None

    def _footers(batches):
        import pyarrow.fs as _pafs
        import pyarrow.parquet as _pq

        _fs = (
            _pafs.FileSystem.from_uri(src_uri)[0]
            if src_uri
            else _pafs.LocalFileSystem()
        )
        for pdf in batches:
            out = []
            for f in pdf["file"]:
                with _fs.open_input_file(f) as fh:
                    md = _pq.ParquetFile(fh).metadata
                idx = {
                    md.schema.column(i).name: i
                    for i in range(md.num_columns)
                }
                ci = idx.get(col_name)
                mn = mx = None
                have = ci is not None
                if have:
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(ci).statistics
                        if (
                            st is None
                            or not st.has_min_max
                        ):
                            have = False
                            break
                        mn = (
                            st.min
                            if mn is None or st.min < mn
                            else mn
                        )
                        mx = (
                            st.max
                            if mx is None or st.max > mx
                            else mx
                        )
                if not have:
                    out.append((f, md.num_rows, None, None, True))
                else:
                    scan = not (mx < lo_v or mn > hi_v)
                    out.append(
                        (f, md.num_rows, str(mn), str(mx), scan)
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "file",
                    "n_rows",
                    "col_min",
                    "col_max",
                    "would_scan",
                ],
            )

    return flist.mapInPandas(_footers, schema=schema)
