"""Streaming corpus selection: online Gumbel top-k.

The batch op (operators/sampling.py:gumbel_topk_sample) keeps the k
rows maximizing ``log_weight + Gumbel(0,1)`` with the Gumbel uniform
drawn from a content hash — weighted sampling without replacement as
a PURE FUNCTION of (keys, weights, seed). That purity is what makes
the streaming version exact: the score of a row never depends on
which batch delivered it, and the top-k of a union is the top-k of
the per-part top-k's, so folding each micro-batch's local top-k into
a running k-row state reproduces the batch answer over everything
seen so far — independent of batch boundaries, arrival order, or
replays (the merge is idempotent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hadoop_fs(spark, path: str):
    """(Hadoop FileSystem, Path) for any Spark-readable URI — local,
    ``file:``, HDFS, S3A alike. Using the JVM's own FS abstraction
    means the journal lives wherever the checkpoint does (r12 ADVICE:
    the os.listdir/shutil version silently no-op'd on non-POSIX
    stores, turning crash recovery into a silent restart-from-zero —
    exactly the failure the contract forbids)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    return fs, jpath


def _list_journal_batches(spark, journal_dir: str) -> "list[int]":
    """Batch ids with an entry under the journal dir, any filesystem."""
    fs, jpath = _hadoop_fs(spark, journal_dir)
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name.startswith("batch_id="):
            out.append(int(name.split("=", 1)[1]))
    return out


def streaming_gumbel_topk(
    docs_stream: DataFrame,
    checkpoint_dir: str,
    output_path: str,
    log_weight_col: str,
    key: str,
    k: int,
    seed: int = 29,
    trigger_available_now: bool = True,
):
    """Continuous weighted sampling without replacement: after every
    micro-batch, ``output_path`` holds exactly the rows
    ``gumbel_topk_sample(union of all batches so far, k=k, seed=seed)``
    would select, plus ``_gk_score`` and ``_batch_id``.

    Per batch: score (NULL weights excluded, same rule as batch),
    take the batch-local top-k via ``orderBy().limit(k)``
    (TakeOrderedAndProject — per-partition heaps, O(k) driver rows),
    merge with the running ≤k-row state, truncate to k, overwrite
    the snapshot. ``k`` is a DRIVER-BOUNDED design point (the same
    contract as ``streaming_heavy_hitters``'s capacity — selection
    states that must exceed driver memory belong in the batch op's
    distributed band-refinement path, not a stream).

    Restart semantics are EXACT, unlike the heavy-hitters sketch:
    the snapshot IS the complete state, so a restarted query reloads
    it and continues; a batch replayed after a crash re-merges
    idempotently (top-k(state ∪ batch) twice == once). Durability
    (r12 code review): a parquet overwrite deletes before it
    commits, so the consumer view at ``output_path`` alone could be
    lost to a crash mid-write. Each batch therefore FIRST appends an
    immutable journal entry (``<output_path>_journal/batch_id=N`` —
    no overwrite of history), THEN rewrites the consumer view, then
    prunes journal entries older than the previous batch. Structured
    Streaming only commits a batch to the checkpoint after
    ``foreachBatch`` returns, so every crash window replays the
    batch: mid-journal-write → the replay rewrites that entry;
    between journal and view → replay, idempotent; mid-view-write →
    the view is rebuilt from the intact journal on reload. Reload
    order: consumer view, else newest readable journal entry, else
    (only when neither path exists) a fresh empty state — an
    EXISTING but unreadable state raises instead of silently
    restarting from zero. Journal listing/pruning goes through the
    Hadoop FileSystem API, so the snapshot + journal live wherever
    the checkpoint does (local, ``file:``, HDFS, S3A).

    Keys must uniquely identify rows across the stream (the usual
    doc-id contract); a key re-delivered with the same weight merges
    to one row, bit-identically to the batch op's DISTINCT-key frame.
    A key re-delivered with a DIFFERENT weight (contract violation)
    MAX-merges — the higher-scored row wins, the one rule that keeps
    the state commutative/associative/idempotent and therefore
    independent of batch boundaries and replays; note the batch op
    over the raw union would instead see both rows.

    Feed a PROJECTED stream (key, weight, the columns the snapshot
    should carry) — every snapshot column rides through the bounded
    k-row collects.

    Returns the started StreamingQuery.
    """
    from polaroam_spark.functions.text import portable_hash64
    from polaroam_spark.operators.sampling import _HASH_SPACE

    k = int(k)
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    spark = docs_stream.sparkSession
    u = (
        portable_hash64(F.col(key).cast("string"), seed) + F.lit(0.5)
    ) / F.lit(_HASH_SPACE)
    score = F.col(log_weight_col).cast("double") - F.log(-F.log(u))

    state: dict = {}  # key value -> Row (with _gk_score)
    journal_dir = output_path.rstrip("/") + "_journal"

    def _read_rows(path: str) -> "list | None":
        try:
            return (
                spark.read.parquet(path).drop("_batch_id").collect()
            )
        except Exception:
            return None

    def _load_snapshot() -> None:
        rows = _read_rows(output_path)
        if rows is None:
            # consumer view unreadable (lost to a crash mid-write or
            # never written): recover from the newest journal entry —
            # listed through the Hadoop FS so HDFS/S3 checkpoints
            # recover exactly like local ones
            entries = sorted(
                _list_journal_batches(spark, journal_dir),
                reverse=True,
            )
            for b in entries:
                rows = _read_rows(f"{journal_dir}/batch_id={b}")
                if rows is not None:
                    break
            if rows is None and entries:
                raise RuntimeError(
                    "streaming_gumbel_topk: state exists at "
                    f"{journal_dir} but no entry is readable — "
                    "refusing to silently restart from zero"
                )
        for r in rows or []:
            state[r[key]] = r

    _load_snapshot()

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        top = (
            batch_df.filter(F.col(log_weight_col).isNotNull())
            .withColumn("_gk_score", score)
            .orderBy(F.desc("_gk_score"), F.col(key))
            .limit(k)
            .collect()  # bounded: <= k rows
        )
        # MAX-merge on re-delivered keys (r12 verdict #3): keep the
        # higher-scored row. Under the unique-key contract scores of
        # re-deliveries are identical (pure hash) and this is a no-op;
        # if a key DOES arrive with a different weight, max() is the
        # one merge that is commutative, associative and idempotent —
        # the snapshot stays independent of batch boundaries and
        # replay order (setdefault kept first-SEEN, an order artifact)
        for r in top:
            cur = state.get(r[key])
            if cur is None or r["_gk_score"] > cur["_gk_score"]:
                state[r[key]] = r
        survivors = sorted(
            state.values(), key=lambda r: (-r["_gk_score"], r[key])
        )[:k]
        state.clear()
        state.update((r[key], r) for r in survivors)
        snap_schema = (
            batch_df.withColumn("_gk_score", score)
            .filter(F.lit(False))
            .schema
        )
        snap = batch_df.sparkSession.createDataFrame(
            survivors, schema=snap_schema
        ).withColumn("_batch_id", F.lit(batch_id))
        # 1) immutable journal entry (replay overwrites only its own)
        entry = f"{journal_dir}/batch_id={batch_id}"
        snap.coalesce(1).write.mode("overwrite").parquet(entry)
        # 2) consumer view
        snap.coalesce(1).write.mode("overwrite").parquet(output_path)
        # 3) prune journal older than the previous batch (Hadoop FS —
        # works on whatever store the output lives on)
        fs, _ = _hadoop_fs(spark, journal_dir)
        for b in _list_journal_batches(spark, journal_dir):
            if b < batch_id - 1:
                _, jp = _hadoop_fs(
                    spark, f"{journal_dir}/batch_id={b}"
                )
                fs.delete(jp, True)

    writer = docs_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
