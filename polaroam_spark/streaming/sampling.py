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
    restarting from zero. Keys must uniquely identify rows across
    the stream (the usual doc-id contract); a key re-delivered with
    the same weight merges to one row, bit-identically to the batch
    op's DISTINCT-key frame.

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
        import os

        rows = _read_rows(output_path)
        if rows is None:
            # consumer view unreadable (lost to a crash mid-write or
            # never written): recover from the newest journal entry
            jd = journal_dir.replace("file:", "")
            entries = sorted(
                (
                    e
                    for e in (
                        os.listdir(jd) if os.path.isdir(jd) else []
                    )
                    if e.startswith("batch_id=")
                ),
                key=lambda e: int(e.split("=", 1)[1]),
                reverse=True,
            )
            for e in entries:
                rows = _read_rows(os.path.join(jd, e))
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
        import os
        import shutil

        top = (
            batch_df.filter(F.col(log_weight_col).isNotNull())
            .withColumn("_gk_score", score)
            .orderBy(F.desc("_gk_score"), F.col(key))
            .limit(k)
            .collect()  # bounded: <= k rows
        )
        for r in top:
            state.setdefault(r[key], r)
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
        # 3) prune journal older than the previous batch
        jd = journal_dir.replace("file:", "")
        for e in os.listdir(jd) if os.path.isdir(jd) else []:
            if (
                e.startswith("batch_id=")
                and int(e.split("=", 1)[1]) < batch_id - 1
            ):
                shutil.rmtree(os.path.join(jd, e), ignore_errors=True)

    writer = docs_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
