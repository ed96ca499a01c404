"""Trained quality classifier — the GPT-3/CCNet-style discriminative
filter (Brown et al. 2020 §A; Wenzek et al. 2020): logistic
regression over hashed n-gram features, trained on a labeled seed
corpus (curated positives vs raw negatives) and applied as a
map-side scorer over the full corpus. This is the one standard
LLM-curation filter the rule-based (gopher/c4), LM-based
(unigram/bigram logprob) and DSIR scorers don't cover: a TRAINED
decision boundary the curator controls with labels.

Feature space: DSIR's hashed unigram+bigram stream
(:func:`~polaroam_spark.operators.textstats._dsir_grams`) bucketed
into ``num_buckets`` — the same dimensionality-reduction property
that makes DSIR 100 TB-safe makes the classifier so: the model is a
fixed B-vector of weights, never an open vocabulary.

Scale shape — scoring: for B ≤ 65536 the weight vector rides into
the plan as an array literal and the margin is a pure per-row JVM
expression (transform → element_at → aggregate): ZERO shuffle, zero
join, whole-stage-codegen'd — the filter a 1000-executor cluster
streams 100 TB through. Larger B switches to a broadcast-joined
B-row weight table with one doc-keyed sum (exactly DSIR's scoring
shape). Both paths produce identical margins.

Scale shape — training: full-batch gradient descent; each iteration
is ONE map-side pass over the persisted (label, buckets) projection
— ``mapInArrow`` partials of (∇w, ∇b, loss, n) per partition, a
(B+1)-vector each, summed on the driver (the treeAggregate shape of
every distributed LR, incl. pyspark.ml's). No shuffle anywhere in
the loop; iteration cost is a corpus scan of the projected frame,
linear in executors.

Beyond-reference component (the reference is a mobility engine, ref
core polaroam/*.py — no text surface); part of the LLM-pipeline
brief's text-analysis family.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: largest num_buckets scored via the in-plan array-literal fast
#: path; bigger weight vectors go through the broadcast-join path
#: (a 65536-child CreateArray is fine; a 2^20 one strains analysis).
_LITERAL_MAX = 65_536


def gram_bucket_base(
    text_col: "Column | str", feature: str = "word"
) -> Column:
    """The feature stream's shared base expression — the tokenized
    word array (``feature="word"``) or the normalized string
    (``"char"``). Project it into its OWN column in a select below
    the scoring projection and hand the column reference to
    :func:`hashed_gram_buckets` via ``base=``: the gram stream
    references its base several times, and an inline base re-runs
    the lower/split/trim chain per reference (higher-order lambdas
    are CodegenFallback — no common-subexpression elimination;
    measured 35-40%% of the bucket-stream cost, r19 optimization
    round). CollapseProject keeps the lower projection because the
    alias is non-cheap and multiply referenced."""
    from polaroam_spark.operators.textstats import (
        _char_norm,
    )
    from polaroam_spark.functions.text import tokens

    if feature == "word":
        return tokens(text_col)
    if feature == "char":
        return _char_norm(text_col)
    raise ValueError(
        f"feature must be 'word' or 'char' (got {feature!r})"
    )


def hashed_gram_buckets(
    text_col: "Column | str",
    num_buckets: int,
    seed: int = 17,
    portable: bool = False,
    feature: str = "word",
    base: "Column | None" = None,
) -> Column:
    """``array<int>`` of feature-bucket indices, one per gram
    instance. ``feature="word"`` (default) is DSIR's stream (word
    unigrams + bigrams); ``feature="char"`` is fasttext-langid's
    char 3–5-gram stream — robust on short / no-whitespace text
    where word features collapse to one unique token per document.
    ``portable`` swaps xxhash64 for the md5-based portable hash so a
    DuckDB oracle can replay bucket membership bit-for-bit; xxhash64
    is the scale default (~10x cheaper). ``base`` takes a
    pre-projected :func:`gram_bucket_base` column and skips the
    inline base computation (see there); ``text_col`` is ignored
    when it is given."""
    from polaroam_spark.functions.text import (
        fast_hash64,
        portable_hash64,
    )
    from polaroam_spark.operators.textstats import (
        _char_grams_of,
        _dsir_grams_of,
    )

    b = int(num_buckets)
    if b < 1:
        raise ValueError(f"num_buckets must be >= 1 (got {num_buckets})")
    if base is None:
        base = gram_bucket_base(text_col, feature)
    elif feature not in ("word", "char"):
        raise ValueError(
            f"feature must be 'word' or 'char' (got {feature!r})"
        )
    if feature == "word":
        grams = _dsir_grams_of(base)
    else:
        grams = _char_grams_of(base)
    hash_fn = portable_hash64 if portable else fast_hash64
    return F.transform(
        grams,
        lambda g: F.pmod(hash_fn(g, seed), F.lit(b)).cast("int"),
    )


def _resolve_engine(engine: str) -> str:
    """Scorer execution engine: ``'arrow'`` runs the gather+sum dot
    product as ONE vectorized Arrow UDF (numpy ``take`` +
    ``add.reduceat`` — the trainer's own margin kernel), ``'native'``
    keeps the pure-JVM expression paths (interpreted higher-order
    fold for B ≤ 65536, broadcast-join for larger). ``'auto'``
    (default) picks arrow when pyspark's ``arrow_udf`` and pyarrow
    are importable, else native. Both engines produce margins equal
    up to float-addition order — the SAME tolerance the DuckDB
    oracles already grant (they re-sum in hash-aggregation order and
    compare at 6 decimals); gates t34/t36/t37/t39/t39b and the
    curation ladder stay hash-exact on either engine (verified at
    all three SFs, r19 optimization round)."""
    if engine == "auto":
        try:
            import numpy  # noqa: F401
            import pyarrow  # noqa: F401
            from pyspark.sql.functions import arrow_udf  # noqa: F401
        except ImportError:
            return "native"
        return "arrow"
    if engine not in ("native", "arrow"):
        raise ValueError(
            f"engine must be 'auto', 'native' or 'arrow' (got {engine!r})"
        )
    return engine


def _gather_segment_sums(bk, w2d):
    """Vectorized scorer kernel over one Arrow list<int> column:
    per-row sums of ``w[bucket]`` for each weight vector in ``w2d``
    — the same zero-copy gather + ``np.add.reduceat`` segment sum
    :func:`train_quality_classifier`'s gradient pass uses. Returns
    ``(sums, counts)`` with ``sums`` shaped (K, n_rows) and
    ``counts`` the per-row instance count, 0 for NULL/empty rows
    (whose sums are garbage by construction — callers must gate on
    ``counts > 0``, exactly as the JVM paths gate on
    ``array_size > 0``). Out-of-range indices (possible only in the
    unused child slots of NULL rows) read clipped, never raise."""
    import numpy as np

    n = len(bk)
    offs = np.asarray(bk.offsets, dtype=np.int64)
    vals = np.asarray(bk.values)
    idx = vals[offs[0] : offs[-1]].astype(np.int64, copy=False)
    starts = offs[:-1] - offs[0]
    counts = np.diff(offs)
    if bk.null_count:
        counts = np.where(np.asarray(bk.is_valid()), counts, 0)
    k = w2d.shape[0]
    if idx.size == 0:
        return np.zeros((k, n), dtype=np.float64), counts
    np.clip(idx, 0, w2d.shape[1] - 1, out=idx)
    safe_starts = np.minimum(starts, idx.size - 1)
    empty = counts == 0
    sums = np.empty((k, n), dtype=np.float64)
    for ki in range(k):
        s = np.add.reduceat(w2d[ki][idx], safe_starts)
        s[empty] = 0.0
        sums[ki] = s
    return sums, counts


def _arrow_segments(batch, list_col: str):
    """(flattened int64 ids, segment-start offsets, per-row counts)
    for a RecordBatch's list column — zero-copy off the Arrow
    buffers, no per-row Python. A sliced ListArray's values buffer
    can extend beyond the slice, hence the offset window."""
    import numpy as np

    bk = batch.column(list_col)
    offs = np.asarray(bk.offsets)
    vals = np.asarray(bk.values)
    idx = vals[offs[0] : offs[-1]].astype(np.int64, copy=False)
    starts = (offs[:-1] - offs[0]).astype(np.int64, copy=False)
    counts = np.diff(offs).astype(np.int64, copy=False)
    return idx, starts, counts


def _partials_batch(grad, gbias, loss, n):
    """One-row Arrow batch carrying a partition's partial gradient
    (the mapInArrow return contract shared by both trainers; gbias
    is a scalar for the binary model, a K-list for softmax)."""
    import pyarrow as pa

    gb = (
        pa.array([gbias], type=pa.list_(pa.float64()))
        if isinstance(gbias, list)
        else pa.array([float(gbias)], type=pa.float64())
    )
    return pa.RecordBatch.from_arrays(
        [
            pa.array([grad], type=pa.list_(pa.float64())),
            gb,
            pa.array([float(loss)], type=pa.float64()),
            pa.array([int(n)], type=pa.int64()),
        ],
        names=["grad", "gbias", "loss", "n"],
    )


def _validate_model(model: dict) -> tuple:
    w = model["weights"]
    b = int(model["num_buckets"])
    if len(w) != b:
        raise ValueError(
            f"model weights length {len(w)} != num_buckets {b}"
        )
    feature = str(model.get("feature", "word"))
    if feature not in ("word", "char"):
        raise ValueError(
            f"model feature must be 'word' or 'char' (got {feature!r})"
        )
    return (
        [float(x) for x in w],
        float(model.get("bias", 0.0)),
        b,
        int(model.get("seed", 17)),
        bool(model.get("portable", False)),
        bool(model.get("normalize", False)),
        feature,
    )


def score_quality_classifier(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "quality_prob",
    label_col: "str | None" = "quality_label",
    threshold: float = 0.5,
    engine: str = "auto",
) -> DataFrame:
    """Append the classifier probability (``sigmoid(bias + Σ
    w[bucket(gram)])`` over the document's unigram+bigram instances
    — count features, so the sum over instances IS the w·x dot
    product; models with ``"normalize": True`` divide by the
    instance count, i.e. MEAN features — the length normalization
    :func:`train_quality_classifier` uses by default, since raw
    counts make the logistic gradient's Lipschitz constant scale
    with document length squared) and, when ``label_col`` is set,
    the thresholded boolean label. NULL/empty-gram documents get
    NULL score and label (no evidence — callers decide a default, as
    with DSIR).

    ``model`` is :func:`train_quality_classifier`'s dict (or any
    hand-built ``{"weights": [...], "bias": f, "num_buckets": B,
    "seed": s, "portable": p, "feature": "word"|"char"}`` —
    ``"char"`` scores over the char 3–5-gram stream, the langid
    feature set, when a quality model is trained on it). For B ≤ 65536 scoring is a pure
    per-row JVM expression (no shuffle, no join — see module
    docstring); larger models broadcast a B-row weight table and sum
    per ``id_col`` — on THAT path ``id_col`` must be unique (two
    rows sharing an id would silently score against their pooled
    grams; the per-row literal path has no such precondition).
    Composes with
    :func:`~polaroam_spark.operators.textstats.calibrate_scores` /
    ``quality_stratified_filter`` downstream (the probability is a
    score column like any other)."""
    w, bias, b, seed, portable, normalize, feature = _validate_model(
        model
    )
    # project the gram base, then the bucket array, each into its own
    # column (r19 optimization round — see gram_bucket_base): the
    # bucket stream references its base ~4x and the literal scoring
    # path references the bucket array 3x; inline, every reference
    # re-ran the whole chain (CodegenFallback lambdas, no
    # subexpression elimination)
    base_c = "_hgb_base"
    bk_c = "_hgb_buckets"
    while base_c in df.columns:
        base_c += "_"
    while bk_c in df.columns:
        bk_c += "_"
    src = df.withColumn(
        base_c, gram_bucket_base(text_col, feature)
    ).withColumn(
        bk_c,
        hashed_gram_buckets(
            text_col, b, seed, portable,
            feature=feature, base=F.col(base_c),
        ),
    )
    buckets = F.col(bk_c)
    _tmp_cols = [base_c, bk_c]
    eng = _resolve_engine(engine)

    if eng == "arrow":
        # one vectorized ArrowEvalPython stage computing (Σ w[bucket],
        # instance count) per row — replaces the interpreted
        # higher-order fold (B ≤ 65536: transform/aggregate are
        # CodegenFallback, ~1 ms/doc, plus a B-element array literal
        # whose parse+codegen costs seconds of DRIVER time per plan
        # build) AND the broadcast-join path (B > 65536: its
        # explode + join + per-doc sum shuffled the gram stream and
        # required unique ids; this path needs neither). The weight
        # vector ships once per executor as a SparkContext broadcast.
        # Map-only at every B — still the 100 TB shape. Guide §4.2.
        import numpy as np
        import pyarrow as pa
        from pyspark.sql.functions import arrow_udf

        bcw = df.sparkSession.sparkContext.broadcast(
            np.asarray(w, dtype=np.float64).reshape(1, b)
        )

        def _margin_sum(bk):
            sums, counts = _gather_segment_sums(bk, bcw.value)
            return pa.StructArray.from_arrays(
                [
                    pa.array(sums[0], type=pa.float64()),
                    pa.array(counts, type=pa.int64()),
                ],
                names=["s", "c"],
            )

        # module-level `from __future__ import annotations` turns
        # inline hints into strings arrow_udf's eval-type inference
        # cannot resolve — attach real objects instead
        _margin_sum.__annotations__ = {
            "bk": pa.Array,
            "return": pa.Array,
        }
        _margin_sum = arrow_udf("struct<s: double, c: bigint>")(
            _margin_sum
        )

        tmp = src.withColumn("_qsc", _margin_sum(buckets))
        ssum = F.col("_qsc.s")
        cnt = F.col("_qsc.c")
        if normalize:
            ssum = ssum / cnt
        margin = F.when(cnt > 0, F.lit(bias) + ssum)
        out = tmp.withColumn(
            out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        ).drop("_qsc", *_tmp_cols)
    elif b <= _LITERAL_MAX:
        # one parsed SQL array literal, not F.lit(list): the latter
        # walks the list element-by-element over py4j, costing ~2 s
        # of driver time per plan BUILD at B=4096 (measured; the SQL
        # string parses in <0.1 s and folds to the identical
        # constant — %.17e round-trips every finite double exactly)
        if all(math.isfinite(x) for x in w):
            wlit = F.expr(
                "array(" + ",".join(f"{x:.17e}" for x in w) + ")"
            )
        else:  # inf/nan have no SQL literal — take the slow path
            wlit = F.lit(w)
        ssum = F.aggregate(
            F.transform(
                buckets,
                lambda i: F.element_at(wlit, i + F.lit(1)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        if normalize:
            ssum = ssum / F.array_size(buckets)
        margin = F.when(
            F.array_size(buckets) > 0, F.lit(bias) + ssum
        )
        out = src.withColumn(
            out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        ).drop(*_tmp_cols)
    else:
        spark = df.sparkSession
        wtab = spark.createDataFrame(
            [(i, float(x)) for i, x in enumerate(w)],
            "_bucket int, _w double",
        )
        msum = F.sum("_w")
        per_doc = (
            src.select(id_col, F.explode(buckets).alias("_bucket"))
            .join(F.broadcast(wtab), on="_bucket", how="left")
            .groupBy(id_col)
            .agg(
                (
                    msum / F.count("*") if normalize else msum
                ).alias("_m")
            )
            .select(
                id_col,
                (
                    F.lit(1.0)
                    / (F.lit(1.0) + F.exp(-(F.lit(bias) + F.col("_m"))))
                ).alias(out_col),
            )
        )
        out = df.join(per_doc, on=id_col, how="left").select(
            *df.columns, out_col
        )
    if label_col is not None:
        out = out.withColumn(
            label_col, F.col(out_col) >= F.lit(float(threshold))
        )
    return out


def train_quality_classifier(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    num_buckets: int = 4096,
    seed: int = 17,
    portable: bool = False,
    n_iter: int = 30,
    learning_rate: float = 0.5,
    l2: float = 1e-6,
    normalize: bool = True,
    feature: str = "word",
) -> dict:
    """Fit the logistic regression by full-batch gradient descent:
    featurize ONCE into a persisted ``(label, buckets)`` projection,
    then per iteration one map-side pass computes partition-partial
    gradients over the broadcast current weights and the driver
    applies ``w -= lr · (∇/n + l2·w)``. Labels must be 0/1 (int or
    boolean); rows with NULL label or no grams are dropped (and
    counted in the returned dict). Returns the model dict for
    :func:`score_quality_classifier` plus ``loss_history`` (mean
    log-loss per iteration — the descent invariant tests pin) and
    ``n_rows``/``n_dropped``.

    ``normalize=True`` (default) uses MEAN features (each document's
    bucket counts divided by its instance total): with raw counts the
    per-document margin scales with length and the gradient's
    Lipschitz constant with length SQUARED, so a learning rate tuned
    on short documents diverges on long ones — normalization makes
    ``learning_rate`` O(1) regardless of document length. The flag
    rides in the model dict, so the scorer replays the same feature
    scaling automatically.

    Determinism: the gradient is a float sum over partition
    partials, so training is deterministic for a fixed partitioning
    and bit-stable only up to summation order — exactness gates pin
    the SCORER on fixed weights; training is certified by descent +
    accuracy invariants (the pyspark.ml contract too)."""
    import numpy as np

    from ..cache import track

    b = int(num_buckets)
    iters = int(n_iter)
    lr = float(learning_rate)
    reg = float(l2)
    if iters < 1:
        raise ValueError(f"n_iter must be >= 1 (got {n_iter})")

    # base projected below the bucket transform so its ~4 references
    # share one computation (r19 — see gram_bucket_base)
    buckets = hashed_gram_buckets(
        text_col, b, seed, portable,
        feature=feature, base=F.col("_hgb_base"),
    )
    total = df.count()
    feats = track(
        df.select(
            F.col(label_col).cast("double").alias("_y"),
            gram_bucket_base(text_col, feature).alias("_hgb_base"),
        )
        .select(
            "_y",
            buckets.alias("_bk"),
        )
        .filter(
            F.col("_y").isNotNull() & (F.array_size("_bk") > 0)
        )
        .persist()
    )
    n = feats.count()
    if n == 0:
        raise ValueError(
            "train_quality_classifier: no usable rows (every row had "
            "a NULL label or no grams)"
        )
    bad_rows = feats.filter(
        (F.col("_y") != 0.0) & (F.col("_y") != 1.0)
    ).take(1)
    if bad_rows:
        raise ValueError(
            f"labels must be 0/1; found {bad_rows[0]['_y']!r}"
        )

    w = np.zeros(b, dtype=np.float64)
    bias = 0.0
    norm_flag = bool(normalize)
    losses: "list[float]" = []
    schema = "grad array<double>, gbias double, loss double, n long"

    for _ in range(iters):
        cur_w, cur_b = w.copy(), bias

        def _partial(batches):
            # vectorized batch kernel (r14 verdict task 6): zero-copy
            # Arrow segment extraction, one add.reduceat segment-sum
            # for the margins and one bincount scatter for the
            # gradient per batch — no per-row Python loop (scipy CSR
            # is unavailable offline; these two numpy primitives are
            # the same gather/scatter matmul)
            g = np.zeros(b, dtype=np.float64)
            gb = 0.0
            loss = 0.0
            cnt = 0
            for batch in batches:
                if batch.num_rows == 0:
                    continue
                y = np.asarray(batch.column("_y"), dtype=np.float64)
                idx, starts, counts = _arrow_segments(batch, "_bk")
                scale = (
                    1.0 / counts if norm_flag
                    else np.ones(batch.num_rows, dtype=np.float64)
                )
                m = (
                    np.add.reduceat(cur_w[idx], starts) * scale
                    + cur_b
                )
                # overflow-safe sigmoid and clamped log-loss
                t = np.exp(-np.abs(m))
                p = np.where(m >= 0, 1.0 / (1.0 + t), t / (1.0 + t))
                loss -= (
                    y * np.log(np.maximum(p, 1e-300))
                    + (1.0 - y) * np.log(np.maximum(1.0 - p, 1e-300))
                ).sum()
                r = p - y
                g += np.bincount(
                    idx, weights=np.repeat(r * scale, counts),
                    minlength=b,
                )
                gb += r.sum()
                cnt += batch.num_rows
            yield _partials_batch(g.tolist(), gb, loss, cnt)

        parts = feats.mapInArrow(_partial, schema=schema).collect()
        g = np.zeros(b, dtype=np.float64)
        gb = 0.0
        loss = 0.0
        for r in parts:
            g += np.asarray(r["grad"], dtype=np.float64)
            gb += r["gbias"]
            loss += r["loss"]
        w -= lr * (g / n + reg * w)
        bias -= lr * (gb / n)
        losses.append(loss / n)

    return {
        "weights": w.tolist(),
        "bias": float(bias),
        "num_buckets": b,
        "seed": int(seed),
        "portable": bool(portable),
        "normalize": norm_flag,
        "feature": str(feature),
        "loss_history": losses,
        "n_rows": int(n),
        "n_dropped": int(total - n),
    }


def evaluate_classifier(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "quality_prob",
    threshold: float = 0.5,
    auc_bins: int = 10_000,
) -> DataFrame:
    """One-row evaluation frame for a scored+labeled corpus — the
    numbers published pipelines report for their quality filter:
    ``n, n_pos, n_neg, n_skipped, tp, fp, fn, tn, accuracy,
    precision, recall, f1, auc``. Confusion counts threshold the
    score at ``threshold``; rows with a NULL label or score are
    skipped and counted (a no-evidence document is neither correct
    nor incorrect).

    "Usable" rows have a 0/1 label and a finite score; rows with a
    NULL score/label or an out-of-domain label (anything but 0/1 —
    a 2 or a -1 would otherwise inflate ``n`` while landing in no
    confusion cell) count into ``n_skipped``. Scores are clamped
    into [0, 1) bins at both ends, so a raw margin column works too.

    AUC is the tie-corrected Mann-Whitney statistic over scores
    quantized into ``auc_bins`` equal-width bins: per bin the
    positive/total counts aggregate map-side into a ≤ bins-row
    table (the DSIR/B-bucket scale shape), the average-rank cumsum
    runs over that TINY frame, never the corpus — an exact global
    rank would be a corpus-sized single-task window, the pattern
    this repo bans. With well-spread scores the quantization error
    is O(1/bins); ties inside a bin use the standard average-rank
    correction, so the statistic is exact for scores that are
    already bin-aligned. Ratios are NULL when their denominator is
    zero (no positives, no negatives, or no predicted positives)
    rather than fabricating 0/0."""
    from pyspark.sql import Window

    b = int(auc_bins)
    if b < 1:
        raise ValueError(f"auc_bins must be >= 1 (got {auc_bins})")
    y = F.col(label_col).cast("double")
    s = F.col(score_col).cast("double")
    # NaN scores must land in n_skipped: NULL-only checks would let
    # NaN through, where Spark's NaN ordering evaluates NaN >= t as
    # true (inflating tp/fp) and the bin expression misplaces it
    usable = y.isin(0.0, 1.0) & s.isNotNull() & ~F.isnan(s)
    pred = s >= F.lit(float(threshold))

    base = scored.select(
        F.count("*").alias("n_total"),
        F.sum(usable.cast("long")).alias("n"),
        F.sum((usable & (y == 1.0)).cast("long")).alias("n_pos"),
        F.sum((usable & (y == 0.0)).cast("long")).alias("n_neg"),
        F.sum((usable & (y == 1.0) & pred).cast("long")).alias("tp"),
        F.sum((usable & (y == 0.0) & pred).cast("long")).alias("fp"),
        F.sum((usable & (y == 1.0) & ~pred).cast("long")).alias("fn"),
        F.sum((usable & (y == 0.0) & ~pred).cast("long")).alias("tn"),
    )

    # binned Mann-Whitney: avg rank of bin = (#rows below) + (size+1)/2
    bins = (
        scored.filter(usable)
        .select(
            F.greatest(
                F.least(
                    F.floor(s * F.lit(b)).cast("long"), F.lit(b - 1)
                ),
                F.lit(0),
            ).alias("_bin"),
            y.alias("_y"),
        )
        .groupBy("_bin")
        .agg(
            F.count("*").alias("_c"),
            F.sum("_y").alias("_cpos"),
        )
    )
    w = Window.orderBy("_bin").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = bins.select(
        "_cpos",
        (
            F.coalesce(F.sum("_c").over(w), F.lit(0))
            + (F.col("_c") + 1) / 2.0
        ).alias("_avg_rank"),
    )
    u = ranked.select(
        F.sum(F.col("_cpos") * F.col("_avg_rank")).alias("_rpos")
    )

    out = base.crossJoin(u).select(
        "n_total",
        "n",
        "n_pos",
        "n_neg",
        (F.col("n_total") - F.col("n")).alias("n_skipped"),
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(
            F.col("n") > 0,
            (F.col("tp") + F.col("tn")) / F.col("n"),
        ).alias("accuracy"),
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.col("tp") / (F.col("tp") + F.col("fp")),
        ).alias("precision"),
        F.when(
            F.col("n_pos") > 0, F.col("tp") / F.col("n_pos")
        ).alias("recall"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("tp") + F.col("fp") > 0)
            & (F.col("tp") > 0),
            2.0
            / (
                (F.col("tp") + F.col("fp")) / F.col("tp")
                + F.col("n_pos") / F.col("tp")
            ),
        ).alias("f1"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            (
                F.col("_rpos")
                - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
            )
            / (F.col("n_pos") * F.col("n_neg")),
        ).alias("auc"),
    )
    return out


def calibration_curve(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "quality_prob",
    bins: int = 10,
) -> DataFrame:
    """Reliability table for a scored+labeled frame — the standard
    calibration companion to :func:`evaluate_classifier`'s AUC: one
    row per non-empty equal-width score bin with ``bin, n, mean_score,
    frac_pos, abs_gap`` (``abs_gap = |mean_score − frac_pos|`` is the
    bin's contribution to expected calibration error: ``ECE =
    Σ n/N · abs_gap``, which the caller can fold in one pass over
    these ≤ bins rows). A perfectly calibrated scorer has
    ``frac_pos ≈ mean_score`` in every bin; a separable-but-
    overconfident one shows the gap directly. Rows with a NULL label
    or score are skipped; the label column is otherwise averaged
    AS-IS (0/1 gives the positive rate; a continuous target gives a
    regression-style reliability curve — evaluate_classifier is the
    strict-0/1 surface). Bin indices clamp into [0, bins) at both
    ends, so raw margins work as the score column too. One
    map-side-combined aggregation; output is ≤ ``bins`` rows at any
    corpus size."""
    b = int(bins)
    if b < 1:
        raise ValueError(f"bins must be >= 1 (got {bins})")
    y = F.col(label_col).cast("double")
    s = F.col(score_col).cast("double")
    return (
        scored.filter(
            y.isNotNull() & ~F.isnan(y) & s.isNotNull() & ~F.isnan(s)
        )
        .select(
            F.greatest(
                F.least(
                    F.floor(s * F.lit(b)).cast("long"), F.lit(b - 1)
                ),
                F.lit(0),
            ).alias("bin"),
            y.alias("_y"),
            s.alias("_s"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.avg("_s").alias("mean_score"),
            F.avg("_y").alias("frac_pos"),
        )
        .select(
            "bin",
            "n",
            "mean_score",
            "frac_pos",
            F.abs(F.col("mean_score") - F.col("frac_pos")).alias(
                "abs_gap"
            ),
        )
    )
