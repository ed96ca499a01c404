"""Deterministic sampling / splitting for corpus construction.

``df.sample()`` draws from a per-partition RNG: resampling after any
repartition, filter, or code change yields a different subset, which
makes corpus experiments unreproducible. These operators derive the
decision from a **content/key hash**, so membership is a pure function
of the row — stable across runs, partitionings, cluster sizes, and
engines (portable md5 path available for oracle checks).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polaroam_spark.functions.text import portable_hash64

#: portable_hash64 yields 60-bit non-negative values
_HASH_SPACE = float(1 << 60)


def _unit_hash(key: Column | str, seed: int) -> Column:
    """Deterministic uniform-ish value in [0, 1) from a key column."""
    c = F.col(key) if isinstance(key, str) else key
    return portable_hash64(c.cast("string"), seed) / F.lit(_HASH_SPACE)


def sample_by_hash(
    df: DataFrame,
    key: str,
    fraction: float,
    seed: int = 17,
) -> DataFrame:
    """Keep rows whose key hashes below ``fraction`` — a reproducible
    Bernoulli sample keyed on ``key`` (same key ⇒ same decision, so
    sampling is also consistent across tables sharing the key)."""
    return df.filter(_unit_hash(key, seed) < F.lit(float(fraction)))


def stratified_sample_by_hash(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 17,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep rows whose key hashes
    below their stratum's fraction — the corpus-mixing primitive
    ("keep 100% of books, 10% of common-crawl") with the same
    reproducibility contract as :func:`sample_by_hash`. Strata absent
    from ``fractions`` fall back to ``default_fraction``. The
    per-stratum threshold is a broadcast map lookup (a small literal
    CASE chain — no join, no shuffle); membership stays a pure
    function of (key, stratum)."""
    h = _unit_hash(key, seed)
    frac = F.lit(float(default_fraction))
    for stratum, f in sorted(fractions.items()):
        frac = F.when(
            F.col(strata_col) == stratum, F.lit(float(f))
        ).otherwise(frac)
    return df.filter(h < frac)


def train_test_split(
    df: DataFrame,
    key: str,
    test_fraction: float = 0.1,
    seed: int = 29,
) -> tuple[DataFrame, DataFrame]:
    """(train, test) split by key hash. Deterministic and leakage-safe:
    every row of a given key lands on the same side, so grouped
    entities (all pings of a user, all chunks of a document) never
    straddle the split."""
    h = _unit_hash(key, seed)
    test = df.filter(h < F.lit(float(test_fraction)))
    train = df.filter(h >= F.lit(float(test_fraction)))
    return train, test


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    test_fraction: float = 0.1,
    seed: int = 29,
    max_iterations: int = 30,
) -> "tuple[DataFrame, DataFrame]":
    """Train/test split that cannot leak NEAR-DUPLICATES across the
    boundary: every row splits by the REPRESENTATIVE of its duplicate
    component (transitive closure of ``pairs``), not by its own id.
    :func:`train_test_split` keeps groups the caller already knows
    about together; this keeps together the groups dedup DISCOVERS —
    a near-dup pair with one side in train and the other in eval is
    exactly the contamination eval decks measure, and a ~0.8 Jaccard
    twin is as leaky as an exact copy. Feed it any pair table
    (minhash_lsh_pairs, simhash_pairs, ngram_jaccard_pairs_exact,
    embedding_neardup_pairs).

    Scale shape: components run O(log n) star contraction over only
    the PAIRED ids (|pairs| rows, typically orders of magnitude below
    the corpus); the corpus sees ONE left equi-join on ``id_col``
    against that component map (AQE broadcasts it when small) and a
    pure hash filter on ``coalesce(representative, id)`` — unpaired
    docs split by their own id, so the unpaired majority needs no
    join hit. Membership is a pure function of (pair graph, ids,
    seed): stable across runs, partitionings, and cluster sizes.

    Returns ``(train, test)``.
    """
    if not 0.0 <= float(test_fraction) <= 1.0:
        raise ValueError(
            f"test_fraction must be in [0, 1] (got {test_fraction})"
        )
    from .dedup import duplicate_components

    # internal prefixes on BOTH component columns: a caller's frame
    # may itself carry a `representative` column (e.g. annotated by
    # an earlier duplicate_components pass), and an unprefixed name
    # would be ambiguous after the join / silently dropped after it
    # (r12 code review)
    comp = duplicate_components(
        pairs, id_a=id_a, id_b=id_b, max_iterations=max_iterations
    ).select(
        F.col("doc_id").alias("_ls_id"),
        F.col("representative").alias("_ls_rep"),
    )
    joined = df.join(
        comp, on=df[id_col] == comp["_ls_id"], how="left"
    ).drop("_ls_id")
    split_key = F.coalesce(F.col("_ls_rep"), F.col(id_col))
    u = _unit_hash(split_key, seed)
    test = joined.filter(u < F.lit(float(test_fraction))).drop(
        "_ls_rep"
    )
    train = joined.filter(u >= F.lit(float(test_fraction))).drop(
        "_ls_rep"
    )
    return train, test


def cap_per_key(
    df: DataFrame,
    key: str,
    id_col: str,
    max_per_key: int,
    seed: int = 53,
) -> DataFrame:
    """Keep at most ``max_per_key`` rows per ``key``, chosen
    deterministically by hash order of ``id_col`` — the per-domain /
    per-source frequency cap every corpus build applies so one hot
    domain can't dominate the training mix. Membership is a pure
    function of (key, the key's id set, seed): stable across runs and
    partitionings.

    Scale shape: the ranking window runs over a PROJECTED
    ``(key, id, hash)`` frame, and survivors are joined back by
    ``id_col`` (left-semi). Ranking a hot key still serializes that
    key into one task, but the task holds ~16 bytes/row instead of
    whole documents, and the join-back shuffle is keyed on the
    uniformly-distributed ``id_col`` — so a 100M-doc hot domain costs
    a narrow 1.6 GB sort, not an OOM on full rows. ``id_col`` must
    uniquely key ``df``.
    """
    from pyspark.sql import Window

    h = portable_hash64(F.col(id_col).cast("string"), seed)
    w = Window.partitionBy(key).orderBy(
        h.asc(), F.col(id_col).asc()
    )
    keep = (
        df.select(key, id_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= int(max_per_key))
        .select(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


def topk_per_key(
    df: DataFrame,
    key: str,
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Top-``k`` rows per ``key`` by ``order_col`` — the named form of
    the rank-window idiom (best-k chunks per document, highest-k
    quality docs per domain). Deterministic when ``tiebreak_col`` (a
    unique column) is given; without it, ties at the boundary are
    broken arbitrarily — fine for sampling, wrong for reproducible
    corpus builds, hence the explicit parameter.

    Scale note: row_number serializes each key into one task. Rows
    here are ranked in place (unlike :func:`cap_per_key`'s projected
    frame + semi join-back) because score-ranked selection usually
    follows aggregation where rows are already narrow; for wide rows
    over hot keys, project-rank-and-join-back as cap_per_key does.
    """
    from pyspark.sql import Window

    if "_rn" in df.columns:
        raise ValueError(
            "topk_per_key reserves column name '_rn'; rename it in "
            "the input frame first"
        )
    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    order = [oc]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= int(k))
        .drop("_rn")
    )


def weighted_sample_by_hash(
    df: DataFrame,
    key: str,
    weight_col: str,
    rate: float,
    seed: int = 17,
) -> DataFrame:
    """Weight-proportional deterministic Bernoulli sample: keep rows
    whose key hash falls below ``min(1, rate * weight)`` — e.g. sample
    documents proportionally to length so the TOKEN budget, not the
    document count, follows the target rate. Same reproducibility
    contract as :func:`sample_by_hash` (pure function of key, weight,
    seed); NULL weights never match the ``<`` predicate and are
    dropped, the conservative choice for a sampling step. Pure
    map-side filter — no shuffle, scale-free."""
    w = F.col(weight_col).cast("double")
    # guard the NULL case explicitly: least() IGNORES null arguments
    # (least(NULL, 1.0) = 1.0), which would silently keep every
    # null-weight row at probability 1
    p = F.when(
        w.isNull(), F.lit(None).cast("double")
    ).otherwise(F.least(F.lit(float(rate)) * w, F.lit(1.0)))
    return df.filter(_unit_hash(key, seed) < p)


def temperature_sample(
    df: DataFrame,
    key: str,
    group_col: str,
    temperature: float,
    target_fraction: float = 1.0,
    seed: int = 17,
    weight_col: "str | None" = None,
) -> DataFrame:
    """Temperature-based group rebalancing — the multilingual /
    multi-source mixing rule of the XLM-R / mT5 recipes: resample so
    group g's share moves from ``p_g = n_g / N`` toward
    ``q_g ∝ p_g^(1/T)``. ``T = 1`` keeps natural proportions;
    ``T > 1`` flattens the mix (rare languages/sources gain share);
    ``T → ∞`` approaches uniform.

    A filter-only sampler can DOWN-sample but never up-sample, so the
    per-group keep-rate is ``min(1, C · p_g^(1/T − 1))`` with ``C``
    chosen so the UNCLAMPED expected survivor total equals
    ``target_fraction · N`` — dominant groups are thinned toward the
    temperature mix while groups whose implied rate exceeds 1 keep
    everything (their shortfall vs the ideal q is inherent to
    sampling without duplication; duplicate-based up-sampling is an
    epoch-weighting concern, not a corpus-membership one). Row
    membership is the usual reproducibility contract: a pure function
    of (key, group shares, T, target_fraction, seed) via the portable
    hash, so the decision replays identically in a SQL oracle. NULL
    groups never match the ``<`` predicate and are dropped.

    ``weight_col`` (optional): compute group shares by the SUM of a
    weight column (e.g. ``n_tokens``) instead of row counts — the
    published recipes mix by TOKEN budget, and a doc-count share
    over-represents groups with short documents. Membership decisions
    stay per-row (a group's keep-rate applies to each document), so
    the expected surviving WEIGHT follows the temperature mix.
    NULL-weight rows count as weight 0 toward their group's share.
    A group whose TOTAL weight is 0 (every row NULL/zero) is dropped
    with its rows: its natural share is 0, so its temperature target
    ``q_g ∝ 0^(1/T)`` is 0 — and letting it into the rate derivation
    would poison every OTHER group's rate (``pow(0, 1/T−1)`` is
    +Infinity for T>1, so the denominator sum becomes ``0·Inf = NaN``
    and ``least(1.0, NaN)`` resolves to 1.0 under Spark's
    NaN-is-largest ordering — the sampler would silently return the
    full corpus; ADVICE r10 #1).

    Plan shape at 100 TB: group counts are ONE tiny aggregate; the
    scale constant is a second aggregate over that (rows = number of
    groups); both broadcast back — the corpus itself sees exactly one
    map-side broadcast-join + filter, no shuffle, no window.
    """
    t = float(temperature)
    if t <= 0.0:
        raise ValueError(f"temperature must be > 0 (got {temperature})")
    mass = (
        F.count("*").cast("double")
        if weight_col is None
        else F.coalesce(
            F.sum(F.col(weight_col).cast("double")), F.lit(0.0)
        )
    )
    counts = (
        df.groupBy(F.col(group_col).alias("_ts_g"))
        .agg(mass.alias("_ts_n"))
        # zero-mass groups (possible only with weight_col: all rows
        # NULL/zero weight) must not reach the pow(): see docstring
        .filter(F.col("_ts_n") > 0.0)
    )
    totals = counts.agg(F.sum("_ts_n").alias("_ts_total"))
    raw = counts.crossJoin(F.broadcast(totals)).withColumn(
        "_ts_raw",
        F.pow(F.col("_ts_n") / F.col("_ts_total"), 1.0 / t - 1.0),
    )
    denom = raw.agg(
        F.sum(F.col("_ts_n") * F.col("_ts_raw")).alias("_ts_denom")
    )
    rates = raw.crossJoin(F.broadcast(denom)).select(
        "_ts_g",
        F.least(
            F.lit(1.0),
            F.lit(float(target_fraction))
            * F.col("_ts_total")
            / F.col("_ts_denom")
            * F.col("_ts_raw"),
        ).alias("_ts_rate"),
    )
    probe = df.join(
        F.broadcast(rates),
        on=df[group_col] == rates["_ts_g"],
        how="inner",
    )
    return probe.filter(
        _unit_hash(key, seed) < F.col("_ts_rate")
    ).drop("_ts_g", "_ts_rate")


def temperature_epoch_plan(
    df: DataFrame,
    group_col: str,
    temperature: float,
    normalize: str = "min",
    weight_col: "str | None" = None,
) -> DataFrame:
    """The UP-sampling half of temperature mixing, as a PLAN rather
    than row duplication: per group, the repeat factor a training
    loader should apply so the epoch-level mix follows
    ``q_g ∝ p_g^(1/T)`` (:func:`temperature_sample` covers the
    filter-only down-sampling half; repeating rows in the corpus
    itself would just re-introduce the duplicates every dedup stage
    exists to remove).

    ``weight_col``: shares and factors by summed weight (tokens)
    instead of document counts — ``n_docs`` then holds the group's
    total weight as a DOUBLE (summed without per-row truncation, so
    fractional weights survive; ADVICE r10 #3). A group whose total
    weight is 0 (every row NULL/zero) is dropped from the plan: its
    natural share is 0, so ``repeat_factor = q_g/p_g`` is 0/0 — there
    is no meaningful per-epoch rate for weightless content, and a
    NaN row would poison the min/mean normalization for every other
    group. Output: one row per group — ``n_docs``,
    ``natural_share`` (p_g),
    ``target_share`` (q_g, normalized), and ``repeat_factor``
    (q_g / p_g rescaled). ``normalize='min'`` (default) rescales so
    the SMALLEST factor is exactly 1.0 — no document is seen less
    than once per epoch and the epoch grows; ``normalize='mean'``
    rescales so the doc-weighted mean factor is 1.0 — the epoch
    size is preserved and dominant groups get factors below 1
    (interpretable as per-epoch sampling rates). Pure arithmetic on
    one tiny aggregate: deterministic, SQL-twinnable, and the output
    is #groups rows — broadcast-sized at any corpus scale.
    """
    t = float(temperature)
    if t <= 0.0:
        raise ValueError(f"temperature must be > 0 (got {temperature})")
    if normalize not in ("min", "mean"):
        raise ValueError(
            f"unknown normalize {normalize!r}: use 'min' or 'mean'"
        )
    mass = (
        F.count("*").cast("long")
        if weight_col is None
        else F.coalesce(
            F.sum(F.col(weight_col).cast("double")), F.lit(0.0)
        )
    )
    counts = (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).alias("group"))
        .agg(mass.alias("n_docs"))
    )
    if weight_col is not None:
        # zero-mass groups have no defined repeat factor (0/0) and
        # would NaN-poison the normalization: see docstring
        counts = counts.filter(F.col("n_docs") > 0.0)
    totals = counts.agg(
        F.sum("n_docs").cast("double").alias("_tp_total")
    )
    shares = counts.crossJoin(F.broadcast(totals)).withColumns(
        {
            "natural_share": F.col("n_docs") / F.col("_tp_total"),
            "_tp_qraw": F.pow(
                F.col("n_docs") / F.col("_tp_total"), 1.0 / t
            ),
        }
    )
    qsum = shares.agg(F.sum("_tp_qraw").alias("_tp_qsum"))
    with_q = shares.crossJoin(F.broadcast(qsum)).withColumn(
        "target_share", F.col("_tp_qraw") / F.col("_tp_qsum")
    )
    ratio = F.col("target_share") / F.col("natural_share")
    if normalize == "min":
        scale = with_q.agg(
            F.min(
                F.col("target_share") / F.col("natural_share")
            ).alias("_tp_scale")
        )
    else:
        # doc-weighted mean of ratio = Σ n_g·(q_g/p_g) / N; _tp_total
        # is already a (constant) column of with_q via the first join
        scale = with_q.agg(
            (
                F.sum(
                    F.col("n_docs")
                    * F.col("target_share")
                    / F.col("natural_share")
                )
                / F.first("_tp_total")
            ).alias("_tp_scale")
        )
    return (
        with_q.crossJoin(F.broadcast(scale))
        .select(
            "group",
            "n_docs",
            "natural_share",
            "target_share",
            (ratio / F.col("_tp_scale")).alias("repeat_factor"),
        )
    )


def deterministic_shuffle(
    df: DataFrame,
    key: str,
    seed: int = 41,
    num_shards: int | None = None,
    key_col: str = "shuffle_key",
) -> DataFrame:
    """Reproducible global shuffle for training-order randomization:
    rows are ordered by a hash of their key, so the permutation is a
    pure function of (key, seed) — stable across runs, partitionings,
    and cluster sizes, unlike ``df.orderBy(rand())``.

    Scale shape: ``orderBy`` over the hash is a range-partitioned
    distributed sort (sampled range boundaries, no global single-task
    stage); with ``num_shards`` set, the sort is replaced by
    ``repartitionByRange(num_shards)`` + within-partition sort —
    exactly what a sharded training-data writer wants (each output
    file internally ordered, file set globally ordered), avoiding the
    total-order merge. The hash column is kept as ``key_col`` so
    downstream stages (and the correctness oracle) can verify the
    permutation without re-deriving it.
    """
    c = F.col(key)
    h = portable_hash64(c.cast("string"), seed)
    out = df.withColumn(key_col, h)
    if num_shards is not None:
        return out.repartitionByRange(
            int(num_shards), F.col(key_col), c
        ).sortWithinPartitions(F.col(key_col), c)
    return out.orderBy(F.col(key_col), c)


def gumbel_topk_sample(
    df: DataFrame,
    log_weight_col: str,
    key: str,
    fraction: "float | None" = None,
    k: "int | None" = None,
    seed: int = 29,
    driver_cap: int = 1_000_000,
    single_part_cap: int = 2_000_000,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Gumbel top-k
    trick, deterministic: keep the ``k`` rows maximizing
    ``log_weight + Gumbel(0,1)``, where the Gumbel noise
    ``−ln(−ln(u))`` draws its uniform from the portable content hash
    of ``key`` instead of an RNG. Gumbel top-k over log weights is
    exactly sampling-without-replacement proportional to the
    (exponentiated) weights (Efraimidis & Spirakis 2006; the
    sampling step of DSIR, NeurIPS 2023 — feed it
    ``textstats.dsir_importance_weights`` output), and hashing the
    key makes the draw reproducible across runs, partitionings, and
    engines — the same contract as every ``*_by_hash`` sampler here.

    Exactly one of ``fraction`` (of the frame's non-NULL-weight
    rows, ceil) or ``k`` must be given. Rows with NULL log weight
    have no defined importance and are excluded (same rule as
    temperature sampling's zero-mass groups). Ties (identical score,
    hash-collision-rare) break by ``key`` ascending, so the survivor
    set is a pure function of (weights, keys, seed).

    Plan shape at 100 TB: the rank runs over a PROJECTED (key,
    score) frame — two skinny columns, never whole documents — and
    survivors semi-join back by key (broadcast when small). The
    top-k itself goes through
    :func:`polaroam_spark.operators.selection.exact_global_topk`:
    ``TakeOrderedAndProject`` (per-partition heaps, no global sort)
    when ``k <= driver_cap``, else verified-threshold band
    refinement — every stage distributed, so the r11 shape's hidden
    single-task global ``row_number()`` window is gone. ``driver_cap``
    / ``single_part_cap`` pass through (lower them only in tests).
    The u=0 edge is unreachable: the uniform is (hash + 0.5) / 2^60,
    strictly inside (0, 1).
    """
    if (fraction is None) == (k is None):
        raise ValueError("pass exactly one of fraction= or k=")
    if fraction is not None and not 0.0 <= float(fraction) <= 1.0:
        raise ValueError(f"fraction must be in [0, 1] (got {fraction})")
    if k is not None and int(k) < 0:
        raise ValueError(f"k must be >= 0 (got {k})")

    weighted = df.filter(F.col(log_weight_col).isNotNull())
    u = (
        portable_hash64(F.col(key).cast("string"), seed) + F.lit(0.5)
    ) / F.lit(_HASH_SPACE)
    score = F.col(log_weight_col).cast("double") - F.log(-F.log(u))
    narrow = weighted.select(F.col(key), score.alias("_gk_score"))
    if k is None:
        if float(fraction) == 1.0:
            return weighted
        n = narrow.count()  # one count over the skinny projection
        k = int(math.ceil(float(fraction) * n))
    from .selection import exact_global_topk

    keep = exact_global_topk(
        narrow,
        int(k),
        "_gk_score",
        key,
        driver_cap=driver_cap,
        single_part_cap=single_part_cap,
        seed=seed + 101,
    ).select(key)
    return weighted.join(keep, on=key, how="left_semi")


def interleave_order(
    df: DataFrame,
    group_col: str,
    weights: "dict[str, float]",
    key: str = "doc_id",
    seed: int = 41,
    order_col: str = "interleave_key",
    num_shards: "int | None" = None,
) -> DataFrame:
    """Deterministic weighted INTERLEAVING order across corpora —
    the training-order half of domain mixing (``mixture_plan`` /
    ``temperature_sample`` decide WHICH documents; this decides the
    ORDER the loader sees them in, so a 70/30 web/code mixture
    arrives ~70/30 in every training window instead of web-then-code
    in giant runs): stride scheduling, the classic deterministic
    fair-queue rule. Each group's rows get a hash-shuffled
    within-group rank ``rn`` (a pure function of (key, seed) — the
    :func:`deterministic_shuffle` permutation per group) and a
    virtual time ``rn / weight``; reading rows in virtual-time order
    interleaves groups proportionally to their weights at every
    prefix. Zero-/negative-weight or unlisted groups are REJECTED
    loudly (an unlisted group silently never scheduled would starve
    a corpus); that check is one bounded distinct-collect over
    ``group_col`` — groups are corpora/domains (a handful), never
    row keys.

    Appends ``order_col`` (struct<vtime double, group, rn long>) —
    the total-order sort key. The row ORDER is the contract, not a
    dense integer: materializing global positions would need a
    single-task pass, while sorting by the key is a range-partitioned
    distributed sort. With ``num_shards``, rows land
    ``repartitionByRange(order_col)`` + sorted within shards — the
    sharded-writer layout (files internally ordered, file set
    globally ordered), no total-order merge anywhere. ``vtime`` is
    ``rn / weight`` with both operands exact (integer rank, literal
    weight), so the key is bit-identical across engines — a SQL
    oracle replays the full order with no rounding.
    """
    missing_or_bad = {
        g: w for g, w in weights.items() if not (float(w) > 0.0)
    }
    if missing_or_bad:
        raise ValueError(
            f"interleave_order: non-positive weights {missing_or_bad}"
        )
    groups = [
        r[0]
        for r in df.select(group_col).distinct().collect()
    ]  # bounded: one row per corpus/domain
    unlisted = sorted(
        str(g) for g in groups if g not in weights
    )
    if unlisted:
        raise ValueError(
            "interleave_order: groups without a weight (would "
            f"starve): {unlisted}"
        )
    from pyspark.sql import Window

    h = portable_hash64(F.col(key).cast("string"), seed)
    w = Window.partitionBy(group_col).orderBy(h, F.col(key))
    rn = F.row_number().over(w).cast("long")
    wexpr = None
    for g, wt in weights.items():
        c = F.lit(float(wt))
        wexpr = (
            F.when(F.col(group_col) == g, c)
            if wexpr is None
            else wexpr.when(F.col(group_col) == g, c)
        )
    out = df.withColumn("_rn", rn).withColumn(
        order_col,
        F.struct(
            (F.col("_rn").cast("double") / wexpr).alias("vtime"),
            F.col(group_col).alias("group"),
            F.col("_rn").alias("rn"),
        ),
    ).drop("_rn")
    if num_shards is not None:
        return out.repartitionByRange(
            int(num_shards), F.col(order_col)
        ).sortWithinPartitions(F.col(order_col))
    return out.orderBy(F.col(order_col))
