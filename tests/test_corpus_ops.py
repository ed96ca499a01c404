"""Corpus-construction operators: scrubbing, repetition, stratified
quality filtering, deterministic sampling/splits."""

import pyspark.sql.functions as F
import pytest

from polaroam_spark.operators.sampling import (
    sample_by_hash,
    train_test_split,
)
from polaroam_spark.operators.textstats import (
    pii_counts,
    quality_stratified_filter,
    repetition_ratio,
    scrub_text,
)


def test_scrub_text(spark):
    df = spark.createDataFrame(
        [
            (0, "mail bob.smith@corp.io or visit https://a.b/c?d=1 now"),
            (1, "card 4111 1111 1111 1111 and ssn 123-45-6789 here"),
            (2, "nothing sensitive in this one"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.s for r in df.select(
        "doc_id", scrub_text("text").alias("s")).collect()}
    assert "<EMAIL>" in out[0] and "<URL>" in out[0]
    assert "bob.smith" not in out[0] and "https" not in out[0]
    assert "<CARD>" in out[1] and "<SSN>" in out[1]
    assert out[2] == "nothing sensitive in this one"


def test_pii_counts(spark):
    df = spark.createDataFrame(
        [(0, "a@b.co c@d.eu and http://x.y plus https://z.w")],
        "doc_id long, text string",
    )
    r = pii_counts(df).first()
    assert r.n_emails == 2 and r.n_urls == 2


def test_repetition_ratio(spark):
    df = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam spam"),  # one repeated 2-gram
            (1, "every word here is totally unique today"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.top_ngram_ratio for r in repetition_ratio(df).collect()}
    assert out[0] == 1.0
    assert out[1] < 0.5


def test_quality_stratified_filter(spark):
    rows = [(i, "a", float(i)) for i in range(10)]
    rows += [(100 + i, "b", float(i)) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, source string, q double")
    kept = quality_stratified_filter(
        df, score_col="q", strata_col="source", keep_fraction=0.5
    ).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r.source, []).append(r.q)
    assert len(by_src["a"]) == 5 and min(by_src["a"]) == 5.0  # top half
    assert len(by_src["b"]) == 2 and min(by_src["b"]) == 2.0


def test_sample_by_hash_deterministic_and_stable(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(1000)], "doc_id long"
    )
    a = {r.doc_id for r in sample_by_hash(df, "doc_id", 0.3).collect()}
    b = {
        r.doc_id
        for r in sample_by_hash(df.repartition(7), "doc_id", 0.3).collect()
    }
    assert a == b  # partitioning-independent
    assert 0.2 < len(a) / 1000 < 0.4  # roughly the asked fraction
    # monotone: a smaller fraction is a subset of a larger one
    c = {r.doc_id for r in sample_by_hash(df, "doc_id", 0.1).collect()}
    assert c <= a


def test_train_test_split_partition_and_leakage(spark):
    df = spark.createDataFrame(
        [(i % 50, i) for i in range(500)], "user long, row long"
    )
    train, test = train_test_split(df, key="user", test_fraction=0.2)
    tr = train.select("user").distinct()
    te = test.select("user").distinct()
    # exact partition: no key on both sides, none lost
    assert tr.intersect(te).count() == 0
    assert tr.count() + te.count() == 50
    assert train.count() + test.count() == 500


def test_stratified_sample_by_hash(spark):
    """Per-stratum fractions hold (hash-deterministic), membership is
    stable across repartitionings, and full-keep strata keep all."""
    from polaroam_spark.operators.sampling import (
        sample_by_hash,
        stratified_sample_by_hash,
    )

    rows = [(i, "keep_all" if i % 3 == 0 else ("half" if i % 3 == 1 else "rare"))
            for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_sample_by_hash(
        df, key="doc_id", strata_col="source",
        fractions={"keep_all": 1.0, "half": 0.5}, default_fraction=0.0,
    )
    got = {r.source: 0 for r in out.collect()}
    for r in out.collect():
        got[r.source] = got.get(r.source, 0) + 1
    assert got.get("keep_all") == 200
    assert 60 <= got.get("half", 0) <= 140  # ~100 expected
    assert "rare" not in got  # default fraction 0 drops the stratum

    # same membership after repartition
    ids1 = {r.doc_id for r in out.collect()}
    ids2 = {
        r.doc_id
        for r in stratified_sample_by_hash(
            df.repartition(13), key="doc_id", strata_col="source",
            fractions={"keep_all": 1.0, "half": 0.5},
        ).collect()
    }
    assert ids1 == ids2
    # a stratum sampled at fraction f matches sample_by_hash(f) there
    half_ids = {r.doc_id for r in out.filter("source = 'half'").collect()}
    plain = {
        r.doc_id
        for r in sample_by_hash(
            df.filter("source = 'half'"), key="doc_id", fraction=0.5
        ).collect()
    }
    assert half_ids == plain


def test_deterministic_shuffle_stable_and_sharded(spark):
    from polaroam_spark.operators.sampling import deterministic_shuffle

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")

    # global-sort path: permutation is a pure function of (key, seed),
    # invariant to input partitioning
    a = [r.doc_id for r in
         deterministic_shuffle(df, "doc_id", seed=41).collect()]
    b = [r.doc_id for r in
         deterministic_shuffle(df.repartition(13), "doc_id", seed=41)
         .collect()]
    assert a == b
    assert sorted(a) == list(range(500))
    assert a != sorted(a)  # it actually permutes
    # a different seed yields a different permutation
    c = [r.doc_id for r in
         deterministic_shuffle(df, "doc_id", seed=42).collect()]
    assert a != c

    # sharded path: same row set, each shard internally ordered by the
    # shuffle key, shard ranges disjoint (range partitioning)
    sharded = deterministic_shuffle(df, "doc_id", seed=41, num_shards=4)
    assert sharded.rdd.getNumPartitions() == 4
    parts = sharded.select("doc_id", "shuffle_key").rdd.glom().collect()
    seen = []
    ranges = []
    for p in parts:
        keys = [row.shuffle_key for row in p]
        assert keys == sorted(keys)
        if keys:
            ranges.append((keys[0], keys[-1]))
        seen.extend(row.doc_id for row in p)
    assert sorted(seen) == list(range(500))
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_calibrate_scores_per_stratum_percentile(spark):
    from polaroam_spark.operators.textstats import calibrate_scores

    rows = [
        # source A: scores 10 < 20 < 30
        (0, "a", 30.0), (1, "a", 10.0), (2, "a", 20.0),
        # source B: very different raw scale — calibration aligns it
        (3, "b", 0.002), (4, "b", 0.001),
        (5, "c", 7.0),  # singleton stratum
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, quality_score double"
    )
    out = {r.doc_id: r.calibrated_score
           for r in calibrate_scores(df).collect()}
    assert out[1] == 0.0 and out[2] == 0.5 and out[0] == 1.0
    assert out[4] == 0.0 and out[3] == 1.0
    assert out[5] == 0.0  # percent_rank of a single row
    # a shared threshold now means "same percentile" in both sources
    assert {d for d, v in out.items() if v >= 0.99} == {0, 3}

    # coarse scores: ties MUST share a calibrated value (no arbitrary
    # spread across [0,1] by id)
    ties = spark.createDataFrame(
        [(i, "z", 0.5) for i in range(10)] + [(99, "z", 0.9)],
        "doc_id long, source string, quality_score double",
    )
    tied = {r.doc_id: r.calibrated_score
            for r in calibrate_scores(ties).collect()}
    assert all(tied[i] == 0.0 for i in range(10))
    assert tied[99] == 1.0


def test_tfidf_top_terms_surfaces_distinctive_words(spark):
    from polaroam_spark.operators.chunking import tfidf_top_terms

    rows = [
        (0, "the the the zebra zebra quantum"),
        (1, "the the galaxy galaxy galaxy quantum"),
        (2, "the quantum quantum plasma"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_top_terms(docs, top_k=2).collect()
    top1 = {r.doc_id: r.token for r in out if r.term_rank == 1}
    # 'the' appears in every doc (idf = 0) and can never win
    assert top1 == {0: "zebra", 1: "galaxy", 2: "plasma"}
    assert all(r.tfidf > 0 for r in out if r.term_rank == 1)
    # ranks are dense 1..k per doc
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.term_rank)
    assert all(sorted(v) == list(range(1, len(v) + 1))
               for v in by_doc.values())


def test_calibrate_scores_null_propagates(spark):
    from polaroam_spark.operators.textstats import calibrate_scores

    df = spark.createDataFrame(
        [("web", 0, 0.2), ("web", 1, 0.8), ("web", 2, 0.5),
         ("web", 3, None), ("cur", 4, 0.9)],
        "source string, doc_id long, quality_score double",
    )
    out = {r.doc_id: r.calibrated_score
           for r in calibrate_scores(df).collect()}
    # null score -> null percentile, and it does NOT dilute the
    # denominator of the non-null rows (ranks over 3 scored docs)
    assert out[3] is None
    assert out[0] == 0.0 and out[2] == 0.5 and out[1] == 1.0
    assert out[4] == 0.0  # single-row stratum


def test_gopher_quality_flags(spark):
    from polaroam_spark.operators.textstats import gopher_quality_flags

    good = (
        "the quick brown fox jumps over the lazy dog and then runs "
        "far away into the woods with a friend of his that likes to "
        "play in the sun for hours and hours until the day is done "
        "and they all go home to rest for the night is long"
    )
    bullets = "- one\n- two\n- three\n* four"
    symbols = "# " * 30 + "the of " * 15
    df = spark.createDataFrame(
        [(0, good), (1, "too short"), (2, bullets), (3, symbols), (4, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_quality_flags(df).collect()}
    assert out[0].passes_gopher
    assert out[0].n_words >= 50
    assert not out[1].passes_gopher  # < 50 words
    assert not out[2].passes_gopher  # bullet lines
    assert out[2].bullet_line_frac == 1.0
    assert not out[3].passes_gopher  # symbol ratio
    assert out[3].symbol_word_ratio > 0.1
    # blank doc: zero words, all ratios defined (no div-by-zero)
    assert out[4].n_words == 0 and not out[4].passes_gopher


def test_duplicate_line_stats(spark):
    from polaroam_spark.operators.textstats import duplicate_line_stats

    df = spark.createDataFrame(
        [
            (0, "alpha\nbeta\nalpha\ngamma"),  # 1 of 4 lines is a repeat
            (1, "one\ntwo\nthree"),  # no dups
            (2, "x\nx\nx\nx"),  # all one line
            (3, "   \n\n  "),  # only blank lines
            (4, None),  # null text
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in duplicate_line_stats(df).collect()}
    assert out[0].n_lines == 4
    assert abs(out[0].dup_line_frac - 0.25) < 1e-12
    # 2 'alpha' occurrences x 5 chars = 10 duplicated chars over
    # 5+4+5+5 = 19 total line chars
    assert abs(out[0].dup_line_char_frac - 10.0 / 19.0) < 1e-12
    assert out[1].dup_line_frac == 0.0
    assert out[2].n_lines == 4 and abs(out[2].dup_line_frac - 0.75) < 1e-12
    assert out[2].dup_line_char_frac == 1.0
    assert out[3].n_lines == 0 and out[3].dup_line_frac == 0.0
    assert out[4].n_lines == 0 and out[4].dup_line_char_frac == 0.0


def test_cap_per_key(spark):
    from polaroam_spark.operators.sampling import cap_per_key

    rows = [(i, "hot" if i < 90 else "cold") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, key string")
    out = cap_per_key(df, key="key", id_col="id", max_per_key=5, seed=7)
    counts = {
        r.key: r.n
        for r in out.groupBy("key").agg(F.count("*").alias("n")).collect()
    }
    assert counts["hot"] == 5
    assert counts["cold"] == 5  # 10 cold rows also capped
    # deterministic across partitionings
    a = sorted(r.id for r in out.collect())
    b = sorted(
        r.id
        for r in cap_per_key(
            df.repartition(7), key="key", id_col="id", max_per_key=5, seed=7
        ).collect()
    )
    assert a == b
    # cap larger than the group keeps everything
    assert (
        cap_per_key(df, key="key", id_col="id", max_per_key=1000).count()
        == 100
    )


def test_weighted_sample_by_hash(spark):
    from polaroam_spark.operators.sampling import weighted_sample_by_hash

    rows = [(i, float(w)) for i, w in enumerate([0] * 50 + [10**9] * 50)]
    rows.append((100, None))
    df = spark.createDataFrame(rows, "id long, w double")
    kept = sorted(
        r.id
        for r in weighted_sample_by_hash(
            df, key="id", weight_col="w", rate=1.0, seed=3
        ).collect()
    )
    # zero weight and null weight never selected; huge weight always
    assert kept == list(range(50, 100))
    # expected fraction tracks rate*weight for mid-range weights
    mid = spark.createDataFrame(
        [(i, 1.0) for i in range(2000)], "id long, w double"
    )
    n = weighted_sample_by_hash(
        mid, key="id", weight_col="w", rate=0.25, seed=3
    ).count()
    assert 400 <= n <= 600


def test_gopher_flags_null_text_and_unicode_words(spark):
    from polaroam_spark.operators.textstats import gopher_quality_flags

    df = spark.createDataFrame(
        [(0, None), (1, "café naïve übermäßig señor Москва")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_quality_flags(df).collect()}
    # NULL text -> hard False (not NULL): kept+rejected must sum
    assert out[0].passes_gopher is False
    assert out[0].n_words == 0
    # accented / non-Latin words count as alphabetic
    assert out[1].alpha_word_frac == 1.0


def test_duplicate_line_stats_idempotent_rerun(spark):
    from polaroam_spark.operators.textstats import duplicate_line_stats

    df = spark.createDataFrame(
        [(0, "a\nb\na")], "doc_id long, text string"
    )
    once = duplicate_line_stats(df)
    twice = duplicate_line_stats(once)  # must not AMBIGUOUS_REFERENCE
    r = twice.collect()[0]
    assert r.n_lines == 3 and abs(r.dup_line_frac - 1 / 3) < 1e-12


def test_topk_per_key_reserved_column_guard(spark):
    from polaroam_spark.operators.sampling import topk_per_key

    df = spark.createDataFrame([(1, 2, 3)], "k long, s long, _rn long")
    with pytest.raises(ValueError, match="_rn"):
        topk_per_key(df, key="k", order_col="s", k=1)


def test_temperature_sample_flattens_mix(spark):
    """T=3 must shrink the dominant group's share toward the
    temperature mix while rare groups keep (almost) everything; T=1 at
    target 1.0 is identity membership; NULL groups drop; results are
    deterministic; temperature must be positive."""
    import pytest

    from polaroam_spark.operators.sampling import temperature_sample

    rows = (
        [(i, "big") for i in range(800)]
        + [(i + 800, "small") for i in range(100)]
        + [(901, None)]
    )
    df = spark.createDataFrame(rows, "doc_id long, grp string")

    out = temperature_sample(
        df, key="doc_id", group_col="grp", temperature=3.0,
        target_fraction=0.5,
    )
    counts = {r.grp: r.n for r in
              out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert None not in counts
    # natural shares: 8/9 vs 1/9; T=3 target shares ~0.65/0.35 of the
    # 450-row budget -> big is thinned hard, small keeps most rows
    assert counts["big"] < 450
    assert counts["small"] > 60
    # identity case
    ident = temperature_sample(
        df, key="doc_id", group_col="grp", temperature=1.0,
        target_fraction=1.0,
    )
    assert ident.count() == 900  # all non-NULL-group rows
    # determinism
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in temperature_sample(
            df, key="doc_id", group_col="grp", temperature=3.0,
            target_fraction=0.5,
        ).collect()
    )
    assert a == b
    with pytest.raises(ValueError, match="temperature"):
        temperature_sample(
            df, key="doc_id", group_col="grp", temperature=0.0
        )


def test_temperature_epoch_plan_normalizations(spark):
    from polaroam_spark.operators.sampling import temperature_epoch_plan

    rows = (
        [(i, "big") for i in range(800)]
        + [(i + 800, "small") for i in range(100)]
        + [(901, None)]
    )
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    plan = {r.group: r for r in
            temperature_epoch_plan(df, "grp", 3.0).collect()}
    assert set(plan) == {"big", "small"}  # NULL group dropped
    # min-normalize: dominant group pinned at exactly 1.0, rare > 1
    assert plan["big"].repeat_factor == 1.0
    assert plan["small"].repeat_factor > 1.0
    # target shares are a distribution and flatter than natural
    assert abs(
        plan["big"].target_share + plan["small"].target_share - 1.0
    ) < 1e-12
    assert plan["big"].target_share < plan["big"].natural_share
    # mean-normalize preserves the doc-weighted mean factor
    m = temperature_epoch_plan(df, "grp", 3.0, normalize="mean").collect()
    n_total = sum(r.n_docs for r in m)
    assert abs(
        sum(r.n_docs * r.repeat_factor for r in m) / n_total - 1.0
    ) < 1e-9
    # T=1 is the identity mix: every factor exactly 1 in both modes
    ident = temperature_epoch_plan(df, "grp", 1.0).collect()
    assert all(abs(r.repeat_factor - 1.0) < 1e-12 for r in ident)
    import pytest

    with pytest.raises(ValueError, match="normalize"):
        temperature_epoch_plan(df, "grp", 3.0, normalize="median")


def test_temperature_mixing_by_token_weight(spark):
    """weight_col switches shares from doc counts to summed weight:
    100 short docs (10 tok) vs 10 long docs (1000 tok) — by docs the
    short group dominates 10:1, by tokens the long group dominates
    10:1, and the epoch plan / sampler must follow the chosen basis."""
    from polaroam_spark.operators.sampling import (
        temperature_epoch_plan,
        temperature_sample,
    )

    rows = [(i, "short", 10) for i in range(100)] + [
        (100 + i, "long", 1000) for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, grp string, n_tokens long"
    )
    by_docs = {
        r.group: r.natural_share
        for r in temperature_epoch_plan(df, "grp", 2.0).collect()
    }
    by_toks = {
        r.group: r.natural_share
        for r in temperature_epoch_plan(
            df, "grp", 2.0, weight_col="n_tokens"
        ).collect()
    }
    assert by_docs["short"] > 0.9 and by_toks["short"] < 0.1
    # sampler: under token shares the LONG group is dominant and gets
    # thinned; the short group's implied rate clamps at 1 (keeps all)
    out = temperature_sample(
        df, key="doc_id", group_col="grp", temperature=2.0,
        target_fraction=0.5, weight_col="n_tokens",
    )
    counts = {
        r.grp: r.n
        for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert counts["short"] == 100
    assert counts["long"] < 10


def test_temperature_epoch_plan_flattening_invariants(spark):
    """Structural invariants over random group-count profiles, one
    Spark job per profile: target shares form a distribution, T>1
    strictly shrinks the dominant group's share and grows the
    rarest's, and raising T moves every share toward uniform."""
    import random

    from polaroam_spark.operators.sampling import temperature_epoch_plan

    rnd = random.Random(11)
    for trial in range(3):
        k = rnd.randint(3, 6)
        counts = [rnd.randint(1, 500) for _ in range(k)]
        rows = [
            (sum(counts[:g]) + i, f"g{g}")
            for g in range(k)
            for i in range(counts[g])
        ]
        df = spark.createDataFrame(rows, "doc_id long, grp string")
        p2 = {r.group: (r.natural_share, r.target_share)
              for r in temperature_epoch_plan(df, "grp", 2.0).collect()}
        p5 = {r.group: r.target_share
              for r in temperature_epoch_plan(df, "grp", 5.0).collect()}
        tot = sum(q for _, q in p2.values())
        assert abs(tot - 1.0) < 1e-12
        hi = max(p2, key=lambda g: p2[g][0])
        lo = min(p2, key=lambda g: p2[g][0])
        if p2[hi][0] > p2[lo][0]:  # non-degenerate profile
            assert p2[hi][1] < p2[hi][0]
            assert p2[lo][1] > p2[lo][0]
            # higher T -> closer to uniform than lower T
            u = 1.0 / k
            assert abs(p5[hi] - u) <= abs(p2[hi][1] - u) + 1e-12
            assert abs(p5[lo] - u) <= abs(p2[lo][1] - u) + 1e-12


def test_temperature_sample_single_group_and_empty(spark):
    """Degenerate shapes: one group reduces to plain hash sampling at
    target_fraction; an empty frame stays empty without erroring."""
    from polaroam_spark.operators.sampling import (
        sample_by_hash,
        temperature_sample,
    )

    one = spark.createDataFrame(
        [(i, "only") for i in range(200)], "doc_id long, grp string"
    )
    got = sorted(
        r.doc_id
        for r in temperature_sample(
            one, key="doc_id", group_col="grp", temperature=4.0,
            target_fraction=0.3,
        ).collect()
    )
    want = sorted(
        r.doc_id
        for r in sample_by_hash(one, key="doc_id", fraction=0.3).collect()
    )
    assert got == want
    empty = spark.createDataFrame([], "doc_id long, grp string")
    assert (
        temperature_sample(
            empty, key="doc_id", group_col="grp", temperature=2.0
        ).count()
        == 0
    )


def test_temperature_sample_zero_mass_group(spark):
    """ADVICE r10 #1 regression: a group whose summed weight is 0
    (all-NULL weights) with T>1 used to make pow(0, 1/T-1) = Inf, so
    the denominator became 0*Inf = NaN and least(1.0, NaN) silently
    set EVERY group's keep-rate to 1.0 — the sampler returned the
    full corpus. Zero-mass groups are now dropped (natural share 0 ⇒
    temperature target 0) and the other groups' rates stay real."""
    from polaroam_spark.operators.sampling import temperature_sample

    rows = (
        [(i, "big", 10) for i in range(400)]
        + [(400 + i, "small", 10) for i in range(40)]
        + [(440 + i, "ghost", None) for i in range(5)]
    )
    df = spark.createDataFrame(
        rows, "doc_id long, grp string, n_tokens long"
    )
    out = temperature_sample(
        df, key="doc_id", group_col="grp", temperature=2.0,
        target_fraction=0.5, weight_col="n_tokens",
    )
    counts = {
        r.grp: r.n
        for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert "ghost" not in counts  # zero-mass group dropped
    # NOT the full corpus: the dominant group must actually be thinned
    assert counts["big"] < 400
    # identical to running without the ghost rows at all
    clean = temperature_sample(
        df.filter(F.col("grp") != "ghost"), key="doc_id",
        group_col="grp", temperature=2.0, target_fraction=0.5,
        weight_col="n_tokens",
    )
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in clean.collect()
    )


def test_temperature_epoch_plan_fractional_and_zero_weights(spark):
    """ADVICE r10 #3 regression: weight mode used to cast each weight
    to long BEFORE summing (0.5 truncated to 0 per row) and to emit a
    NaN repeat_factor (0/0) for zero-mass groups. Fractional weights
    must survive the sum and zero-mass groups must be dropped."""
    import math

    from polaroam_spark.operators.sampling import temperature_epoch_plan

    rows = (
        [(i, "frac", 0.5) for i in range(100)]
        + [(100 + i, "whole", 10.0) for i in range(10)]
        + [(110 + i, "ghost", None) for i in range(3)]
    )
    df = spark.createDataFrame(
        rows, "doc_id long, grp string, wt double"
    )
    plan = {
        r.group: r
        for r in temperature_epoch_plan(
            df, "grp", 2.0, weight_col="wt"
        ).collect()
    }
    assert set(plan) == {"frac", "whole"}  # ghost dropped
    # 100 * 0.5 = 50.0, not 100 * long(0.5) = 0
    assert plan["frac"].n_docs == pytest.approx(50.0)
    assert plan["whole"].n_docs == pytest.approx(100.0)
    assert abs(plan["frac"].natural_share - 1.0 / 3.0) < 1e-12
    for r in plan.values():
        assert math.isfinite(r.repeat_factor)
    assert min(r.repeat_factor for r in plan.values()) == pytest.approx(
        1.0
    )


def test_bigram_vs_reference_rejects_lambda_one(spark):
    """ADVICE r10 #4 regression: lambda_bigram=1.0 would score an
    unseen-context bigram as log(0) -> NULL, silently excluding it
    from the document mean — the OOV contract says it must dent the
    mean, so 1.0 is rejected."""
    from polaroam_spark.operators.textstats import (
        bigram_logprob_vs_reference,
    )

    docs = spark.createDataFrame(
        [(1, "hello world")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="lambda_bigram"):
        bigram_logprob_vs_reference(docs, docs, lambda_bigram=1.0)


def test_gumbel_topk_sample_weighted_without_replacement(spark):
    """Gumbel top-k sampling: exact-k survivor counts, determinism
    across runs (hash-derived noise, no RNG), NULL-weight exclusion,
    and weight dominance — rows whose log weight towers over the
    noise scale must always be selected."""
    from polaroam_spark.operators.sampling import gumbel_topk_sample

    rows = [(i, 0.0) for i in range(100)] + [
        (100 + i, 50.0) for i in range(5)  # ~e^50 heavier: must win
    ] + [(200, None)]
    df = spark.createDataFrame(rows, "doc_id long, lw double")

    out = gumbel_topk_sample(df, "lw", key="doc_id", k=10)
    got = sorted(r.doc_id for r in out.collect())
    assert len(got) == 10
    assert set(range(100, 105)).issubset(got)  # heavy rows all in
    assert 200 not in got  # NULL weight excluded
    again = sorted(
        r.doc_id
        for r in gumbel_topk_sample(df, "lw", key="doc_id", k=10).collect()
    )
    assert got == again  # deterministic

    # fraction form: ceil(0.25 * 105 non-null rows) = 27
    frac = gumbel_topk_sample(df, "lw", key="doc_id", fraction=0.25)
    assert frac.count() == 27

    with pytest.raises(ValueError, match="exactly one"):
        gumbel_topk_sample(df, "lw", key="doc_id")
    with pytest.raises(ValueError, match="exactly one"):
        gumbel_topk_sample(df, "lw", key="doc_id", k=3, fraction=0.5)


def test_gumbel_topk_weight_monotonicity(spark):
    """Structural invariant of Gumbel top-k with hash-pinned noise:
    raising one row's log weight changes nothing about the other
    rows' scores, so the new survivor set can differ from the old
    only by admitting the raised row (evicting at most the old
    boundary row): new ⊆ old ∪ {raised}."""
    from polaroam_spark.operators.sampling import gumbel_topk_sample

    df = spark.createDataFrame(
        [(i, float(i % 13)) for i in range(120)],
        "doc_id long, lw double",
    )
    old = {
        r.doc_id
        for r in gumbel_topk_sample(df, "lw", key="doc_id", k=30).collect()
    }
    for raised in (7, 55):  # one likely-out, one arbitrary row
        bumped = df.withColumn(
            "lw",
            F.when(F.col("doc_id") == raised, F.lit(1000.0)).otherwise(
                F.col("lw")
            ),
        )
        new = {
            r.doc_id
            for r in gumbel_topk_sample(
                bumped, "lw", key="doc_id", k=30
            ).collect()
        }
        assert raised in new
        assert new <= old | {raised}, (raised, new - old)
        assert len(new) == 30


def test_leakage_safe_split_keeps_neardup_components_together(spark):
    """No duplicate component may straddle the split; unpaired docs
    split by their own id; train+test partition the corpus; the
    split is deterministic."""
    from polaroam_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)],
        "doc_id long, text string",
    )
    # components: {0,1,2} (chained), {10,11}, rest unpaired
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    train, test = leakage_safe_split(
        docs, pairs, test_fraction=0.3, seed=7
    )
    tr = {r.doc_id for r in train.collect()}
    te = {r.doc_id for r in test.collect()}
    assert tr | te == set(range(200)) and not (tr & te)
    for comp in ({0, 1, 2}, {10, 11}):
        assert comp <= tr or comp <= te, comp
    # deterministic
    tr2, te2 = leakage_safe_split(docs, pairs, test_fraction=0.3, seed=7)
    assert {r.doc_id for r in te2.collect()} == te
    # ~30% of rows in test (hash split: rough band)
    assert 30 <= len(te) <= 90
    import pytest

    with pytest.raises(ValueError, match="test_fraction"):
        leakage_safe_split(docs, pairs, test_fraction=1.5)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
@pytest.mark.slow
def test_leakage_safe_split_property(spark, seed):
    """Property: for random pair graphs (chains, stars, cliques by
    construction of random edges), no connected component ever
    straddles the split, the two sides partition the corpus, and
    membership is invariant to pair-table row order."""
    import random

    from polaroam_spark.operators.sampling import leakage_safe_split

    rnd = random.Random(seed)
    n = rnd.randint(2, 120)
    docs = spark.createDataFrame(
        [(i,) for i in range(n)], "doc_id long"
    )
    m = rnd.randint(0, n)
    edges = [
        (rnd.randrange(n), rnd.randrange(n)) for _ in range(m)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(
        edges or [(0, 0)], "id_a long, id_b long"
    )
    if not edges:
        pairs = pairs.filter("id_a <> id_b")  # empty pair table
    frac = rnd.choice([0.0, 0.2, 0.5, 1.0])
    train, test = leakage_safe_split(
        docs, pairs, test_fraction=frac, seed=rnd.randint(0, 99)
    )
    tr = {r.doc_id for r in train.collect()}
    te = {r.doc_id for r in test.collect()}
    assert tr | te == set(range(n)) and not (tr & te)
    # union-find ground-truth components
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    comps: dict = {}
    for i in range(n):
        comps.setdefault(find(i), set()).add(i)
    for comp in comps.values():
        assert comp <= tr or comp <= te, (seed, comp)
    if frac == 0.0:
        assert not te
    if frac == 1.0:
        assert not tr


def test_leakage_safe_split_survives_caller_representative_column(spark):
    """r12 code-review regression: a caller frame that already
    carries a `representative` column (natural after an earlier
    duplicate_components annotation) must neither raise an ambiguous
    reference nor lose its column through the split."""
    from polaroam_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, i * 100) for i in range(50)],
        "doc_id long, representative long",
    )
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    train, test = leakage_safe_split(docs, pairs, test_fraction=0.3)
    assert set(train.columns) == {"doc_id", "representative"}
    got = {r.doc_id: r.representative for r in train.collect()}
    got.update({r.doc_id: r.representative for r in test.collect()})
    assert got == {i: i * 100 for i in range(50)}
    comp = {
        r.doc_id
        for r in train.filter(F.col("doc_id") < 2).collect()
    } | {r.doc_id for r in test.filter(F.col("doc_id") < 2).collect()}
    assert comp == {0, 1}
