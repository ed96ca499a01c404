"""Chunking / packing / vocabulary / transitive-dedup operators."""

import pyspark.sql.functions as F
import pytest

from polaroam_spark.operators.chunking import (
    chunk_documents,
    corpus_vocabulary,
    packing_plan,
)
from polaroam_spark.operators.dedup import duplicate_components


def test_chunk_documents_roundtrip(spark):
    text = " ".join(f"w{i}" for i in range(150))
    df = spark.createDataFrame([(0, text), (1, "short doc")],
                               "doc_id long, text string")
    chunks = chunk_documents(df, chunk_tokens=64).orderBy(
        "doc_id", "chunk_id").collect()
    doc0 = [c for c in chunks if c.doc_id == 0]
    assert [c.n_tokens for c in doc0] == [64, 64, 22]
    # concatenating chunks reproduces the token stream
    rejoined = " ".join(c.chunk_text for c in doc0)
    assert rejoined == text
    doc1 = [c for c in chunks if c.doc_id == 1]
    assert len(doc1) == 1 and doc1[0].n_tokens == 2


def test_packing_plan_budget(spark):
    rows = [(i, 100) for i in range(10)]  # 10 chunks x 100 tokens
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = packing_plan(
        df, budget_tokens=250, id_cols=("doc_id",)
    ).collect()
    bins = {}
    for r in packed:
        bins.setdefault(r.pack_id, 0)
        bins[r.pack_id] += r.n_tokens
    # every bin holds <= budget + one chunk overhang; nothing lost
    assert all(v <= 300 for v in bins.values())
    assert sum(bins.values()) == 1000
    # deterministic across partitionings
    packed2 = packing_plan(
        df.repartition(5), budget_tokens=250, id_cols=("doc_id",)
    ).collect()
    assert {(r.doc_id, r.pack_id) for r in packed} == {
        (r.doc_id, r.pack_id) for r in packed2
    }


def test_packing_plan_with_stratum_is_contiguous(spark):
    rows = [(i, "s", 100) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, src string, n_tokens long")
    packed = packing_plan(
        df, budget_tokens=250, id_cols=("doc_id",), strata_col="src"
    ).collect()
    assert {r.pack_id for r in packed} == {0, 1, 2, 3}


def test_corpus_vocabulary(spark):
    df = spark.createDataFrame(
        [(0, "a a a b b c"), (1, "a b d")], "doc_id long, text string"
    )
    vocab = {r.token: r.n for r in corpus_vocabulary(df, top_k=3).collect()}
    assert vocab == {"a": 4, "b": 3, "c": 1}  # top-3, ties by token


@pytest.mark.slow
def test_duplicate_components_transitive(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "id_a long, id_b long"
    )
    comp = {r.doc_id: r.representative
            for r in duplicate_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_materialize_packs_roundtrip(spark):
    from polaroam_spark.operators.chunking import (
        chunk_documents,
        materialize_packs,
        packing_plan,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}t{j}" for j in range(23))) for i in range(40)],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, chunk_tokens=10)
    planned = packing_plan(chunks, budget_tokens=32)
    packs = materialize_packs(planned, separator=" <sep> ").collect()

    # every input token survives exactly once across all packs
    all_tokens = []
    for p in packs:
        all_tokens.extend(
            t for t in p.text.split(" ") if t not in ("<sep>",)
        )
    assert sorted(all_tokens) == sorted(
        f"w{i}t{j}" for i in range(40) for j in range(23)
    )
    # chunk order within a pack follows (doc_id, chunk_id): each
    # doc's tokens appear in original order inside its pack
    for p in packs:
        toks = [t for t in p.text.split(" ") if t != "<sep>"]
        pos = {t: k for k, t in enumerate(toks)}
        by_doc = {}
        for t in toks:
            by_doc.setdefault(t.split("t")[0], []).append(pos[t])
        for positions in by_doc.values():
            assert positions == sorted(positions)
    # accounting columns agree with the plan
    total = {p.pack_id: p for p in packs}
    replan = planned.groupBy("pack_id").count().collect()
    assert {r.pack_id: r["count"] for r in replan} == {
        k: v.n_chunks for k, v in total.items()
    }
    # start-offset rule: every pack's token total is bounded by
    # budget + max_chunk - 1
    assert all(p.n_tokens <= 32 + 10 - 1 for p in packs)


def test_packing_plan_stratified_ids_globally_unique(spark):
    from polaroam_spark.operators.chunking import packing_plan

    rows = [(i, s, 10) for s in ("a", "b", "c") for i in range(20)]
    chunks = spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long"
    )
    out = packing_plan(
        chunks, budget_tokens=50, id_cols=("doc_id",),
        strata_col="source",
    )
    per_stratum = (
        out.groupBy("source")
        .agg(F.collect_set("pack_id").alias("ids"))
        .collect()
    )
    all_ids = [i for r in per_stratum for i in r.ids]
    # no pack id is shared across strata — the docstring's global
    # uniqueness claim, which materialize_packs depends on
    assert len(all_ids) == len(set(all_ids))


def test_packing_plan_null_stratum_packs(spark):
    from polaroam_spark.operators.chunking import packing_plan

    chunks = spark.createDataFrame(
        [(1, None, 10), (2, None, 10), (3, "a", 10)],
        "doc_id long, source string, n_tokens long",
    )
    out = packing_plan(
        chunks, budget_tokens=15, id_cols=("doc_id",),
        strata_col="source",
    )
    # null stratum is a stratum (null-safe join), not dropped rows
    assert out.count() == 3


def test_packing_plan_reserved_columns_raise(spark):
    from polaroam_spark.operators.chunking import packing_plan

    chunks = spark.createDataFrame(
        [(1, 10, 0)], "doc_id long, n_tokens long, pack_id long"
    )
    with pytest.raises(ValueError, match="reserves"):
        packing_plan(chunks, id_cols=("doc_id",))


def test_packing_plan_sharded_stratum_is_valid_packing(spark):
    from polaroam_spark.operators.chunking import packing_plan

    rows = [(i, "hot", 10) for i in range(200)]
    chunks = spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long"
    )
    out = packing_plan(
        chunks, budget_tokens=55, id_cols=("doc_id",),
        strata_col="source", shards_per_stratum=4,
    )
    sums = out.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("tot"), F.count("*").alias("n")
    ).collect()
    assert out.count() == 200
    # overflow bound: budget + max_chunk - 1
    assert all(r.tot <= 55 + 10 - 1 for r in sums)


def test_bm25_search_ranking(spark):
    import pytest

    from polaroam_spark.operators.chunking import bm25_search

    docs = spark.createDataFrame(
        [
            (0, "apple banana cherry date"),          # both terms
            (1, "apple apple apple apple"),           # common term only
            (2, "banana kiwi lime mango"),            # rare term only
            (3, "kiwi lime mango papaya"),            # neither
            (4, "apple pear plum fig"),
            (5, "apple pear plum fig grape melon"),
        ],
        "doc_id long, text string",
    )
    out = bm25_search(docs, "apple banana", top_k=10).collect()
    ranks = {r.doc_id: r.rank for r in out}
    scores = {r.doc_id: r.score for r in out}
    assert 3 not in ranks  # no query term, no row
    assert ranks[0] == 1   # both terms beat any single-term doc
    # 'banana' (df=2) is rarer than 'apple' (df=4): doc 2 outranks
    # the apple-only docs despite apple's higher tf in doc 1
    assert scores[2] > scores[1]
    # ranks are 1..k dense and consistent with score order
    ordered = sorted(out, key=lambda r: r.rank)
    assert [r.rank for r in ordered] == list(range(1, len(out) + 1))
    assert all(
        a.score >= b.score for a, b in zip(ordered, ordered[1:])
    )
    with pytest.raises(ValueError):
        bm25_search(docs, "   ")


def test_chunk_documents_with_overlap(spark):
    import pytest

    from polaroam_spark.operators.chunking import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    out = sorted(
        (r.chunk_id, r.chunk_text)
        for r in chunk_documents(
            df, chunk_tokens=4, overlap=2
        ).collect()
    )
    # stride 2: windows [0:4], [2:6], [4:8], [6:10]; [8:12] is the
    # 2-token tail fully covered except its last tokens -> included
    texts = [t for _, t in out]
    assert texts[0] == "w0 w1 w2 w3"
    assert texts[1] == "w2 w3 w4 w5"
    assert texts[-1].endswith("w9")
    # every consecutive pair shares exactly overlap tokens
    for a, b in zip(texts, texts[1:]):
        assert a.split()[2:] == b.split()[:2] or len(b.split()) < 4
    # overlap=0 reproduces the historical disjoint chunking
    plain = chunk_documents(df, chunk_tokens=4).collect()
    assert sorted(r.chunk_text for r in plain) == sorted(
        ["w0 w1 w2 w3", "w4 w5 w6 w7", "w8 w9"]
    )
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_sentence_chunking_greedy_budget(spark):
    from polaroam_spark.operators.chunking import chunk_documents_sentences

    rows = [
        # 4 sentences of 3 tokens each; budget 7 -> chunks of 2+2
        (1, "a b c. d e f. g h i? j k l!"),
        # one 10-token sentence over an 7-token budget -> own chunk
        (2, "one two three four five six seven eight nine ten."),
        (3, ""),          # no sentences -> no rows
        (4, None),        # NULL text -> no rows
        (5, "tiny."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents_sentences(df, max_tokens=7).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    d1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.chunk_text for r in d1] == ["a b c. d e f.", "g h i? j k l!"]
    assert [r.n_tokens for r in d1] == [6, 6]
    # over-budget single sentence survives whole
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_tokens == 10
    assert 3 not in by_doc and 4 not in by_doc
    assert by_doc[5][0].chunk_text == "tiny."
    # never splits inside a sentence: chunk text ends at a boundary
    for r in out:
        assert r.chunk_text == r.chunk_text.strip()


def test_sentence_chunking_matches_python_greedy(spark):
    import random
    import re

    from polaroam_spark.operators.chunking import chunk_documents_sentences

    def py_chunks(text, budget):
        sents = [s.strip() for s in re.findall(r"[^.!?]+[.!?]*", text or "")]
        sents = [s for s in sents if s]
        chunks, used = [], 0
        for s in sents:
            n = len(s.split())
            if used > 0 and used + n > budget:
                chunks.append([s]); used = n
            elif chunks:
                chunks[-1].append(s); used += n
            else:
                chunks.append([s]); used = n
        return [" ".join(c) for c in chunks]

    rng = random.Random(5)
    docs = []
    for d in range(15):
        parts = []
        for _ in range(rng.randint(0, 8)):
            parts.append(
                " ".join(f"t{rng.randint(0,9)}" for _ in range(rng.randint(1, 9)))
                + rng.choice([".", "!", "?", "..."])
            )
        docs.append((d, " ".join(parts)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in chunk_documents_sentences(df, max_tokens=10).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
    for d, text in docs:
        expected = py_chunks(text, 10)
        actual = [t for _, t in sorted(got.get(d, []))]
        assert actual == expected, (d, text)


def test_packing_plan_bestfit_budget_and_waste(spark):
    """BFD packing (r13): every pack total <= budget (oversize chunks
    get singleton packs), rows/ids preserved through the join-back,
    deterministic across runs, and padding waste never exceeds the
    cumsum plan's on the same data."""
    import pytest

    from polaroam_spark.operators.chunking import (
        packing_plan,
        packing_plan_bestfit,
    )

    rows = [(i, 0, ((i * 37) % 90) + 10) for i in range(200)]
    rows.append((500, 0, 300))  # oversize: must become a singleton
    chunks = spark.createDataFrame(
        rows, "doc_id long, chunk_id long, n_tokens long"
    )
    budget = 128
    out = packing_plan_bestfit(
        chunks, budget_tokens=budget, num_shards=4
    )
    got = out.collect()
    assert len(got) == len(rows)
    assert {(r.doc_id, r.chunk_id) for r in got} == {
        (d, c) for d, c, _ in rows
    }
    totals = {}
    members = {}
    for r in got:
        totals[r.pack_id] = totals.get(r.pack_id, 0) + r.n_tokens
        members.setdefault(r.pack_id, []).append(r.doc_id)
    for pid, tot in totals.items():
        if tot > budget:
            assert len(members[pid]) == 1  # only oversize singletons
    # determinism
    again = {
        (r.doc_id, r.chunk_id): r.pack_id
        for r in packing_plan_bestfit(
            chunks, budget_tokens=budget, num_shards=4
        ).collect()
    }
    assert again == {(r.doc_id, r.chunk_id): r.pack_id for r in got}

    # waste comparison vs the cumsum plan, same data (cumsum bins can
    # overflow; count its waste as max(budget - total, 0))
    def waste(plan_rows):
        t = {}
        for r in plan_rows:
            t[r.pack_id] = t.get(r.pack_id, 0) + r.n_tokens
        return sum(max(budget - x, 0) for x in t.values())

    cum = packing_plan(
        chunks, budget_tokens=budget, id_cols=("doc_id", "chunk_id")
    ).collect()
    assert waste(got) <= waste(cum), (waste(got), waste(cum))

    with pytest.raises(ValueError, match="budget_tokens"):
        packing_plan_bestfit(chunks, budget_tokens=0)
    with_null = spark.createDataFrame(
        [(1, 0, None)], "doc_id long, chunk_id long, n_tokens long"
    )
    with pytest.raises(Exception, match="NULL n_tokens"):
        packing_plan_bestfit(with_null, budget_tokens=10).collect()


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=200), min_size=1,
             max_size=60),
    st.integers(min_value=64, max_value=160),
)
def test_bestfit_kernel_property(sizes, budget):
    """Property (driver-level BFD kernel semantics, mirrored in pure
    Python): the GUARANTEES hold on arbitrary inputs — every
    non-singleton bin within budget, every item placed exactly once,
    deterministic. (No universal waste-dominance claim: hypothesis
    found that clipped-padding waste can favor either plan — cumsum
    'wins' by overflowing bins, trading truncation for fullness —
    so waste comparisons are pinned on fixtures, not universally.)"""
    import bisect

    def bfd(sizes):
        order = sorted(range(len(sizes)), key=lambda i: (-sizes[i], i))
        bins = []  # (remaining, idx)
        packs = {}
        n_bins = 0
        for i in order:
            n = sizes[i]
            pos = bisect.bisect_left(bins, (n, -1))
            if pos < len(bins):
                rem, idx = bins.pop(pos)
                bisect.insort(bins, (rem - n, idx))
                packs[i] = idx
            else:
                idx = n_bins
                n_bins += 1
                rem = budget - n
                if rem > 0:
                    bisect.insort(bins, (rem, idx))
                packs[i] = idx
        return packs

    packs = bfd(sizes)
    assert sorted(packs.keys()) == list(range(len(sizes)))
    totals = {}
    for i, p in packs.items():
        totals[p] = totals.get(p, 0) + sizes[i]
    for p, tot in totals.items():
        if tot > budget:
            assert sum(1 for x in packs.values() if x == p) == 1
    assert sum(totals.values()) == sum(sizes)
    assert bfd(sizes) == packs  # deterministic


def test_bestfit_rejects_null_and_duplicate_ids(spark):
    """r13 hardening: the BFD plan joins back on the id columns, so
    NULL ids (silently dropped by an equi-join) and duplicate id
    tuples (row multiplication) must raise instead — both checks are
    exact per-shard because identical tuples hash to one shard."""
    import pytest

    from polaroam_spark.operators.chunking import packing_plan_bestfit

    dup = spark.createDataFrame(
        [(1, 0, 5), (1, 0, 6)],
        "doc_id long, chunk_id long, n_tokens long",
    )
    with pytest.raises(Exception, match="duplicate id"):
        packing_plan_bestfit(dup, budget_tokens=10).collect()

    nul = spark.createDataFrame(
        [(None, 0, 5), (2, 0, 6)],
        "doc_id long, chunk_id long, n_tokens long",
    )
    with pytest.raises(Exception, match="NULL in id"):
        packing_plan_bestfit(nul, budget_tokens=10).collect()


def test_packing_stats_hand_computed_and_bfd_zero_overflow(spark):
    """Hand arithmetic on a fixed plan, NULL rows counted out into
    n_unplanned, and the BFD invariant surfaced as data:
    overflow_tokens == 0 for a best-fit plan while the cumsum plan
    of the same chunks may overflow."""
    from polaroam_spark.operators.chunking import (
        packing_plan,
        packing_plan_bestfit,
        packing_stats,
    )

    planned = spark.createDataFrame(
        [
            (1, 10, 100),   # pack 100: 10+6 = 16 <= 20 -> pad 4
            (2, 6, 100),
            (3, 25, 101),   # pack 101: 25 > 20 -> overflow 5
            (4, 20, 102),   # pack 102: exactly full
            (5, None, 103), # unplanned: NULL tokens
            (6, 7, None),   # unplanned: NULL pack id
        ],
        "doc_id long, n_tokens long, pack_id long",
    )
    st = packing_stats(planned, budget_tokens=20).collect()[0]
    assert (st.n_chunks, st.n_packs, st.n_unplanned) == (4, 3, 2)
    assert st.total_tokens == 61
    assert st.padded_tokens == 4
    assert st.overflow_tokens == 5
    assert (st.full_packs, st.overflow_packs) == (1, 1)
    # kept = 61 - 5 = 56 over 3*20 capacity
    assert st.fill_rate == pytest.approx(56 / 60)

    chunks = spark.createDataFrame(
        [(i, 0, 7 + (i * 13) % 17) for i in range(200)],
        "doc_id long, chunk_id long, n_tokens long",
    )
    bfd = packing_stats(
        packing_plan_bestfit(chunks, budget_tokens=32, num_shards=4),
        budget_tokens=32,
    ).collect()[0]
    cum = packing_stats(
        packing_plan(chunks, budget_tokens=32),
        budget_tokens=32,
    ).collect()[0]
    assert bfd.overflow_tokens == 0 and bfd.overflow_packs == 0
    assert cum.overflow_tokens > 0  # the trade the report quantifies
    assert bfd.n_chunks == cum.n_chunks == 200
    assert bfd.total_tokens == cum.total_tokens


def test_rolling_eval_windows(spark):
    """Sliding-window ppl prep: every token scored exactly once,
    maximal left context, mask on the last n_loss positions,
    padding only when the doc is shorter than seq_len; stride ==
    seq_len degenerates to disjoint all-loss chunks; validation."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from polaroam_spark.operators.chunking import (
        rolling_eval_windows,
    )

    rows = [
        (1, list(range(300))),   # multi-window
        (2, list(range(50))),    # shorter than seq_len -> padded
        (3, list(range(128))),   # exactly seq_len -> one window
        (4, None),               # no rows
        (5, []),                 # no rows
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, token_ids array<int>"
    )
    out = rolling_eval_windows(df, seq_len=128, stride=64)
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append(r)
    assert set(got) == {1, 2, 3}
    for did, n in ((1, 300), (2, 50), (3, 128)):
        ws = sorted(got[did], key=lambda r: r.seq_id)
        assert sum(r.n_loss for r in ws) == n  # scored exactly once
        rebuilt = []
        for k, r in enumerate(ws):
            assert len(r.token_ids) == 128 == len(r.loss_mask)
            assert r.n_tokens + r.n_padding == 128
            assert r.n_ctx + r.n_loss == r.n_tokens
            real = r.token_ids[: r.n_tokens]
            mask = r.loss_mask[: r.n_tokens]
            # mask is 0^n_ctx 1^n_loss
            assert mask == [0] * r.n_ctx + [1] * r.n_loss
            # window content is the doc slice ending at end_k with
            # maximal context
            end = min(128 + k * 64, n)
            assert real == list(range(max(end - 128, 0), end))
            rebuilt += real[r.n_ctx:]
        assert rebuilt == list(range(n))  # loss spans tile the doc
    # doc 1: 300 tokens -> 1 + ceil(172/64) = 4 windows
    assert len(got[1]) == 4
    assert len(got[2]) == 1 and got[2][0].n_padding == 78
    assert len(got[3]) == 1 and got[3][0].n_loss == 128

    # stride == seq_len: disjoint loss spans; full windows are
    # all-loss, the short TAIL still gets maximal left context
    # (tokens 172..255 re-appear masked 0 — the HF convention)
    dj = rolling_eval_windows(
        df.filter("doc_id = 1"), seq_len=128, stride=128
    ).orderBy("seq_id").collect()
    assert [r.n_loss for r in dj] == [128, 128, 44]
    assert [r.n_ctx for r in dj] == [0, 0, 84]

    with _pytest.raises(ValueError, match="stride"):
        rolling_eval_windows(df, seq_len=128, stride=0)
    with _pytest.raises(ValueError, match="stride"):
        rolling_eval_windows(df, seq_len=128, stride=200)
    with _pytest.raises(ValueError, match="seq_len"):
        rolling_eval_windows(df, seq_len=0)


# ---- length-bucketed batching --------------------------------------


def _len_df(spark, lens):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(lens)],
        "doc_id long, n_tokens long",
    )


def test_length_buckets_power_of_two_and_min_bucket(spark):
    from polaroam_spark.operators.chunking import (
        length_bucketed_batches,
    )

    df = _len_df(spark, [1, 5, 16, 17, 100, 1024, 1025])
    got = {
        r.doc_id: r.padded_len
        for r in length_bucketed_batches(
            df, batch_tokens=4096, min_bucket=16
        ).collect()
    }
    assert got == {
        0: 16,   # floored at min_bucket
        1: 16,
        2: 16,   # exact power stays
        3: 32,
        4: 128,
        5: 1024,
        6: 2048,
    }


def test_length_buckets_batch_capacity_and_determinism(spark):
    from polaroam_spark.operators.chunking import (
        length_bucketed_batches,
    )

    lens = [30, 31, 33, 60, 64, 65, 100, 120, 500, 5000]
    df = _len_df(spark, lens)
    plan = length_bucketed_batches(
        df, batch_tokens=128, min_bucket=16
    ).collect()
    by_batch = {}
    for r in plan:
        by_batch.setdefault(r.batch_id, []).append(r)
    for rows in by_batch.values():
        pls = {r.padded_len for r in rows}
        assert len(pls) == 1  # one padded_len per batch
        pl = pls.pop()
        # capacity respected unless a single row exceeds the budget
        if pl <= 128:
            assert len(rows) * pl <= 128
        else:
            assert len(rows) == 1
    # deterministic under repartitioning
    again = length_bucketed_batches(
        df.repartition(7), batch_tokens=128, min_bucket=16
    ).collect()
    assert {(r.doc_id, r.batch_id) for r in again} == {
        (r.doc_id, r.batch_id) for r in plan
    }


def test_length_buckets_sharded_parallel_plan(spark):
    from polaroam_spark.operators.chunking import (
        batch_padding_stats,
        length_bucketed_batches,
    )

    lens = [50 + (i % 37) for i in range(500)]
    df = _len_df(spark, lens)
    plan = length_bucketed_batches(
        df, batch_tokens=512, shards_per_bucket=4
    )
    stats = batch_padding_stats(plan).collect()[0]
    assert stats.n_seqs == 500
    assert stats.total_tokens == sum(lens)
    assert stats.padded_capacity >= stats.total_tokens
    # every row padded to 64 or 128 here; padding stays well under
    # the pad-to-global-max strawman
    assert stats.padding_frac < 0.5


def test_length_buckets_errors(spark):
    import pytest as _pt

    from polaroam_spark.operators.chunking import (
        length_bucketed_batches,
    )

    df = _len_df(spark, [10])
    with _pt.raises(ValueError):
        length_bucketed_batches(df, batch_tokens=0)
    with _pt.raises(ValueError):
        length_bucketed_batches(df, min_bucket=15)
    with _pt.raises(ValueError):
        length_bucketed_batches(df, shards_per_bucket=0)
    # invalid lengths fail lazily executor-side (raise_error), not
    # via an eager validation scan — the error surfaces at action
    bad = _len_df(spark, [10]).withColumn(
        "n_tokens", F.lit(None).cast("long")
    )
    with _pt.raises(Exception, match="must be >= 1 and non-null"):
        length_bucketed_batches(bad).collect()
    neg = _len_df(spark, [10]).withColumn(
        "n_tokens", F.lit(-3).cast("long")
    )
    with _pt.raises(Exception, match="got -3"):
        length_bucketed_batches(neg).collect()
    clash = df.withColumn("batch_id", F.lit(1))
    with _pt.raises(ValueError):
        length_bucketed_batches(clash)
    # the shard field is 20 bits of batch_id — a larger S would
    # silently collide into the exponent range
    with _pt.raises(ValueError, match="2\\^20"):
        length_bucketed_batches(df, shards_per_bucket=(1 << 20) + 1)
    assert (
        length_bucketed_batches(df, shards_per_bucket=1 << 20)
        is not None
    )


def test_length_buckets_local_index_overflow_guard(spark):
    # the 30-bit local-index overflow raises executor-side instead
    # of silently colliding batch_ids: with batch_tokens == one row
    # every row is its own batch, so row_number exercises the guard
    # expression; 2^30 real rows is not testable, but the guard
    # column must exist in the plan and pass for in-range input
    from polaroam_spark.operators.chunking import (
        length_bucketed_batches,
    )

    df = _len_df(spark, [16] * 5)
    plan = length_bucketed_batches(df, batch_tokens=16)
    assert "raise_error" in plan._jdf.queryExecution().analyzed().toString()
    assert plan.count() == 5


def test_batch_padding_stats_exact_small(spark):
    from polaroam_spark.operators.chunking import (
        batch_padding_stats,
        length_bucketed_batches,
    )

    # two rows of 16 and one of 32 at budget 32:
    # bucket 16 -> 2 rows/batch -> one batch cap 32, tokens 26
    # bucket 32 -> 1 row/batch  -> one batch cap 32, tokens 20
    df = _len_df(spark, [13, 13, 20])
    stats = batch_padding_stats(
        length_bucketed_batches(df, batch_tokens=32, min_bucket=16)
    ).collect()[0]
    assert stats.n_batches == 2
    assert stats.n_seqs == 3
    assert stats.total_tokens == 46
    assert stats.padded_capacity == 64
    assert stats.padding_tokens == 18
    assert abs(stats.padding_frac - 18 / 64) < 1e-9


def test_materialize_batches_pads_and_masks(spark):
    from polaroam_spark.operators.chunking import (
        length_bucketed_batches,
        materialize_batches,
    )

    df = spark.createDataFrame(
        [
            (1, [7, 8, 9]),
            (2, [1] * 16),
            (3, None),
        ],
        "doc_id long, token_ids array<int>",
    ).withColumn("n_tokens", F.coalesce(F.size("token_ids"), F.lit(1)).cast("long"))
    plan = length_bucketed_batches(df, batch_tokens=64, min_bucket=8)
    out = {r.doc_id: r for r in materialize_batches(plan).collect()}
    # doc 1: 3 tokens padded to 8
    assert list(out[1].input_ids) == [7, 8, 9, 0, 0, 0, 0, 0]
    assert list(out[1].attention_mask) == [1, 1, 1, 0, 0, 0, 0, 0]
    # doc 2: exactly 16 -> no padding
    assert list(out[2].input_ids) == [1] * 16
    assert sum(out[2].attention_mask) == 16
    # null ids stay null
    assert out[3].input_ids is None and out[3].attention_mask is None


def test_materialize_batches_rejects_mismatched_plan(spark):
    import pytest as _pt

    from polaroam_spark.operators.chunking import materialize_batches

    bad = spark.createDataFrame(
        [(1, [1, 2, 3, 4, 5], 4)],
        "doc_id long, token_ids array<int>, padded_len long",
    )
    with _pt.raises(Exception, match="longer than padded_len"):
        materialize_batches(bad).collect()


def test_materialize_batches_map_only(spark):
    from polaroam_spark.operators.chunking import materialize_batches

    df = spark.createDataFrame(
        [(1, [1, 2], 4)],
        "doc_id long, token_ids array<int>, padded_len long",
    )
    plan = materialize_batches(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
