"""End-to-end curation pipeline composition."""

import pyspark.sql.functions as F
import pytest


def test_curate_corpus_stage_composition(spark):
    from polaroam_spark.operators.curation import curate_corpus

    rows = [
        (0, "srcA", "the quick brown fox jumps over the lazy dog today"),
        (1, "srcA", "the quick brown fox jumps over the lazy dog today"),  # dup of 0
        (2, "srcA", "tiny"),                                    # < min_tokens
        (3, "srcB", "a completely different document body with many words here"),
        (4, "srcB", "another unique and long enough document body right here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept, stats = curate_corpus(
        docs, min_tokens=5, dedup="exact", cap_per_source=1
    )
    ids = sorted(r.doc_id for r in kept.collect())
    # 2 dropped (short), 1 dropped (dup of 0), srcB capped to one
    assert 2 not in ids and 1 not in ids
    assert len([i for i in ids if i in (3, 4)]) == 1
    st = {r.stage: r.n_docs for r in stats.collect()}
    assert st["input"] == 5
    assert st["min_tokens"] == 4
    assert st["dedup_exact"] == 3
    assert st["cap_per_source"] == 2
    # stage order preserved by stage_idx
    order = [r.stage for r in stats.orderBy("stage_idx").collect()]
    assert order == ["input", "min_tokens", "dedup_exact", "cap_per_source"]


def test_curate_corpus_transforms_then_filters(spark):
    from polaroam_spark.operators.curation import curate_corpus

    html = ("<html><body><p>This sentence survives the cleaning pass "
            "nicely.</p><script>drop();</script></body></html>")
    docs = spark.createDataFrame(
        [(0, "s", html), (1, "s", "<p>js</p>")],
        "doc_id long, source string, text string",
    )
    kept, stats = curate_corpus(
        docs, strip_html_first=True, min_tokens=4, dedup=None
    )
    out = kept.collect()
    assert [r.doc_id for r in out] == [0]
    assert "<" not in out[0].text and "drop()" not in out[0].text


def test_curate_corpus_validation_and_no_stats(spark):
    from polaroam_spark.operators.curation import curate_corpus

    docs = spark.createDataFrame(
        [(0, "s", "x y z")], "doc_id long, source string, text string"
    )
    with pytest.raises(ValueError, match="unknown dedup"):
        curate_corpus(docs, dedup="fuzzy")
    kept, stats = curate_corpus(docs, dedup=None, with_stats=False)
    assert stats is None and kept.count() == 1
