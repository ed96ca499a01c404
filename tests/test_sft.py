"""SFT/chat data prep: template rendering (pure Column), per-message
encoding with loss masks, padded training windows."""
import pytest

from pyspark.sql import functions as F


ROWS = [
    (1, [("system", "be helpful"), ("user", "hi there"),
         ("assistant", "hello! how can I help?")]),
    (2, [("user", "résumé 漢字?"), ("assistant", "oui ✓")]),
    (3, [("user", "no reply yet")]),
    (4, None),
]
SCHEMA = (
    "doc_id long, messages array<struct<role string, content string>>"
)


@pytest.fixture(scope="module")
def convs(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


@pytest.fixture(scope="module")
def ident():
    from polaroam_spark.operators.tokenize import _BYTE_TO_UNI

    return {
        "vocab": {u: b for b, u in _BYTE_TO_UNI.items()},
        "merges": [],
    }


def test_render_chat_template(convs):
    from polaroam_spark.operators.sft import render_chat_template

    out = {
        r.doc_id: r.text
        for r in render_chat_template(convs).collect()
    }
    assert out[1] == (
        "<|im_start|>system\nbe helpful<|im_end|>\n"
        "<|im_start|>user\nhi there<|im_end|>\n"
        "<|im_start|>assistant\nhello! how can I help?<|im_end|>\n"
    )
    assert out[4] is None
    plain = {
        r.doc_id: r.text
        for r in render_chat_template(
            convs, template="plain"
        ).collect()
    }
    assert plain[3] == "user: no reply yet\n"
    with pytest.raises(ValueError, match="template"):
        render_chat_template(convs, template="alpaca")


def test_encode_chat_sft_identity_bytes_and_mask(convs, ident):
    """With the byte-identity model, ids == the rendered text's
    UTF-8 bytes and the mask is 1 exactly on assistant-content
    bytes — position-verified, not just counted."""
    from polaroam_spark.operators.sft import (
        encode_chat_sft,
        render_chat_template,
    )

    rendered = {
        r.doc_id: r.text
        for r in render_chat_template(convs).collect()
    }
    enc = {
        r.doc_id: r
        for r in encode_chat_sft(convs, ident).collect()
    }
    assert enc[4].token_ids is None and enc[4].loss_mask is None
    for did in (1, 2, 3):
        r = enc[did]
        assert bytes(r.token_ids) == rendered[did].encode("utf-8")
        assert len(r.loss_mask) == len(r.token_ids)
        # rebuild the expected mask from the message structure
        want = []
        for role, content in ROWS[did - 1][1]:
            h = f"<|im_start|>{role}\n".encode("utf-8")
            c = content.encode("utf-8")
            f_ = "<|im_end|>\n".encode("utf-8")
            want += [0] * len(h)
            want += [1 if role == "assistant" else 0] * len(c)
            want += [0] * len(f_)
        assert list(r.loss_mask) == want, did
    assert sum(enc[3].loss_mask) == 0  # no assistant turn


def test_encode_chat_sft_trained_models_and_errors(convs, spark):
    """Both tokenizer families dispatch; NULL role/content raises
    loudly instead of shifting spans."""
    from polaroam_spark.operators.sft import (
        encode_chat_sft,
        render_chat_template,
    )
    from polaroam_spark.operators.tokenize import train_bpe
    from polaroam_spark.operators.unigram import train_unigram

    texts = render_chat_template(convs).select(
        F.col("doc_id"), F.col("text")
    ).filter(F.col("text").isNotNull())
    bpe = train_bpe(texts, vocab_size=300)
    uni = train_unigram(texts, vocab_size=256 + 60)
    for model in (bpe, uni):
        out = encode_chat_sft(convs, model).collect()
        for r in out:
            if r.token_ids is None:
                continue
            assert len(r.token_ids) == len(r.loss_mask)
            assert all(m in (0, 1) for m in r.loss_mask)
    bad = spark.createDataFrame(
        [(9, [("user", None)])], SCHEMA
    )
    with pytest.raises(Exception, match="NULL role/content"):
        encode_chat_sft(bad, bpe).collect()


def test_chunk_sft_sequences(convs, ident):
    """Padded windows: every row exactly seq_len, padding masked 0,
    stripping padding and concatenating reproduces the original ids,
    all-zero-loss windows drop by default."""
    from polaroam_spark.operators.sft import (
        chunk_sft_sequences,
        encode_chat_sft,
    )

    enc = encode_chat_sft(convs, ident)
    full = {
        r.doc_id: (list(r.token_ids), list(r.loss_mask))
        for r in enc.collect()
        if r.token_ids is not None
    }
    ch = chunk_sft_sequences(
        enc, seq_len=16, pad_id=99, drop_no_loss=False
    )
    rows = ch.orderBy("doc_id", "seq_id").collect()
    seen: dict = {}
    for r in rows:
        assert len(r.token_ids) == 16 == len(r.loss_mask)
        assert r.n_loss_tokens == sum(r.loss_mask)
        assert r.n_padding == sum(
            1 for t in r.token_ids[16 - r.n_padding:] if t == 99
        )
        ids, mask = seen.setdefault(r.doc_id, ([], []))
        keep = 16 - r.n_padding
        ids.extend(r.token_ids[:keep])
        mask.extend(r.loss_mask[:keep])
    assert seen == full
    # default drops loss-free windows: doc 3 (no assistant) vanishes
    kept = {
        r.doc_id
        for r in chunk_sft_sequences(enc, seq_len=16).collect()
    }
    assert 3 not in kept and 1 in kept and 2 in kept
    with pytest.raises(ValueError, match="seq_len"):
        chunk_sft_sequences(enc, seq_len=0)


def test_chat_message_expectations(spark):
    """The pre-encode validation rules catch exactly the shapes the
    encoder raises on (or silently wastes): null turns, unknown
    roles, missing assistant, mid-dialogue system."""
    from polaroam_spark.operators.sft import chat_message_expectations
    from polaroam_spark.operators.validation import (
        validate_expectations,
    )

    rows = [
        (1, [("system", "s"), ("user", "u"), ("assistant", "a")]),
        (2, [("user", None)]),                      # null content
        (3, [("narrator", "x"), ("assistant", "a")]),  # unknown role
        (4, [("user", "u")]),                       # no assistant
        (5, [("user", "u"), ("system", "late"),
             ("assistant", "a")]),                  # system not first
        (6, None),                                  # missing array
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    rep = {
        r.rule: r.n_fail
        for r in validate_expectations(
            df, chat_message_expectations()
        ).collect()
    }
    assert rep["messages_present"] == 1       # row 6
    assert rep["no_null_turns"] >= 2          # rows 2 and 6 (NULL)
    assert rep["known_roles"] >= 1            # row 3
    assert rep["has_assistant_turn"] >= 2     # rows 2, 4, 6
    assert rep["system_first_if_any"] >= 1    # row 5
    # the clean row passes every rule
    clean = spark.createDataFrame([rows[0]], SCHEMA)
    rep_clean = {
        r.rule: r.n_fail
        for r in validate_expectations(
            clean, chat_message_expectations()
        ).collect()
    }
    assert all(v == 0 for v in rep_clean.values())
