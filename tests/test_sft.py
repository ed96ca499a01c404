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


def test_byte_identity_fast_path_matches(convs, spark, ident):
    """The r20 numpy fast path (taken when _is_byte_identity) must
    produce byte-for-byte the ids/mask of the generic per-word
    encoder. Force the generic path with a vocab that carries one
    extra, never-hit entry — encoding is unchanged but the identity
    detector correctly refuses it."""
    from polaroam_spark.operators.sft import (
        _is_byte_identity,
        encode_chat_sft,
    )

    not_ident = {
        "vocab": {**ident["vocab"], "<unused>": 256},
        "merges": [],
    }
    assert _is_byte_identity(ident)
    assert not _is_byte_identity(not_ident)
    fast = {
        r.doc_id: r for r in encode_chat_sft(convs, ident).collect()
    }
    slow = {
        r.doc_id: r
        for r in encode_chat_sft(convs, not_ident).collect()
    }
    assert set(fast) == set(slow)
    for did in fast:
        assert (fast[did].token_ids is None) == (
            slow[did].token_ids is None
        ), did
        if fast[did].token_ids is None:
            continue
        assert list(fast[did].token_ids) == list(
            slow[did].token_ids
        ), did
        assert list(fast[did].loss_mask) == list(
            slow[did].loss_mask
        ), did
    # the NULL role/content guard holds on the fast path too
    bad = spark.createDataFrame([(9, [("user", None)])], SCHEMA)
    with pytest.raises(Exception, match="NULL role/content"):
        encode_chat_sft(bad, ident).collect()


def test_byte_identity_detector_edges(ident):
    from polaroam_spark.operators.sft import _is_byte_identity

    assert not _is_byte_identity(
        {**ident, "merges": [("a", "b")]}
    )
    assert not _is_byte_identity({**ident, "type": "unigram"})
    assert not _is_byte_identity({**ident, "special": {"<eot>": 256}})
    assert not _is_byte_identity({**ident, "rank_by_concat": True})
    assert not _is_byte_identity(
        {**ident, "pretokenizer": "whitespace"}
    )


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


def test_pack_sft_sequences_segments_and_accounting(convs, ident):
    """Packed windows: exact reconstruction of the per-shard stream,
    segment ids increment at every conversation boundary (never two
    conversations in one segment), position ids continue across the
    window cut, and loss/real-token totals equal the padded twin's."""
    from polaroam_spark.operators.sft import (
        chunk_sft_sequences,
        encode_chat_sft,
        pack_sft_sequences,
    )

    enc = encode_chat_sft(convs, ident)
    full = {
        r.doc_id: (list(r.token_ids), list(r.loss_mask))
        for r in enc.collect()
        if r.token_ids is not None
    }
    packed = pack_sft_sequences(
        enc, seq_len=16, pad_id=99, num_shards=1, drop_no_loss=False
    ).orderBy("seq_id").collect()

    # rebuild the expected stream: doc_id order within the shard
    want_ids, want_mask, want_seg, want_pos = [], [], [], []
    for seg, did in enumerate(sorted(full)):
        ids, mask = full[did]
        want_ids += ids
        want_mask += mask
        want_seg += [seg] * len(ids)
        want_pos += list(range(len(ids)))

    got_ids, got_mask, got_pos = [], [], []
    for w, r in enumerate(packed):
        assert r.shard == 0 and r.seq_id == w
        assert len(r.token_ids) == 16 == len(r.loss_mask)
        assert len(r.segment_ids) == 16 == len(r.position_ids)
        assert r.n_tokens == 16
        assert r.n_loss_tokens == sum(r.loss_mask)
        keep = 16 - r.n_padding
        # padding only on the shard's LAST window, marked seg -1
        if w < len(packed) - 1:
            assert r.n_padding == 0
        assert all(t == 99 for t in r.token_ids[keep:])
        assert all(s == -1 for s in r.segment_ids[keep:])
        assert all(m == 0 for m in r.loss_mask[keep:])
        # local segment ids start at 0 and are nondecreasing by 1
        segs = list(r.segment_ids[:keep])
        assert segs[0] == 0
        assert all(b - a in (0, 1) for a, b in zip(segs, segs[1:]))
        assert r.n_segments == segs[-1] + 1
        got_ids += list(r.token_ids[:keep])
        got_mask += list(r.loss_mask[:keep])
        got_pos += list(r.position_ids[:keep])
    assert got_ids == want_ids
    assert got_mask == want_mask
    # position ids track within-conversation offsets ACROSS cuts
    assert got_pos == want_pos
    # conversation boundaries sit exactly where position resets to 0
    for i in range(1, len(got_pos)):
        assert (got_pos[i] == 0) == (want_seg[i] != want_seg[i - 1])

    # accounting parity with the padded twin
    twin = chunk_sft_sequences(
        enc, seq_len=16, drop_no_loss=False
    ).agg(
        F.sum("n_loss_tokens").alias("loss"),
        F.sum(F.col("n_tokens") - F.col("n_padding")).alias("real"),
    ).collect()[0]
    assert sum(r.n_loss_tokens for r in packed) == twin.loss
    assert (
        sum(r.n_tokens - r.n_padding for r in packed) == twin.real
    )

    # drop_no_loss removes exactly the all-zero-mask windows
    kept = pack_sft_sequences(
        enc, seq_len=16, pad_id=99, num_shards=1
    ).collect()
    assert {r.seq_id for r in kept} == {
        r.seq_id for r in packed if r.n_loss_tokens > 0
    }
    # determinism
    again = pack_sft_sequences(
        enc, seq_len=16, pad_id=99, num_shards=1, drop_no_loss=False
    ).orderBy("seq_id").collect()
    assert [list(r.token_ids) for r in again] == [
        list(r.token_ids) for r in packed
    ]
    with pytest.raises(ValueError, match="seq_len"):
        pack_sft_sequences(enc, seq_len=0)
    with pytest.raises(Exception, match="max_shard_tokens"):
        pack_sft_sequences(
            enc, seq_len=16, num_shards=1, max_shard_tokens=10
        ).collect()


def test_encode_preference_pairs_identity(convs, spark, ident):
    """Byte-identity model: prompt_len is the rendered prompt's UTF-8
    byte count, both branches carry the identical prompt prefix, and
    the mask is 1 exactly on branch content bytes — prompt tokens are
    0 even for assistant turns inside the prompt."""
    from polaroam_spark.operators.sft import encode_preference_pairs

    rows = [
        # prompt ends with an ASSISTANT turn on purpose: DPO masks
        # the whole prompt regardless of roles
        (1, [("user", "hi"), ("assistant", "hello"),
             ("user", "more?")], "yes ✓", "no"),
        (2, [("user", "résumé 漢字?")], "oui", "non merci"),
        (3, None, "a", "b"),
    ]
    schema = (
        "doc_id long, prompt_messages array<struct<"
        "role string, content string>>, chosen string, "
        "rejected string"
    )
    df = spark.createDataFrame(rows, schema)
    out = {
        r.doc_id: r
        for r in encode_preference_pairs(df, ident).collect()
    }
    assert out[3].prompt_len is None and out[3].chosen_ids is None
    for did, prompt, chosen, rejected in rows[:2]:
        r = out[did]
        ptext = "".join(
            f"<|im_start|>{ro}\n{c}<|im_end|>\n" for ro, c in prompt
        )
        pbytes = ptext.encode("utf-8")
        assert r.prompt_len == len(pbytes)
        assert bytes(r.chosen_ids[: r.prompt_len]) == pbytes
        assert (
            r.chosen_ids[: r.prompt_len]
            == r.rejected_ids[: r.prompt_len]
        )
        assert all(m == 0 for m in r.chosen_mask[: r.prompt_len])
        for branch, ids, mask in (
            (chosen, r.chosen_ids, r.chosen_mask),
            (rejected, r.rejected_ids, r.rejected_mask),
        ):
            btext = f"<|im_start|>assistant\n{branch}<|im_end|>\n"
            assert bytes(ids) == pbytes + btext.encode("utf-8")
            h = len("<|im_start|>assistant\n".encode("utf-8"))
            c = len(branch.encode("utf-8"))
            want = (
                [0] * (r.prompt_len + h)
                + [1] * c
                + [0] * len("<|im_end|>\n".encode("utf-8"))
            )
            assert list(mask) == want, (did, branch)


def test_encode_preference_pairs_branches_and_divergence(spark):
    """Messages-array branches dispatch on column type; with a
    TRAINED BPE model the shared-prefix contract holds exactly at
    prompt_len for every mid-message divergence point — the segment
    boundary prevents branch bytes from re-tokenizing the prompt."""
    from polaroam_spark.operators.sft import encode_preference_pairs
    from polaroam_spark.operators.tokenize import train_bpe

    base = "the quick brown fox jumps over the lazy dog and runs on"
    # divergence points mid-word, mid-message, at whitespace
    pairs = []
    for i, cut in enumerate((3, 10, 17, 24, 38, len(base))):
        pairs.append(
            (
                i,
                [("user", base[:cut])],
                base[cut:] + " good",
                base[cut:] + " bad",
            )
        )
    schema = (
        "doc_id long, prompt_messages array<struct<"
        "role string, content string>>, chosen string, "
        "rejected string"
    )
    df = spark.createDataFrame(pairs, schema)
    corpus = spark.createDataFrame(
        [(0, base * 3)], "doc_id long, text string"
    )
    bpe = train_bpe(corpus, vocab_size=300)
    out = encode_preference_pairs(df, bpe).collect()
    for r in out:
        assert (
            list(r.chosen_ids[: r.prompt_len])
            == list(r.rejected_ids[: r.prompt_len])
        )
        assert list(r.chosen_ids) != list(r.rejected_ids)
        assert len(r.chosen_ids) == len(r.chosen_mask)
        assert sum(r.chosen_mask[: r.prompt_len]) == 0

    # messages-array branches: multi-turn divergence
    mt = spark.createDataFrame(
        [
            (
                1,
                [("user", "pick one")],
                [("assistant", "red"), ("user", "why?"),
                 ("assistant", "warm")],
                [("assistant", "blue")],
            )
        ],
        "doc_id long, prompt_messages array<struct<role string, "
        "content string>>, chosen array<struct<role string, "
        "content string>>, rejected array<struct<role string, "
        "content string>>",
    )
    r = encode_preference_pairs(mt, bpe).collect()[0]
    assert list(r.chosen_ids[: r.prompt_len]) == list(
        r.rejected_ids[: r.prompt_len]
    )
    # loss on BOTH assistant contents of the chosen branch,
    # not on the interleaved user turn
    assert sum(r.chosen_mask) > sum(r.rejected_mask) > 0

    # loud contracts
    with pytest.raises(TypeError, match="must be string or"):
        encode_preference_pairs(
            mt.withColumn("chosen", F.lit(3)), bpe
        )
    bad = spark.createDataFrame(
        [(9, [("user", None)], "a", "b")], schema
    )
    with pytest.raises(Exception, match="NULL role/content"):
        encode_preference_pairs(bad, bpe).collect()


def test_preference_pairs_from_candidates(spark):
    """Best-of-n mining: reward argmax/argmin per prompt with a
    deterministic candidate-string tiebreak; NULL and NaN scores
    excluded before selection; sub-2-candidate groups,
    below-margin pairs, and exact score ties dropped."""
    from polaroam_spark.operators.sft import (
        preference_pairs_from_candidates,
    )

    prompt = [("user", "pick")]
    rows = [
        # group 1: clear ordering
        (1, prompt, "alpha", 2.0),
        (1, prompt, "beta", 5.0),
        (1, prompt, "gamma", 1.0),
        # group 2: score TIE at the top -> candidate-string tiebreak
        (2, prompt, "aaa", 3.0),
        (2, prompt, "zzz", 3.0),
        (2, prompt, "mmm", 0.5),
        # group 3: NaN and NULL scores never win (or count)
        (3, prompt, "nan-cand", float("nan")),
        (3, prompt, "null-cand", None),
        (3, prompt, "ok1", 1.0),
        (3, prompt, "ok2", 0.0),
        # group 4: single usable candidate -> dropped
        (4, prompt, "only", 9.0),
        # group 5: all scores equal -> dropped at ANY margin (a
        # tied pair's direction would be pure lexicographic noise)
        (5, prompt, "same1", 1.0),
        (5, prompt, "same2", 1.0),
    ]
    df = spark.createDataFrame(
        rows,
        "prompt_id long, prompt_messages array<struct<role string, "
        "content string>>, candidate string, score double",
    )
    out = {
        r.prompt_id: r
        for r in preference_pairs_from_candidates(df).collect()
    }
    assert set(out) == {1, 2, 3}
    assert (out[1].chosen, out[1].rejected) == ("beta", "gamma")
    assert (out[1].chosen_score, out[1].rejected_score) == (5.0, 1.0)
    assert out[1].n_candidates == 3
    # tie at 3.0: larger candidate string wins chosen; rejected is
    # the genuinely-lowest score
    assert (out[2].chosen, out[2].rejected) == ("zzz", "mmm")
    assert (out[3].chosen, out[3].rejected) == ("ok1", "ok2")
    assert out[3].n_candidates == 2
    strict = {
        r.prompt_id
        for r in preference_pairs_from_candidates(
            df, margin=0.5
        ).collect()
    }
    assert strict == {1, 2, 3}


def test_sft_from_best_of_n(spark, ident):
    """Best-of-n SFT: the argmax candidate becomes the assistant
    turn appended to the prompt; single-candidate groups are KEPT
    (best-of-1 is still a training example); composes with
    encode_chat_sft."""
    from polaroam_spark.operators.sft import (
        encode_chat_sft,
        sft_from_best_of_n,
    )

    prompt = [("user", "say hi")]
    rows = [
        (1, prompt, "hello", 1.0),
        (1, prompt, "HELLO!", 7.0),
        (2, prompt, "lonely", 0.0),
    ]
    df = spark.createDataFrame(
        rows,
        "prompt_id long, prompt_messages array<struct<role string, "
        "content string>>, candidate string, score double",
    )
    out = {
        r.prompt_id: r.messages
        for r in sft_from_best_of_n(df).collect()
    }
    assert [tuple(m) for m in out[1]] == [
        ("user", "say hi"),
        ("assistant", "HELLO!"),
    ]
    assert [tuple(m) for m in out[2]] == [
        ("user", "say hi"),
        ("assistant", "lonely"),
    ]
    enc = encode_chat_sft(
        sft_from_best_of_n(df), ident, messages_col="messages"
    ).collect()
    for r in enc:
        assert sum(r.loss_mask) == len(
            {1: "HELLO!", 2: "lonely"}[r.prompt_id].encode()
        )


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


def _fs_hash(item_id, ex_id, seed=17):
    """Python replay of portable_hash64(item_id || '|' || ex_id)."""
    import hashlib

    payload = f"{seed}:{item_id}|{ex_id}".encode()
    return int(hashlib.md5(payload).hexdigest()[:15], 16)


def test_build_fewshot_prompts_draw_and_layout(spark):
    """The k-shot draw is a pure hash function of (ids, seed) —
    replayed row for row in python — the item never draws itself,
    the prompt is the exact exemplar-input+target+delimiter fold in
    draw order followed by the item's input, and a short pool
    yields n_shots < k rather than an error."""
    from polaroam_spark.operators.sft import build_fewshot_prompts

    rows = [(i, f"Q{i}?", f" A{i}") for i in range(10)]
    items = spark.createDataFrame(
        rows, "item_id long, input string, target string"
    )
    out = {
        r.item_id: r
        for r in build_fewshot_prompts(items, k=3, seed=17).collect()
    }
    for iid, q, a in rows:
        want = sorted(
            (j for j in range(10) if j != iid),
            key=lambda j: (_fs_hash(iid, j), j),
        )[:3]
        r = out[iid]
        assert list(r.exemplar_ids) == want, (iid, r.exemplar_ids)
        assert iid not in r.exemplar_ids
        assert r.n_shots == 3
        shots = "".join(f"Q{j}? A{j}\n\n" for j in want)
        assert r.prompt_text == shots + q
        assert r.continuation_text == a

    # a different seed reshuffles at least one deck
    out2 = {
        r.item_id: list(r.exemplar_ids)
        for r in build_fewshot_prompts(items, k=3, seed=99).collect()
    }
    assert any(out2[i] != list(out[i].exemplar_ids) for i in out2)

    # pool smaller than k: all eligible exemplars, no error
    small = spark.createDataFrame(
        rows[:2], "item_id long, input string, target string"
    )
    got = build_fewshot_prompts(small, k=5).collect()
    for r in got:
        assert r.n_shots == 1  # pool of 2, self excluded

    import pytest

    with pytest.raises(ValueError, match="k must be"):
        build_fewshot_prompts(items, k=0)
    with pytest.raises(ValueError, match="max_exemplars"):
        build_fewshot_prompts(items, k=2, max_exemplars=5)


def test_build_fewshot_prompts_leakage_safe(spark):
    """With a near-dup pairs frame, an item never draws any member
    of its own duplicate COMPONENT (transitive closure), in either
    direction of the pair."""
    from polaroam_spark.operators.sft import build_fewshot_prompts

    rows = [(i, f"Q{i}?", f" A{i}") for i in range(8)]
    items = spark.createDataFrame(
        rows, "item_id long, input string, target string"
    )
    # component {0, 1, 2} via a transitive chain, plus {5, 6}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a long, id_b long"
    )
    comp = {0: {0, 1, 2}, 1: {0, 1, 2}, 2: {0, 1, 2},
            5: {5, 6}, 6: {5, 6}}
    out = build_fewshot_prompts(
        items, k=7, seed=17, pairs=pairs
    ).collect()
    for r in out:
        banned = comp.get(r.item_id, {r.item_id})
        assert not (set(r.exemplar_ids) & banned), (
            r.item_id, r.exemplar_ids,
        )
        assert r.n_shots == 8 - len(banned)


def test_encode_eval_prompts_identity(spark, ident):
    """Byte-identity model: token_ids == prompt+continuation UTF-8
    bytes, loss mask 1 exactly on the continuation span; NULL
    prompt or continuation yields NULL ids/mask."""
    from polaroam_spark.operators.sft import encode_eval_prompts

    df = spark.createDataFrame(
        [
            (1, "ctx: Q?", " yes"),
            (2, "unicode ✓", " 漢"),
            (3, None, " x"),
        ],
        "item_id long, prompt_text string, continuation_text string",
    )
    out = {r.item_id: r for r in encode_eval_prompts(df, ident).collect()}
    for iid, p, c in [(1, "ctx: Q?", " yes"), (2, "unicode ✓", " 漢")]:
        r = out[iid]
        pb, cb = len(p.encode()), len(c.encode())
        assert len(r.token_ids) == pb + cb
        assert r.loss_mask == [0] * pb + [1] * cb
    assert out[3].token_ids is None and out[3].loss_mask is None


# ---- KTO unary examples ----------------------------------------------


def _ident_model():
    from polaroam_spark.operators.tokenize import _BYTE_TO_UNI

    return {"vocab": {u: b for b, u in _BYTE_TO_UNI.items()}, "merges": []}


def test_kto_examples_match_dpo_branches(spark):
    from polaroam_spark.operators.sft import (
        encode_kto_examples,
        encode_preference_pairs,
    )

    pairs = spark.createDataFrame(
        [
            (
                1,
                [("user", "pick a color")],
                "blue is nice",
                "no",
            ),
        ],
        "doc_id long, prompt_messages array<struct<role string, content string>>, "
        "chosen string, rejected string",
    )
    model = _ident_model()
    dpo = encode_preference_pairs(pairs, model).collect()[0]
    kto = {
        r.desirable: r
        for r in encode_kto_examples(pairs, model).collect()
    }
    assert len(kto) == 2
    assert list(kto[True].input_ids) == list(dpo.chosen_ids)
    assert list(kto[True].loss_mask) == list(dpo.chosen_mask)
    assert list(kto[False].input_ids) == list(dpo.rejected_ids)
    assert list(kto[False].loss_mask) == list(dpo.rejected_mask)
    assert kto[True].prompt_len == dpo.prompt_len
    assert kto[False].doc_id == 1


def test_kto_null_branch_kept_with_flag(spark):
    from polaroam_spark.operators.sft import encode_kto_examples

    pairs = spark.createDataFrame(
        [(1, None, "yes", "no")],
        "doc_id long, prompt_messages array<struct<role string, content string>>, "
        "chosen string, rejected string",
    )
    rows = encode_kto_examples(pairs, _ident_model()).collect()
    assert len(rows) == 2
    assert {r.desirable for r in rows} == {True, False}
    assert all(r.input_ids is None for r in rows)


def test_kto_prompt_mask_zero_loss_on_completion(spark):
    from polaroam_spark.operators.sft import encode_kto_examples

    pairs = spark.createDataFrame(
        [(1, [("user", "hi")], "yes!", "nah")],
        "doc_id long, prompt_messages array<struct<role string, content string>>, "
        "chosen string, rejected string",
    )
    for r in encode_kto_examples(pairs, _ident_model()).collect():
        mask = list(r.loss_mask)
        assert all(m == 0 for m in mask[: r.prompt_len])
        assert sum(mask) == (4 if r.desirable else 3)  # utf-8 bytes


# ---- multiple-choice eval deck ---------------------------------------


def test_eval_choices_prefix_identity_and_mask(spark):
    """Per (item, choice) rows: the first prompt_len ids are
    IDENTICAL across an item's rows by construction (the prompt is
    encoded once), even under a TRAINED model whose merges could
    cross a prompt/choice boundary on re-encode; loss mask 1 exactly
    on the choice; n_choice_bytes is the acc_norm currency."""
    from polaroam_spark.operators.sft import encode_eval_choices
    from polaroam_spark.operators.tokenize import train_bpe

    corpus = spark.createDataFrame(
        [(i, "the quick brown fox answer maybe yes no " * 3)
         for i in range(4)],
        "doc_id long, text string",
    )
    model = train_bpe(corpus, vocab_size=280)
    df = spark.createDataFrame(
        [
            (1, "Q: sky color? A:", [" blue", " green", " 漢字"], 0),
            (2, "Q: 2+2? A:", [" four", " five"], 0),
        ],
        "item_id long, prompt_text string, choices array<string>, "
        "answer int",
    )
    rows = encode_eval_choices(df, model, answer_col="answer").collect()
    by_item = {}
    for r in rows:
        by_item.setdefault(r.item_id, []).append(r)
    assert len(by_item[1]) == 3 and len(by_item[2]) == 2
    for iid, rs in by_item.items():
        plens = {r.prompt_len for r in rs}
        assert len(plens) == 1
        plen = plens.pop()
        prefixes = {tuple(r.token_ids[:plen]) for r in rs}
        assert len(prefixes) == 1
        for r in rs:
            assert all(m == 0 for m in r.loss_mask[:plen])
            assert all(m == 1 for m in r.loss_mask[plen:])
            assert len(r.token_ids) == len(r.loss_mask)
            assert r.n_choice_bytes == len(r.choice_text.encode())
            assert r.is_gold == (r.choice_index == 0)
            choices = [" blue", " green", " 漢字"] if iid == 1 else [
                " four", " five"]
            assert r.choice_text == choices[r.choice_index]


def test_eval_choices_identity_bytes(spark, ident):
    """Byte-identity model: n ids == prompt+choice UTF-8 bytes."""
    from polaroam_spark.operators.sft import encode_eval_choices

    df = spark.createDataFrame(
        [(1, "p✓", [" a", " bb"])],
        "item_id long, prompt_text string, choices array<string>",
    )
    rows = encode_eval_choices(df, ident).collect()
    pb = len("p✓".encode())
    for r in rows:
        assert r.prompt_len == pb
        assert len(r.token_ids) == pb + len(
            r.choice_text.encode()
        )


def test_eval_choices_null_semantics_and_guards(spark, ident):
    import pytest as _pt

    from polaroam_spark.operators.sft import encode_eval_choices

    df = spark.createDataFrame(
        [
            (1, None, [" a"]),          # NULL prompt
            (2, "p", None),             # NULL choices
            (3, "p", []),               # empty choices
            (4, "p", [" a", None]),     # NULL element keeps its row
        ],
        "item_id long, prompt_text string, choices array<string>",
    )
    rows = encode_eval_choices(df, ident).collect()
    by_item = {}
    for r in rows:
        by_item.setdefault(r.item_id, []).append(r)
    for iid in (1, 2, 3):
        (r,) = by_item[iid]
        assert r.choice_index is None and r.token_ids is None
    assert len(by_item[4]) == 2
    null_el = next(r for r in by_item[4] if r.choice_index == 1)
    assert null_el.token_ids is None and null_el.choice_text is None
    ok = next(r for r in by_item[4] if r.choice_index == 0)
    assert ok.token_ids is not None
    clash = df.withColumn("prompt_len", F.lit(1))
    with _pt.raises(ValueError, match="reserves"):
        encode_eval_choices(clash, ident)


# ---- GRPO grouped-rollout advantages ---------------------------------


def test_grpo_advantages_normalization(spark):
    import math

    from polaroam_spark.operators.sft import grpo_advantages

    rows = [
        ("p1", "a", 1.0),
        ("p1", "b", 2.0),
        ("p1", "c", 3.0),
        ("p2", "x", 10.0),
        ("p2", "y", 20.0),
    ]
    df = spark.createDataFrame(
        rows, "prompt_id string, candidate string, score double"
    )
    out = {
        (r.prompt_id, r.candidate): r
        for r in grpo_advantages(df).collect()
    }
    assert len(out) == 5
    # p1: mean 2, sample std 1 -> advantages -1, 0, 1
    assert abs(out[("p1", "a")].advantage + 1.0) < 1e-12
    assert abs(out[("p1", "b")].advantage) < 1e-12
    assert abs(out[("p1", "c")].advantage - 1.0) < 1e-12
    assert out[("p1", "a")].n_rollouts == 3
    assert abs(out[("p1", "a")].group_score_mean - 2.0) < 1e-12
    assert abs(out[("p1", "a")].group_score_std - 1.0) < 1e-12
    # p2: mean 15, sample std sqrt(50)
    sd = math.sqrt(50.0)
    assert abs(out[("p2", "x")].advantage + 5.0 / sd) < 1e-12
    # payload columns ride through
    assert out[("p2", "y")].candidate == "y"


def test_grpo_advantages_degenerate_groups(spark):
    import pytest as _pt

    from polaroam_spark.operators.sft import grpo_advantages

    rows = [
        ("solo", "only", 1.0),          # sub-2 group -> dropped
        ("tied", "a", 0.5),             # zero std -> NULL advantage
        ("tied", "b", 0.5),
        ("nan", "a", float("nan")),     # NaN excluded from stats
        ("nan", "b", 1.0),
        ("nan", "c", 3.0),
        ("nullish", "a", None),         # NULL excluded; leaves 1 ->
        ("nullish", "b", 2.0),          # group drops below floor
    ]
    df = spark.createDataFrame(
        rows, "prompt_id string, candidate string, score double"
    )
    out = grpo_advantages(df).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.prompt_id, []).append(r)
    assert "solo" not in by_group and "nullish" not in by_group
    tied = by_group["tied"]
    assert len(tied) == 2
    assert all(r.advantage is None for r in tied)
    assert all(r.group_score_std == 0.0 for r in tied)
    # NaN row gone; stats over the 2 usable rollouts only
    nan_g = by_group["nan"]
    assert len(nan_g) == 2
    assert all(r.n_rollouts == 2 for r in nan_g)
    assert all(
        abs(r.group_score_mean - 2.0) < 1e-12 for r in nan_g
    )
    with _pt.raises(ValueError, match="min_rollouts"):
        grpo_advantages(df, min_rollouts=1)
    clash = df.withColumn("advantage", F.lit(0.0))
    with _pt.raises(ValueError, match="reserves"):
        grpo_advantages(clash)


def test_grpo_advantages_single_shuffle_plan(spark):
    """One hash exchange on the prompt id — the stats evaluate as
    window aggregates over the (k-bounded) rollout group, no second
    shuffle to join them back."""
    from polaroam_spark.operators.sft import grpo_advantages

    df = spark.createDataFrame(
        [("p", "a", 1.0), ("p", "b", 2.0)],
        "prompt_id string, candidate string, score double",
    )
    plan = (
        grpo_advantages(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_score_eval_choices_acc_and_acc_norm(spark):
    from polaroam_spark.operators.sft import score_eval_choices

    rows = [
        # item 1: raw ll picks choice 1 (wrong), norm picks 0 (gold)
        (1, 0, True, -10.0, 2),    # ll/b = -5
        (1, 1, False, -9.0, 1),    # ll/b = -9
        (1, 2, False, -30.0, 3),
        # item 2: tie on ll -> smallest index wins
        (2, 0, False, -4.0, 4),
        (2, 1, True, -4.0, 4),
        # item 3: NULL ll excluded; only choice 1 scored
        (3, 0, True, None, 2),
        (3, 1, False, -1.0, 2),
        # item 4: nothing scored -> NULL prediction, row kept
        (4, 0, True, None, 2),
        (4, 1, False, float("nan"), 2),
    ]
    df = spark.createDataFrame(
        rows,
        "item_id long, choice_index int, is_gold boolean, "
        "loglikelihood double, n_choice_bytes int",
    )
    out = {r.item_id: r for r in score_eval_choices(df).collect()}
    assert len(out) == 4
    r1 = out[1]
    assert r1.pred_choice == 1 and r1.correct is False
    assert r1.pred_choice_norm == 0 and r1.correct_norm is True
    assert r1.n_choices == 3 and r1.n_scored == 3
    r2 = out[2]
    assert r2.pred_choice == 0 and r2.correct is False
    r3 = out[3]
    assert r3.pred_choice == 1 and r3.correct is False
    assert r3.n_scored == 1
    r4 = out[4]
    assert r4.pred_choice is None and r4.correct is None
    assert r4.n_scored == 0
    # task accuracy is one avg over the output
    import pyspark.sql.functions as F

    acc = (
        score_eval_choices(df)
        .agg(F.avg(F.col("correct").cast("int")))
        .collect()[0][0]
    )
    # items 1/2/3 predicted (all wrong on raw ll), item 4 NULL-skipped
    assert abs(acc - 0.0) < 1e-12
    accn = (
        score_eval_choices(df)
        .agg(F.avg(F.col("correct_norm").cast("int")))
        .collect()[0][0]
    )
    assert abs(accn - (1.0 / 3.0)) < 1e-12  # only item 1 norm-correct


def test_score_eval_choices_zero_byte_norm_guard(spark):
    from polaroam_spark.operators.sft import score_eval_choices

    df = spark.createDataFrame(
        [
            (1, 0, True, -1.0, 0),   # zero bytes: out of NORM argmax
            (1, 1, False, -2.0, 2),
        ],
        "item_id long, choice_index int, is_gold boolean, "
        "loglikelihood double, n_choice_bytes int",
    )
    r = score_eval_choices(df).collect()[0]
    assert r.pred_choice == 0          # raw argmax unaffected
    assert r.pred_choice_norm == 1     # zero-byte row excluded


def test_grpo_advantages_normalization_invariants(spark):
    """Property over random-ish groups: within every surviving
    group with positive spread, the advantages have mean exactly 0
    and SAMPLE std exactly 1 (the definition, closed under the
    group's own statistics) — checked driver-side over the operator
    output rather than re-derived."""
    import math

    from polaroam_spark.operators.sft import grpo_advantages

    rows = []
    for g in range(12):
        k = 2 + (g * 7) % 9
        for j in range(k):
            # deterministic pseudo-random scores, some ties
            rows.append(
                (g, f"c{j}", float(((g * 31 + j * 17) % 23) / 7.0))
            )
    df = spark.createDataFrame(
        rows, "prompt_id long, candidate string, score double"
    )
    out = grpo_advantages(df).collect()
    groups = {}
    for r in out:
        groups.setdefault(r.prompt_id, []).append(r)
    assert groups  # at least some groups survive
    for g, rs in groups.items():
        advs = [r.advantage for r in rs]
        if any(a is None for a in advs):
            # zero-spread group: every advantage NULL, std 0
            assert all(a is None for a in advs)
            assert all(r.group_score_std == 0.0 for r in rs)
            continue
        n = len(advs)
        mean = sum(advs) / n
        var = sum((a - mean) ** 2 for a in advs) / (n - 1)
        assert abs(mean) < 1e-9, (g, advs)
        assert abs(math.sqrt(var) - 1.0) < 1e-9, (g, advs)


def test_shuffle_eval_choices_permutation_and_gold_tracking(spark):
    from polaroam_spark.operators.sft import shuffle_eval_choices

    rows = [
        (i, [f"i{i}a", f"i{i}b", f"i{i}c", f"i{i}d"], i % 4)
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "item_id long, choices array<string>, answer int"
    )
    out = {r.item_id: r for r in shuffle_eval_choices(df).collect()}
    perms = set()
    for i, (iid, choices, ans) in enumerate(rows):
        r = out[iid]
        # multiset preserved, gold tracked to its new position
        assert sorted(r.choices) == sorted(choices)
        assert r.choices[r.answer] == choices[ans]
        perms.add(tuple(r.choices[j][-1] for j in range(4)))
    # permutations are independent across items: with 30 items over
    # 24 possible orders, more than one order must appear
    assert len(perms) > 1
    # deterministic across invocations
    again = {
        r.item_id: list(r.choices)
        for r in shuffle_eval_choices(df).collect()
    }
    assert again == {k: list(v.choices) for k, v in out.items()}
    # a different seed permutes differently somewhere
    other = {
        r.item_id: list(r.choices)
        for r in shuffle_eval_choices(df, seed=99).collect()
    }
    assert other != again


def test_shuffle_eval_choices_nulls_and_range_guard(spark):
    import pytest as _pt

    from polaroam_spark.operators.sft import shuffle_eval_choices

    df = spark.createDataFrame(
        [
            (1, None, 0),
            (2, ["a", "b"], None),
            (3, [], None),
        ],
        "item_id long, choices array<string>, answer int",
    )
    out = {r.item_id: r for r in shuffle_eval_choices(df).collect()}
    assert out[1].choices is None and out[1].answer is None
    assert sorted(out[2].choices) == ["a", "b"]
    assert out[2].answer is None
    assert list(out[3].choices) == []
    bad = spark.createDataFrame(
        [(9, ["a", "b"], 5)],
        "item_id long, choices array<string>, answer int",
    )
    with _pt.raises(Exception, match="out of range"):
        shuffle_eval_choices(bad).collect()


def test_shuffle_then_encode_then_score_roundtrip(spark, ident):
    """The full deck pipeline: shuffle -> encode -> score with an
    always-right oracle ll must give accuracy 1.0 — gold tracking
    survives the composition."""
    from pyspark.sql import functions as F

    from polaroam_spark.operators.sft import (
        encode_eval_choices,
        score_eval_choices,
        shuffle_eval_choices,
    )

    df = spark.createDataFrame(
        [(i, f"q{i}:", [" aa", " bbbb", " c"], i % 3) for i in range(9)],
        "item_id long, prompt_text string, choices array<string>, "
        "answer int",
    )
    deck = encode_eval_choices(
        shuffle_eval_choices(df), ident, answer_col="answer"
    )
    # an oracle that always scores the gold row highest
    scored = deck.withColumn(
        "loglikelihood",
        F.when(F.col("is_gold"), -1.0).otherwise(-2.0),
    )
    res = score_eval_choices(scored).collect()
    assert len(res) == 9
    assert all(r.correct for r in res)


def test_eval_choices_out_of_range_gold_raises(spark, ident):
    """The shuffle_eval_choices rule applied at encode time: a gold
    index outside the real choices array raises executor-side
    instead of silently marking every row non-gold (which would
    deflate accuracy with no error); NULL answer stays NULL."""
    import pytest as _pt

    from polaroam_spark.operators.sft import encode_eval_choices

    bad = spark.createDataFrame(
        [(1, "p", [" a", " b"], 2)],
        "item_id long, prompt_text string, choices array<string>, "
        "answer int",
    )
    with _pt.raises(Exception, match="out of range"):
        encode_eval_choices(bad, ident, answer_col="answer").collect()
    ok = spark.createDataFrame(
        [(1, "p", [" a", " b"], None), (2, None, [" a"], 0)],
        "item_id long, prompt_text string, choices array<string>, "
        "answer int",
    )
    rows = encode_eval_choices(
        ok, ident, answer_col="answer"
    ).collect()
    assert all(r.is_gold is None for r in rows)
