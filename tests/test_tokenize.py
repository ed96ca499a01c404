"""Real byte-level BPE (operators/tokenize.py): training over the
distributed word histogram, exact encode/count/decode, GPT-2-format
file roundtrip, and a differential against an independent
merge-application strategy."""

import json

import pytest

import pyspark.sql.functions as F

from polaroam_spark.operators.tokenize import (
    _BYTE_TO_UNI,
    _PRETOKEN_RE,
    _UNI_TO_BYTE,
    bpe_decode,
    bpe_encode,
    bpe_token_count,
    decode_ids,
    encode_text,
    load_bpe,
    pretokenize,
    save_bpe,
    train_bpe,
)

TRICKY = [
    "Hello, world!  How's it going?",
    "we're they'll I'd you've can't",
    "café naïve Zürich — em-dash…",
    "tabs\tand\nnewlines  trailing ",
    "numbers 123 and mixed a1b2",
    "日本語のテキスト and emoji 🙂🙃",
    "",
    "   ",
]


def test_byte_unicode_bijection():
    assert len(_BYTE_TO_UNI) == 256
    assert len(set(_BYTE_TO_UNI.values())) == 256
    # printables map to themselves; others are >= U+0100
    assert _BYTE_TO_UNI[ord("A")] == "A"
    assert ord(_BYTE_TO_UNI[ord(" ")]) >= 256
    assert ord(_BYTE_TO_UNI[0]) >= 256
    for b, u in _BYTE_TO_UNI.items():
        assert _UNI_TO_BYTE[u] == b


def test_pretokenize_exact_partition():
    for t in TRICKY:
        assert "".join(pretokenize(t)) == t
    # contractions split, leading spaces attach to the next word
    assert pretokenize("we're ok") == ["we", "'re", " ok"]
    assert pretokenize("a  b") == ["a", " ", " b"]


def _reference_encode(model, text):
    """Independent strategy: merge ONE occurrence at a time — the
    leftmost occurrence of the globally lowest-rank pair — instead of
    the production one-pass-per-selected-pair loop. On any model
    whose merges were learned in order (a pair's rank exceeds the
    ranks that created its symbols) the two strategies agree."""
    ranks = {p: r for r, p in enumerate(model["merges"])}
    vocab = model["vocab"]
    out = []
    for word in _PRETOKEN_RE.findall(text):
        syms = [_BYTE_TO_UNI[b] for b in word.encode("utf-8")]
        while len(syms) > 1:
            cands = [
                (ranks[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in ranks
            ]
            if not cands:
                break
            _, i = min(cands)
            syms[i: i + 2] = [syms[i] + syms[i + 1]]
        out.extend(vocab[s] for s in syms)
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, t) for i, t in enumerate(TRICKY * 3)] + [
        (100 + i, f"the quick brown fox {i} jumps over the lazy dog")
        for i in range(30)
    ] + [(200, None)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def model(corpus):
    return train_bpe(corpus, "text", vocab_size=300)


def test_train_learns_merges_and_is_deterministic(corpus, model):
    assert len(model["merges"]) == 44  # 300 - 256
    assert len(model["vocab"]) == 300
    again = train_bpe(corpus, "text", vocab_size=300)
    assert again["merges"] == model["merges"]
    # ids: base bytes 0..255, merges 256+rank
    for rank, (a, b) in enumerate(model["merges"]):
        assert model["vocab"][a + b] == 256 + rank
    # frequent-word pairs actually got learned (corpus is 'the ...'-
    # heavy, so some multi-char token must exist)
    assert any(len(t) >= 3 for t in model["vocab"] if model["vocab"][t] >= 256)


def test_encode_decode_roundtrip_distributed(corpus, model):
    enc = bpe_encode(corpus, model, "text")
    dec = bpe_decode(enc, model, "token_ids")
    rows = dec.collect()
    for r in rows:
        if r.text is None:
            assert r.token_ids is None and r.decoded is None
        else:
            assert r.decoded == r.text, r.text
    # counts match id-array lengths
    cnt = {
        r.doc_id: r.n_tokens
        for r in bpe_token_count(corpus, model, "text").collect()
    }
    for r in rows:
        want = None if r.token_ids is None else len(r.token_ids)
        assert cnt[r.doc_id] == want


def test_no_merges_counts_bytes(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRICKY)], "i long, text string"
    )
    base = {"vocab": {u: b for b, u in _BYTE_TO_UNI.items()}, "merges": []}
    got = {r.i: r.n_tokens for r in bpe_token_count(df, base).collect()}
    for i, t in enumerate(TRICKY):
        assert got[i] == len(t.encode("utf-8")), t


def test_single_merge_semantics():
    vocab = {u: b for b, u in _BYTE_TO_UNI.items()}
    vocab["er"] = 256
    m = {"vocab": vocab, "merges": [("e", "r")]}
    # 'erer' -> two er tokens; 'eere' -> e, er, e
    assert encode_text(m, "erer") == [256, 256]
    assert encode_text(m, "eere") == [vocab["e"], 256, vocab["e"]]
    assert decode_ids(m, encode_text(m, "lower upper")) == "lower upper"


def test_differential_vs_independent_strategy(corpus, model):
    for t in TRICKY + ["the quick brown fox 7 jumps over the lazy dog"]:
        assert encode_text(model, t) == _reference_encode(model, t), t


def test_save_load_gpt2_format_roundtrip(tmp_path, corpus, model):
    vp, mp = str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt")
    save_bpe(model, vp, mp)
    lines = open(mp, encoding="utf-8").read().splitlines()
    assert lines[0].startswith("#version")
    assert len(lines) == 1 + len(model["merges"])
    assert all(len(ln.split(" ")) == 2 for ln in lines[1:])
    loaded = load_bpe(vp, mp)
    assert loaded["merges"] == model["merges"]
    assert loaded["vocab"] == model["vocab"]
    t = "the quick brown fox"
    assert encode_text(loaded, t) == encode_text(model, t)
    # vocab.json is plain {token: id}
    assert isinstance(json.load(open(vp, encoding="utf-8")), dict)


def test_vocab_size_validation(corpus):
    with pytest.raises(ValueError, match=">= 256"):
        train_bpe(corpus, "text", vocab_size=100)


def test_chunk_documents_bpe_roundtrip_and_overlap(spark, model):
    """Exact-token chunking: every window fits the budget; overlap=0
    TOKEN-ID windows concatenate back to bpe_encode's array exactly
    (ids are the lossless product — a window may split a multi-byte
    char, so chunk_text is exact only where no seam cuts one); ASCII
    chunk_texts concatenate exactly; overlap windows share their
    first `overlap` ids with the previous window's tail."""
    from polaroam_spark.operators.tokenize import (
        chunk_documents_bpe,
        encode_text,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 8),
        (2, "café naïve 日本語 🙂 " * 10),
        (3, "tiny"),
        (4, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents_bpe(docs, model, chunk_tokens=16).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_id)):
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 4 not in by_doc  # NULL text -> no rows under drop_empty
    for i, t in [(1, rows[0][1]), (2, rows[1][1]), (3, "tiny")]:
        chunks = by_doc[i]
        assert all(r.n_tokens <= 16 for r in chunks)
        assert all(r.n_tokens == 16 for r in chunks[:-1])
        assert all(len(r.token_ids) == r.n_tokens for r in chunks)
        got_ids = [i for r in chunks for i in r.token_ids]
        assert got_ids == encode_text(model, t)
    # pure-ASCII text: the rendered chunks concatenate exactly too
    ascii_chunks = by_doc[1]
    assert "".join(r.chunk_text for r in ascii_chunks) == rows[0][1]

    ov = chunk_documents_bpe(
        docs.filter("doc_id = 1"), model, chunk_tokens=16, overlap=4
    ).collect()
    ov = sorted(ov, key=lambda r: r.chunk_id)
    for a, b in zip(ov, ov[1:]):
        assert list(a.token_ids[12:16]) == list(b.token_ids[:4])

    import pytest

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents_bpe(docs, model, chunk_tokens=8, overlap=8)


def test_special_tokens_atomic_and_lossless(spark, model):
    """add_special_tokens: specials encode atomically (never merged,
    never split), decode to their literal text, ids continue after
    the vocab, and text WITHOUT specials encodes identically to the
    base model. Longest-match wins for nested specials."""
    from polaroam_spark.operators.tokenize import (
        add_special_tokens,
        bpe_decode,
        bpe_encode,
        decode_ids,
        encode_text,
    )

    m2 = add_special_tokens(model, ["<|endoftext|>", "<|pad|>"])
    eot = m2["special"]["<|endoftext|>"]
    assert eot == max(model["vocab"].values()) + 1
    assert m2["special"]["<|pad|>"] == eot + 1
    plain = "the quick brown fox"
    assert encode_text(m2, plain) == encode_text(model, plain)
    s = f"doc one<|endoftext|>doc two<|endoftext|><|pad|>"
    ids = encode_text(m2, s)
    assert ids.count(eot) == 2
    assert decode_ids(m2, ids) == s
    # distributed paths honor specials too
    df = spark.createDataFrame([(1, s)], "doc_id long, text string")
    out = bpe_decode(
        bpe_encode(df, m2, "text"), m2, "token_ids"
    ).first()
    assert out.decoded == s
    # longest-match: a special that prefixes another
    m3 = add_special_tokens(model, ["<|e|>", "<|e|>x"])
    ids3 = encode_text(m3, "a<|e|>xb")
    assert m3["special"]["<|e|>x"] in ids3
    assert m3["special"]["<|e|>"] not in ids3
    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        add_special_tokens(model, [""])


def test_tiktoken_format_roundtrip_equivalent_encode(
    tmp_path, corpus, model
):
    """save_tiktoken/load_tiktoken: the vocab-concat-rank encoder
    (tiktoken's algorithm) must encode byte-identically to the
    merges-rank encoder for a model whose ranks follow merge order —
    which both layouts guarantee; decode + specials also survive."""
    from polaroam_spark.operators.tokenize import (
        add_special_tokens,
        load_tiktoken,
        save_tiktoken,
    )

    p = str(tmp_path / "model.tiktoken")
    save_tiktoken(model, p)
    lines = open(p, encoding="ascii").read().splitlines()
    assert len(lines) == len(model["vocab"])
    tk = load_tiktoken(p)
    assert tk["rank_by_concat"] is True
    for t in TRICKY + ["the quick brown fox 3 jumps over the lazy dog"]:
        assert encode_text(tk, t) == encode_text(model, t), t
        assert decode_ids(tk, encode_text(tk, t)) == t
    tk2 = add_special_tokens(tk, ["<|endoftext|>"])
    s = "a<|endoftext|>b"
    ids = encode_text(tk2, s)
    assert tk2["special"]["<|endoftext|>"] in ids
    assert decode_ids(tk2, ids) == s


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_pretokenize_partition_property(t):
    """Property: pre-tokenization is an exact partition of ANY text."""
    assert "".join(pretokenize(t)) == t


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=120))
def test_encode_decode_roundtrip_property(t):
    """Property: decode(encode(t)) == t for arbitrary unicode under a
    no-merge model and under a merged model (byte-level BPE is
    lossless by construction; driver-side — the distributed path
    shares the exact same _encoder/_decode_ids closures)."""
    base = {
        "vocab": {u: b for b, u in _BYTE_TO_UNI.items()},
        "merges": [],
    }
    assert decode_ids(base, encode_text(base, t)) == t
    vocab = dict(base["vocab"])
    vocab["er"] = 256
    vocab["the"] = 257  # unreachable (no ('th','e') chain) — ignored
    merged = {"vocab": vocab, "merges": [("e", "r")]}
    assert decode_ids(merged, encode_text(merged, t)) == t


def test_pack_separator_accounting_exact(spark, model):
    """End-to-end exact token accounting: whole-document chunks ->
    pack -> materialize with a '<|eot|>' separator; re-encoding each
    pack's text under the special-token model must equal the sum of
    its chunks' token counts plus (n_chunks - 1) separators — the
    accounting materialize_packs' docstring defers to the loader is
    now closable in-engine. Whole-doc chunks make the claim EXACT:
    encode is deterministic, so re-encoding an intact document
    reproduces its count; a mid-word chunk slice would NOT (its
    decoded text can re-merge across the cut), which is why the
    guarantee is stated at document/separator granularity."""
    from polaroam_spark.operators.chunking import (
        materialize_packs,
        packing_plan,
    )
    from polaroam_spark.operators.tokenize import (
        add_special_tokens,
        bpe_token_count,
        chunk_documents_bpe,
    )

    docs = spark.createDataFrame(
        [
            (i, f"doc {i} " + "the quick brown fox jumps high " * (1 + i % 4))
            for i in range(12)
        ],
        "doc_id long, text string",
    )
    # budget far above any doc length -> one intact chunk per doc
    chunks = chunk_documents_bpe(docs, model, chunk_tokens=4096)
    assert chunks.count() == 12
    # one stratum -> one cumsum, so small-doc packs actually group
    # (the default hash-sharded path scatters 12 docs into 12 shards)
    from pyspark.sql import functions as F

    planned = packing_plan(
        chunks.select(
            "doc_id", "chunk_id", "chunk_text", "n_tokens",
            F.lit("all").alias("src"),
        ),
        budget_tokens=256,
        strata_col="src",
    )
    packs = materialize_packs(planned, separator="<|eot|>")
    sp_model = add_special_tokens(model, ["<|eot|>"])
    recounted = bpe_token_count(packs, sp_model, "text", "n_exact")
    rows = recounted.collect()
    assert any(r.n_chunks > 1 for r in rows)  # separators exercised
    for r in rows:
        assert r.n_exact == r.n_tokens + (r.n_chunks - 1), r


def test_pack_token_stream_semantics(spark, model):
    """Concat-and-cut packing: every emitted sequence is exactly
    seq_len (drop_remainder default), the per-shard stream is
    documents in id order joined by ONE eot token (reassembling a
    single-shard stream and splitting at eot recovers every doc's
    ids), remainder emits short when asked, deterministic, NULL text
    skipped."""
    from polaroam_spark.operators.tokenize import (
        add_special_tokens,
        encode_text,
        pack_token_stream,
    )

    docs = spark.createDataFrame(
        [(i, f"document {i} " + "quick brown fox " * (2 + i % 3))
         for i in range(9)] + [(99, None)],
        "doc_id long, text string",
    )
    L = 24
    out = pack_token_stream(
        docs, model, seq_len=L, num_shards=1, drop_remainder=False
    ).collect()
    rows = sorted(out, key=lambda r: (r.shard, r.seq_id))
    assert all(r.shard == 0 for r in rows)
    assert [r.seq_id for r in rows] == list(range(len(rows)))
    assert all(r.n_tokens == L for r in rows[:-1])
    assert all(len(r.token_ids) == r.n_tokens for r in rows)
    # reassemble and split at eot -> per-doc ids in doc_id order
    m2 = add_special_tokens(model, ["<|endoftext|>"])
    eot = m2["special"]["<|endoftext|>"]
    stream = [i for r in rows for i in r.token_ids]
    segs, cur = [], []
    for i in stream:
        if i == eot:
            segs.append(cur)
            cur = []
        else:
            cur.append(i)
    assert cur == []  # stream ends on an eot
    want = [
        encode_text(model, r.text)
        for r in sorted(
            docs.filter("text is not null").collect(),
            key=lambda r: r.doc_id,
        )
    ]
    assert segs == want

    # drop_remainder=True: only full windows, same prefix
    full = pack_token_stream(
        docs, model, seq_len=L, num_shards=1
    ).collect()
    full = sorted(full, key=lambda r: r.seq_id)
    assert all(r.n_tokens == L for r in full)
    assert [list(r.token_ids) for r in full] == [
        list(r.token_ids) for r in rows if r.n_tokens == L
    ]

    # multi-shard: deterministic, union of shard streams preserves
    # every token exactly once (remainders kept)
    ms1 = pack_token_stream(
        docs, model, seq_len=L, num_shards=4, drop_remainder=False
    ).collect()
    ms2 = pack_token_stream(
        docs, model, seq_len=L, num_shards=4, drop_remainder=False
    ).collect()
    key = lambda r: (r.shard, r.seq_id, list(r.token_ids))
    assert sorted(map(key, ms1)) == sorted(map(key, ms2))
    assert sum(r.n_tokens for r in ms1) == len(stream)

    import pytest

    with pytest.raises(ValueError, match="seq_len"):
        pack_token_stream(docs, model, seq_len=0)


def test_histogram_cap_warns_loudly(corpus):
    """r13 hardening: truncating the training histogram silently
    changes the learned merges — the cap must WARN. No warning when
    the vocabulary fits."""
    import warnings

    with pytest.warns(UserWarning, match="max_words"):
        capped = train_bpe(corpus, "text", vocab_size=280, max_words=10)
    assert 0 < len(capped["merges"]) <= 24

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        train_bpe(corpus, "text", vocab_size=260, max_words=1_000_000)
    assert not [
        w for w in caught if "max_words" in str(w.message)
    ]


def test_merge_concats_unique_and_id_space_dense(model):
    """r13 hardening: no two merges may share a concatenation (the
    vocab.json key would collide, leaving a hole in the id space).
    A 200k-histogram random search found no NATURAL trigger — global
    rank application makes the two bracketings of one string mutually
    exclusive — so this pins the guarded invariant, not a repro."""
    concats = [a + b for a, b in model["merges"]]
    assert len(set(concats)) == len(concats)
    assert len(model["vocab"]) == 256 + len(model["merges"])
    assert sorted(model["vocab"].values()) == list(
        range(len(model["vocab"]))
    )


def test_pack_token_stream_shard_guard(spark, model):
    """An under-sharded pack must fail LOUDLY with a sizing hint, not
    OOM an executor."""
    from polaroam_spark.operators.tokenize import pack_token_stream

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(5)],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="max_shard_tokens"):
        pack_token_stream(
            docs, model, seq_len=4, num_shards=1, max_shard_tokens=3
        ).collect()
    # a generous cap (the default) packs normally
    assert (
        pack_token_stream(docs, model, seq_len=4, num_shards=1).count()
        > 0
    )


def test_model_io_uri_paths(tmp_path, model):
    """Model persistence must work through pyarrow.fs URIs (object
    stores on a real cluster; file:// here) — both layouts."""
    from polaroam_spark.operators.tokenize import (
        load_tiktoken,
        save_tiktoken,
    )

    base = "file://" + str(tmp_path)
    save_bpe(model, base + "/vocab.json", base + "/merges.txt")
    again = load_bpe(base + "/vocab.json", base + "/merges.txt")
    assert again["vocab"] == model["vocab"]
    assert again["merges"] == model["merges"]

    save_tiktoken(model, base + "/model.tiktoken")
    tk = load_tiktoken(base + "/model.tiktoken")
    s = "the cat sat on the mat — café 123"
    assert encode_text(tk, s) == encode_text(model, s)
    # the URI files are byte-identical to the POSIX ones
    posix_vocab = tmp_path / "v2.json"
    posix_merges = tmp_path / "m2.txt"
    save_bpe(model, str(posix_vocab), str(posix_merges))
    assert (tmp_path / "vocab.json").read_bytes() == posix_vocab.read_bytes()
    assert (tmp_path / "merges.txt").read_bytes() == posix_merges.read_bytes()


EXOTIC = [
    "Roman Ⅻ and circled ① numerals",
    "abcⅫ①def",
    "mixed 12Ⅻ34 runs",
    "ASCII only stays identical 123 abc!",
]


def test_unicode_pretokenizer_differential():
    """The opt-in 'unicode' flavor is the published GPT-2 \\p-class
    split: Nl/No characters (Ⅻ, ①) classify as NUMERALS there but as
    letters under the stdlib default (\\w includes everything
    isalnum). Both flavors stay exact partitions; they agree on
    text without exotic numerals."""
    for t in EXOTIC + TRICKY:
        assert "".join(pretokenize(t, "default")) == t
        assert "".join(pretokenize(t, "unicode")) == t
    # the differential: default glues the Nl/No run to the letters,
    # unicode splits letters | numerals
    assert pretokenize("abcⅫ①def", "default") == ["abcⅫ①def"]
    assert pretokenize("abcⅫ①def", "unicode") == ["abc", "Ⅻ①", "def"]
    # ASCII text splits identically under both flavors
    for t in ["the cat's 99 mats!", "we're ok  now"]:
        assert pretokenize(t, "default") == pretokenize(t, "unicode")
    with pytest.raises(ValueError, match="unknown pretokenizer"):
        pretokenize("x", "nope")


def test_unicode_flavor_trains_and_roundtrips(spark, tmp_path):
    """A unicode-flavor model is self-describing end-to-end: train →
    encode/decode roundtrip → save/load (flavor rides the #version
    line, which third-party loaders drop unread) → identical encode.
    Specials preserve the flavor too."""
    from polaroam_spark.operators.tokenize import add_special_tokens

    rows = [(i, EXOTIC[i % len(EXOTIC)]) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    m = train_bpe(docs, "text", vocab_size=280, pretokenizer="unicode")
    assert m["pretokenizer"] == "unicode"
    dec = bpe_decode(bpe_encode(docs, m, "text"), m, "token_ids")
    for r in dec.collect():
        assert r.decoded == r.text

    save_bpe(m, str(tmp_path / "v.json"), str(tmp_path / "m.txt"))
    first = (tmp_path / "m.txt").read_text().splitlines()[0]
    assert first == "#version: 0.2 pretokenizer=unicode"
    again = load_bpe(str(tmp_path / "v.json"), str(tmp_path / "m.txt"))
    assert again.get("pretokenizer") == "unicode"
    s = EXOTIC[1]
    assert encode_text(again, s) == encode_text(m, s)
    # a default-flavor model keeps the plain standard header
    d = train_bpe(docs, "text", vocab_size=260)
    save_bpe(d, str(tmp_path / "dv.json"), str(tmp_path / "dm.txt"))
    assert (tmp_path / "dm.txt").read_text().splitlines()[0] == "#version: 0.2"

    sp = add_special_tokens(m, ["<|endoftext|>"])
    assert sp.get("pretokenizer") == "unicode"


def test_special_tokens_preserve_rank_by_concat(tmp_path, model):
    """Regression: add_special_tokens used to DROP rank_by_concat,
    silently turning a tiktoken-layout model into byte-level-only
    encoding (pack_token_stream always adds an eot special, so every
    pack over a tiktoken load hit it)."""
    from polaroam_spark.operators.tokenize import (
        add_special_tokens,
        load_tiktoken,
        save_tiktoken,
    )

    save_tiktoken(model, str(tmp_path / "tk.txt"))
    tk = load_tiktoken(str(tmp_path / "tk.txt"))
    sp = add_special_tokens(tk, ["<|endoftext|>"])
    assert sp.get("rank_by_concat") is True
    s = "the cat sat on the mat"
    assert encode_text(sp, s) == encode_text(model, s)
    # tiktoken layout cannot record a non-default flavor: warn
    uni = dict(model, pretokenizer="unicode")
    with pytest.warns(UserWarning, match="tiktoken layout"):
        save_tiktoken(uni, str(tmp_path / "tk2.txt"))
    back = load_tiktoken(str(tmp_path / "tk2.txt"), pretokenizer="unicode")
    assert back.get("pretokenizer") == "unicode"


def test_third_party_gpt2_layout_interop_exact_ids():
    """Exact-ids test against a vendored third-party-style model
    (tests/fixtures/mini_gpt2): the files follow GPT-2's REAL
    conventions our own save_bpe never produces — base ids in the
    published printable-first order (so 'Ġ' is id 220, NOT its byte
    value), \\u-escaped vocab.json, literal-Ġ merges.txt, and a
    tiktoken single-file twin. Content is synthetic (no tokenizer
    package or network in this container to vendor an authentic
    fragment) but every expected id below is derived BY HAND from
    the file, so a loader that recomputed ids, misread the version
    line, or mis-mapped the byte bijection fails loudly.

    Hand derivation: printables '!'(0x21)..'~' map to ids byte-0x21;
    '®'..'ÿ' to 106+(byte-0xAE); '¡'..'¬' to 94+(byte-0xA1);
    remapped bytes to 188+k ('Ġ'=space=220). Merges (rank: pair):
    0:(t,h) 1:(Ġ,t) 2:(th,e) 3:(Ġ,the) 4:(c,a) 5:(ca,t) 6:(Ġ,cat),
    ids 256..262 in rank order."""
    import os

    from polaroam_spark.operators.tokenize import load_tiktoken

    fx = os.path.join(
        os.path.dirname(__file__), "fixtures", "mini_gpt2"
    )
    m = load_bpe(
        os.path.join(fx, "vocab.json"), os.path.join(fx, "merges.txt")
    )
    tk = load_tiktoken(os.path.join(fx, "mini.tiktoken"))
    assert m["vocab"]["Ġ"] == 220 and m["vocab"]["Ġthe"] == 259

    cases = {
        # the=258 | Ġcat: (c,a)->ca,(ca,t)->cat,(Ġ,cat)=262 | Ġthe:
        # (t,h),(th,e),(Ġ,the)=259
        "the cat the": [258, 262, 259],
        # 'T'=0x54-0x21=51, h=71, e=68 (no merge matches "The")
        "The cat": [51, 71, 68, 262],
        # inside one pre-token rank order wins: (t,h) r0 first, then
        # (th,e) r2 beats (c,a) r4 -> the=258 + cat=261
        "thecat": [258, 261],
        # no digit merges: Ġ=220, '1'=16, '2'=17, '3'=18
        " 123": [220, 16, 17, 18],
        # ca=260, f=0x66-0x21=69; é = bytes 0xC3 0xA9 ->
        # 106+(0xC3-0xAE)=127, 94+(0xA9-0xA1)=102
        "café": [260, 69, 127, 102],
    }
    for text, want in cases.items():
        assert encode_text(m, text) == want, ("two-file", text)
        assert encode_text(tk, text) == want, ("tiktoken", text)
        assert decode_ids(m, want) == text
        assert decode_ids(tk, want) == text


def test_tokenizer_stats_identity_and_trained(spark, corpus, model):
    """Identity model: n_tokens == UTF-8 bytes exactly; a trained
    model compresses (n_tokens strictly below n_bytes, fertility
    falls) while counts replay the per-doc encode."""
    from polaroam_spark.operators.tokenize import (
        _BYTE_TO_UNI,
        tokenizer_stats,
    )

    identity = {
        "vocab": {_BYTE_TO_UNI[b]: b for b in range(256)},
        "merges": [],
    }
    ident = tokenizer_stats(corpus, identity).collect()[0]
    rows = [r for r in corpus.collect() if r.text is not None]
    assert ident.n_docs == len(rows)
    assert ident.n_bytes == sum(
        len(r.text.encode("utf-8")) for r in rows
    )
    assert ident.n_tokens == ident.n_bytes
    assert ident.n_chars == sum(len(r.text) for r in rows)
    assert ident.n_words == sum(len(r.text.split()) for r in rows)
    assert ident.bytes_per_token == pytest.approx(1.0)

    trained = tokenizer_stats(corpus, model).collect()[0]
    assert trained.n_tokens < trained.n_bytes
    assert trained.fertility < ident.fertility
    want = sum(len(encode_text(model, r.text)) for r in rows)
    assert trained.n_tokens == want

    # grouped: per-group rows, counts partition the corpus
    grouped = corpus.withColumn(
        "grp", (F.col("doc_id") % 2).cast("int")
    ).filter(F.col("text").isNotNull())
    per = tokenizer_stats(grouped, model, group_by="grp").collect()
    assert sum(r.n_tokens for r in per) == trained.n_tokens
    assert {r.grp for r in per} == {0, 1}


def test_pack_token_stream_pre_encoded_ids(spark):
    """ids_col mode: FIM-transformed (or any pre-encoded) streams
    pack without re-encoding; optional eot_id separates documents;
    model must be None; stream reassembles exactly in id order."""
    import pytest

    from pyspark.sql import functions as F

    from polaroam_spark.operators.objectives import fim_transform
    from polaroam_spark.operators.tokenize import pack_token_stream

    rows = [(i, list(range(1, 7 + (i % 4)))) for i in range(10)]
    df = spark.createDataFrame(
        rows, "doc_id long, token_ids array<int>"
    )
    fim = fim_transform(df, fim_rate=1.0, seed=5).select(
        "doc_id", F.col("fim_ids").alias("ids")
    )
    packed = pack_token_stream(
        fim, None, seq_len=16, ids_col="ids", num_shards=1,
        drop_remainder=False, eot_id=999,
    )
    stream = [
        t
        for r in packed.orderBy("shard", "seq_id").collect()
        for t in r.token_ids
    ]
    want = []
    for r in fim.orderBy("doc_id").collect():
        want.extend(r.ids)
        want.append(999)
    assert stream == want

    # no separator: back-to-back
    packed2 = pack_token_stream(
        fim, None, seq_len=16, ids_col="ids", num_shards=1,
        drop_remainder=False,
    )
    stream2 = [
        t
        for r in packed2.orderBy("shard", "seq_id").collect()
        for t in r.token_ids
    ]
    assert stream2 == [t for t in want if t != 999]

    with pytest.raises(ValueError, match="model=None"):
        pack_token_stream(
            fim, {"vocab": {}}, seq_len=16, ids_col="ids"
        )


def test_pack_eot_id_without_ids_col_is_loud(spark):
    """pack_token_stream(eot_id=...) in TEXT mode raises instead of
    silently ignoring the separator override (r18 ADVICE fix)."""
    from polaroam_spark.operators.tokenize import (
        pack_token_stream,
        train_bpe,
    )

    docs = spark.createDataFrame(
        [("a", "hello world")], "doc_id string, text string"
    )
    model = train_bpe(docs, vocab_size=260, text_col="text")
    with pytest.raises(ValueError, match="eot_id"):
        pack_token_stream(docs, model, seq_len=4, eot_id=99)
