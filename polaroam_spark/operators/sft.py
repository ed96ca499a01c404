"""SFT / chat-data preparation: chat-template rendering, per-message
token encoding with LOSS MASKS, and padded fixed-length training
windows — the instruction-tuning half of the tokenizer ladder
(``pack_token_stream`` is the pretraining half: concat-and-cut, no
masks; SFT needs loss restricted to assistant tokens and pads per
conversation instead of packing across them).

Beyond-reference component (the reference is a mobility engine);
the shapes follow the de-facto public conventions: the ChatML
message framing (``<|im_start|>role\\ncontent<|im_end|>``) and the
standard SFT loss rule (train only on assistant CONTENT tokens —
headers, user turns, and padding are masked out).

Design decisions a gate can pin:

- **Rendering is a pure Column expression** (``F.aggregate`` over
  the messages array — no UDF), so a 100 TB conversation corpus
  renders inside whole-stage codegen and the oracle replays the
  concatenation in SQL.
- **Encoding is per message SEGMENT** (header / content / footer
  encoded separately, ids concatenated): that is what makes the
  mask exact — each segment's token span is known by construction,
  never recovered from offsets after the fact. Segment boundaries
  fall on pre-token boundaries (headers end with ``\\n``), and
  per-segment encoding is the DEFINED semantics here (the public
  SFT convention), so with the byte-identity model ids ==
  rendered-text UTF-8 bytes exactly and the mask == the
  assistant-content byte span — the sft2 oracle twin.
- **Windows pad, never pack**: one conversation per sequence run,
  last window padded with ``pad_id`` and mask 0 (padding
  contributes no loss by the same rule as non-assistant tokens).
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: template -> (header fn, footer) over a role Column
_TEMPLATES = ("chatml", "plain")


def _template_parts(template: str):
    if template == "chatml":
        return (
            lambda role: F.concat(
                F.lit("<|im_start|>"), role, F.lit("\n")
            ),
            F.lit("<|im_end|>\n"),
        )
    if template == "plain":
        return (
            lambda role: F.concat(role, F.lit(": ")),
            F.lit("\n"),
        )
    raise ValueError(
        f"unknown template {template!r}: use one of {_TEMPLATES}"
    )


def _template_parts_py(template: str):
    if template == "chatml":
        return (lambda role: f"<|im_start|>{role}\n", "<|im_end|>\n")
    if template == "plain":
        return (lambda role: f"{role}: ", "\n")
    raise ValueError(
        f"unknown template {template!r}: use one of {_TEMPLATES}"
    )


def render_chat_template(
    df: DataFrame,
    messages_col: str = "messages",
    template: str = "chatml",
    out_col: str = "text",
) -> DataFrame:
    """Render an ``array<struct<role string, content string>>``
    conversation column into one training text per row — a pure
    ``F.aggregate`` string fold, no UDF. NULL messages arrays render
    NULL; a NULL role or content inside a message raises at
    execution time by design (``concat`` of NULL poisons that row to
    NULL — a silent half-rendered conversation would train on
    garbage, so callers should validate with
    ``validate_expectations`` upstream; the encode path rejects them
    loudly instead)."""
    header, footer = _template_parts(template)
    rendered = F.aggregate(
        F.col(messages_col),
        F.lit(""),
        lambda acc, m: F.concat(
            acc, header(m["role"]), m["content"], footer
        ),
    )
    return df.withColumn(out_col, rendered)


def encode_chat_sft(
    df: DataFrame,
    model: dict,
    messages_col: str = "messages",
    template: str = "chatml",
    loss_roles: "tuple[str, ...]" = ("assistant",),
    ids_col: str = "token_ids",
    mask_col: str = "loss_mask",
) -> DataFrame:
    """Append ``token_ids`` (``array<int>``) and a same-length
    ``loss_mask`` (``array<int>``, 1 where the SFT loss applies):
    each message encodes as header / content / footer segments
    (ids concatenated in render order) and the mask is 1 exactly on
    the CONTENT tokens of ``loss_roles`` messages — headers,
    footers, and non-loss roles are 0. ``model`` is either tokenizer
    family (BPE or unigram, the ``tokenizer_stats`` dispatch).
    NULL messages array → NULL ids/mask; a NULL role or content
    inside a message raises loudly (a silently dropped turn would
    shift every downstream span). Concatenating a row's segment ids
    equals encoding the rendered text whenever segment boundaries
    fall on pre-token boundaries (true of both built-in templates —
    headers end with a separator), and with the byte-identity model
    ids are exactly the rendered text's UTF-8 bytes."""
    if model.get("type") == "unigram":
        from polaroam_spark.operators.unigram import _unigram_encoder

        enc = _unigram_encoder(model)
    else:
        from polaroam_spark.operators.tokenize import _encoder

        enc = _encoder(model)
    header_py, footer_py = _template_parts_py(template)
    loss = tuple(str(r) for r in loss_roles)

    def _one(msgs) -> "tuple[list[int], list[int]] | None":
        if msgs is None:
            return None
        ids: "list[int]" = []
        mask: "list[int]" = []
        for m in msgs:
            role = m["role"] if not hasattr(m, "role") else m.role
            content = (
                m["content"] if not hasattr(m, "content") else m.content
            )
            if role is None or content is None:
                raise ValueError(
                    "encode_chat_sft: NULL role/content inside a "
                    "messages array — validate upstream; a silently "
                    "dropped turn would shift every downstream span"
                )
            h = enc(header_py(role))
            c = enc(content)
            f_ = enc(footer_py)
            ids.extend(h)
            mask.extend([0] * len(h))
            ids.extend(c)
            mask.extend([1 if role in loss else 0] * len(c))
            ids.extend(f_)
            mask.extend([0] * len(f_))
        return ids, mask

    out_type = T.StructType(
        [
            T.StructField("ids", T.ArrayType(T.IntegerType())),
            T.StructField("mask", T.ArrayType(T.IntegerType())),
        ]
    )

    @F.pandas_udf(out_type)
    def _enc(col: pd.Series) -> pd.DataFrame:
        pairs = col.map(_one)
        return pd.DataFrame(
            {
                "ids": pairs.map(lambda p: None if p is None else p[0]),
                "mask": pairs.map(
                    lambda p: None if p is None else p[1]
                ),
            }
        )

    tmp = df.withColumn("_im", _enc(F.col(messages_col)))
    return tmp.select(
        *df.columns,
        F.col("_im.ids").alias(ids_col),
        F.col("_im.mask").alias(mask_col),
    )


def chunk_sft_sequences(
    df: DataFrame,
    seq_len: int,
    pad_id: int = 0,
    ids_col: str = "token_ids",
    mask_col: str = "loss_mask",
    id_col: str = "doc_id",
    drop_no_loss: bool = True,
) -> DataFrame:
    """Cut each conversation's (ids, mask) into fixed ``seq_len``
    training windows, PADDING the last window with ``pad_id`` /
    mask 0 — one row per (conversation, window) with ``seq_id,
    token_ids, loss_mask, n_tokens, n_loss_tokens, n_padding``. Pure
    JVM array arithmetic (sequence → slice → concat-pad →
    posexplode), no UDF and no shuffle — the loader-facing step
    after :func:`encode_chat_sft`, padding per conversation instead
    of packing across conversations (the SFT convention: attention
    must not bleed between unrelated dialogues without an attention-
    mask scheme the loader may not implement). ``drop_no_loss``
    removes windows whose mask is all zero (e.g. a final window that
    is pure padding plus user text) — they contribute nothing to the
    loss. NULL ids rows emit no windows."""
    if int(seq_len) < 1:
        raise ValueError(f"seq_len must be >= 1 (got {seq_len})")
    sl = int(seq_len)
    n = F.array_size(ids_col)
    n_win = F.ceil(n / F.lit(sl)).cast("int")

    def _pad(arr: Column, fill: int) -> Column:
        # right-pad to exactly sl: concat a full pad block then cut
        # (NOT sequence(1, sl - size): Spark's sequence(1, 0)
        # DESCENDS [1, 0] and would add two pad elements to an
        # already-full window — the _walk_offsets lesson)
        return F.slice(
            F.concat(arr, F.array_repeat(F.lit(fill), sl)), 1, sl
        )

    windows = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda i: F.struct(
            _pad(F.slice(ids_col, i * sl + 1, sl), int(pad_id)).alias(
                "ids"
            ),
            _pad(F.slice(mask_col, i * sl + 1, sl), 0).alias("mask"),
            F.least(n - i * sl, F.lit(sl)).alias("real"),
        ),
    )
    out = (
        df.filter(F.col(ids_col).isNotNull())
        .filter(n > 0)
        .select(
            F.col(id_col),
            F.posexplode(windows).alias("seq_id", "_w"),
        )
        .select(
            id_col,
            F.col("seq_id").cast("long").alias("seq_id"),
            F.col("_w.ids").alias(ids_col),
            F.col("_w.mask").alias(mask_col),
            F.lit(sl).cast("long").alias("n_tokens"),
            F.aggregate(
                F.col("_w.mask"),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            ).alias("n_loss_tokens"),
            (F.lit(sl) - F.col("_w.real")).cast("long").alias(
                "n_padding"
            ),
        )
    )
    if drop_no_loss:
        out = out.filter(F.col("n_loss_tokens") > 0)
    return out


def chat_message_expectations(
    messages_col: str = "messages",
    roles: "tuple[str, ...]" = ("system", "user", "assistant"),
    require_assistant: bool = True,
) -> "dict[str, Column]":
    """Named Column rules for validating a chat corpus BEFORE
    encoding — plug straight into
    :func:`~polaroam_spark.operators.validation.validate_expectations`
    / ``enforce_expectations`` (where a failed rule quarantines the
    batch instead of :func:`encode_chat_sft` raising mid-job):

    - ``messages_present``: the array is non-NULL and non-empty;
    - ``no_null_turns``: every message has non-NULL role AND content
      (the exact condition the encoder raises on);
    - ``known_roles``: every role is in ``roles``;
    - ``has_assistant_turn`` (when ``require_assistant``): at least
      one message the SFT loss can train on — a conversation with no
      assistant turn yields an all-zero mask and a silently useless
      row;
    - ``system_first_if_any``: any system message sits at position 0
      (the ChatML convention; a mid-dialogue system turn is almost
      always a data bug).

    All rules are pure array expressions (forall/exists/filter), so
    the whole validation is one map-side aggregation pass.
    """
    m = F.col(messages_col)
    rules: "dict[str, Column]" = {
        "messages_present": m.isNotNull() & (F.size(m) > 0),
        "no_null_turns": F.forall(
            m,
            lambda x: x["role"].isNotNull()
            & x["content"].isNotNull(),
        ),
        "known_roles": F.forall(
            m, lambda x: x["role"].isin(*[F.lit(r) for r in roles])
        ),
        "system_first_if_any": F.size(
            F.filter(
                F.slice(m, 2, F.greatest(F.size(m) - 1, F.lit(0))),
                lambda x: x["role"] == "system",
            )
        )
        == 0,
    }
    if require_assistant:
        rules["has_assistant_turn"] = F.exists(
            m, lambda x: x["role"] == "assistant"
        )
    return rules
