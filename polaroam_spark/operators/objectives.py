"""Denoising-objective data preparation: T5-style SPAN CORRUPTION
(Raffel et al. 2020 §3.1.4), the prefix-LM split (the UL2
S-denoiser shape), and the FIM transform (Bavarian et al. 2022
"Efficient Training of Language Models to Fill in the Middle" —
the deployed code-model objective) over tokenized corpora — the
step between a packed token stream and a training loader.

Beyond-reference component (the reference is a mobility engine);
both objectives follow the published formulation, with the package's
determinism contract: all randomness derives from
``md5(seed, doc id)``, so the corruption of a corpus is a pure
function of (ids, seed) — reproducible on any cluster layout, and
replayable row-for-row by a driver-side reference implementation
(which is exactly what the gate pins).

Span corruption, per document (the T5 reference semantics):

- ``num_noise = clamp(round(n · noise_density), 1, n−1)`` and
  ``num_spans = clamp(round(num_noise / mean_span_length), 1,
  num_noise)``;
- noise tokens are randomly segmented into ``num_spans`` positive
  parts and the remaining tokens into ``num_spans`` parts (first gap
  may be empty — a document may start with a noise span, like the
  original's interleave);
- ``inputs`` replaces each noise span with sentinel ``s−k`` (k-th
  span, descending ids from ``sentinel_start``), ``targets`` is
  ``sentinel_k ++ span tokens`` per span plus a final closing
  sentinel — so interleaving inputs' gaps with targets' spans
  reconstructs the original ids EXACTLY (the invariant the gate
  certifies; nothing is lost, only rearranged).

Documents shorter than 2 tokens pass through with NULL
inputs/targets (nothing to corrupt) rather than being dropped —
the caller decides.
"""
from __future__ import annotations

import hashlib
import random as _random

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _rng_for(seed: int, key) -> "_random.Random":
    h = hashlib.md5(f"{int(seed)}:{key}".encode("utf-8")).digest()
    return _random.Random(int.from_bytes(h[:8], "big"))


def _segment(total: int, k: int, rng) -> "list[int]":
    """Randomly split ``total`` into ``k`` positive parts (T5's
    _random_segmentation: choose k−1 distinct cut points)."""
    if k == 1:
        return [total]
    cuts = sorted(rng.sample(range(1, total), k - 1))
    prev = 0
    out = []
    for c in cuts + [total]:
        out.append(c - prev)
        prev = c
    return out


def _corrupt_one(
    ids,
    key,
    seed: int,
    noise_density: float,
    mean_span_length: float,
    sentinel_start: int,
):
    """(inputs, targets) for one document, or (None, None) when
    there is nothing to corrupt (NULL or < 2 tokens)."""
    if ids is None:
        return None, None
    n = len(ids)
    if n < 2:
        return None, None
    rng = _rng_for(seed, key)
    num_noise = min(max(round(n * noise_density), 1), n - 1)
    # clamp by BOTH sides' capacity: each span needs >= 1 noise
    # token, and the gap segmentation (non-noise + 1 virtual for the
    # possibly-empty first gap) needs >= num_spans parts — at
    # extreme densities (e.g. r=0.9, mu=1) the naive count exceeds it
    num_spans = min(
        max(round(num_noise / mean_span_length), 1),
        num_noise,
        n - num_noise + 1,
    )
    # a REAL token inside the sentinel band would be misparsed as a
    # sentinel by reconstruction (and by any seq2seq consumer of the
    # convention) — fail loudly here, at corruption time, instead of
    # corrupting data the determinism gate only catches if the
    # colliding id happens to occur in its fixture
    lo_band = sentinel_start - num_spans
    mx = max(ids)
    if mx >= lo_band:
        bad = sorted(
            {
                int(t)
                for t in ids
                if lo_band <= t <= sentinel_start
            }
        )
        if bad:
            raise ValueError(
                f"span_corruption: token id(s) {bad[:5]} fall inside"
                f" the sentinel band [{lo_band}, {sentinel_start}]"
                " for this document — a real token would be"
                " misparsed as a sentinel; place sentinel_start"
                " above the vocabulary (add_special_tokens ids)"
            )
    noise_lens = _segment(num_noise, num_spans, rng)
    # gaps: num_spans parts over the non-noise tokens; the FIRST gap
    # may be empty (add 1 virtual token, subtract from the first) so
    # a document can open with a noise span
    gap_lens = _segment(n - num_noise + 1, num_spans, rng)
    gap_lens[0] -= 1
    inputs: "list[int]" = []
    targets: "list[int]" = []
    pos = 0
    for k, (g, s) in enumerate(zip(gap_lens, noise_lens)):
        inputs.extend(ids[pos: pos + g])
        pos += g
        sentinel = sentinel_start - k
        inputs.append(sentinel)
        targets.append(sentinel)
        targets.extend(ids[pos: pos + s])
        pos += s
    inputs.extend(ids[pos:])
    targets.append(sentinel_start - num_spans)  # closing sentinel
    return inputs, targets


def _prefix_one(ids, key, seed: int, min_prefix: int):
    """(inputs, targets) for one document under the prefix-LM cut,
    or (None, None) when too short — shared by
    :func:`prefix_lm_split` and :func:`ul2_mixture` so the mixture's
    S-denoiser output is id-identical to the standalone operator."""
    if ids is None or len(ids) < min_prefix + 1:
        return None, None
    cut = _rng_for(seed, key).randint(min_prefix, len(ids) - 1)
    return list(ids[:cut]), list(ids[cut:])


def _fim_one(ids, key, seed: int, fim_rate: float, spm_rate: float,
             sentinels: "tuple[int, int, int]"):
    """(stream, mode) for one document under the FIM draw, or
    (None, None) for NULL/empty ids — shared by
    :func:`fim_transform` and :func:`ul2_mixture`."""
    pre, suf, mid = sentinels
    if ids is None or len(ids) == 0:
        return None, None
    bad = sorted({int(t) for t in ids if int(t) in sentinels})
    if bad:
        raise ValueError(
            f"fim_transform: token id(s) {bad[:5]} collide with "
            f"the FIM sentinels {sentinels} in this document — "
            "a real token would be misparsed; place sentinels "
            "above the vocabulary (add_special_tokens ids)"
        )
    rng = _rng_for(seed, key)
    if rng.random() >= fim_rate:
        return [int(t) for t in ids], "none"
    n = len(ids)
    a = rng.randint(0, n)
    b = rng.randint(0, n)
    if a > b:
        a, b = b, a
    prefix = [int(t) for t in ids[:a]]
    middle = [int(t) for t in ids[a:b]]
    suffix = [int(t) for t in ids[b:]]
    if rng.random() < spm_rate:
        return [pre, suf] + suffix + [mid] + prefix + middle, "spm"
    return [pre] + prefix + [suf] + suffix + [mid] + middle, "psm"


def span_corruption(
    df: DataFrame,
    ids_col: str = "token_ids",
    id_col: str = "doc_id",
    noise_density: float = 0.15,
    mean_span_length: float = 3.0,
    sentinel_start: int = 32_099,
    seed: int = 41,
    inputs_col: str = "inputs",
    targets_col: str = "targets",
) -> DataFrame:
    """Append T5-style ``inputs``/``targets`` (see module docstring).
    ``sentinel_start`` is the FIRST (highest) sentinel id; spans use
    descending ids ``s, s−1, …`` (the T5 convention — callers using
    a trained model should place sentinels beyond the vocabulary,
    e.g. via ``add_special_tokens`` ids). A document whose token ids
    reach into the sentinel band ``[sentinel_start − num_spans,
    sentinel_start]`` RAISES at corruption time — a real token there
    would be misparsed as a sentinel by any consumer of the
    convention, and silence would only surface if the collision
    happened to occur in a determinism fixture. One Arrow-batched
    UDF, no shuffle; randomness is ``md5(seed, doc id)`` so the
    corruption is reproducible and replayable (gate t46)."""
    r = float(noise_density)
    if not 0.0 < r < 1.0:
        raise ValueError(
            f"noise_density must be in (0, 1) (got {noise_density})"
        )
    mu = float(mean_span_length)
    if mu < 1.0:
        raise ValueError(
            f"mean_span_length must be >= 1 (got {mean_span_length})"
        )
    s0 = int(sentinel_start)
    sd = int(seed)

    out_type = T.StructType(
        [
            T.StructField("inputs", T.ArrayType(T.IntegerType())),
            T.StructField("targets", T.ArrayType(T.IntegerType())),
        ]
    )

    @F.pandas_udf(out_type)
    def _corrupt(keys: pd.Series, ids: pd.Series) -> pd.DataFrame:
        pairs = [
            _corrupt_one(v, k, sd, r, mu, s0)
            for k, v in zip(keys, ids)
        ]
        return pd.DataFrame(
            {
                "inputs": [p[0] for p in pairs],
                "targets": [p[1] for p in pairs],
            }
        )

    tmp = df.withColumn(
        "_ct", _corrupt(F.col(id_col).cast("string"), F.col(ids_col))
    )
    return tmp.select(
        *df.columns,
        F.col("_ct.inputs").alias(inputs_col),
        F.col("_ct.targets").alias(targets_col),
    )


def reconstruct_span_corruption(
    inputs, targets, sentinel_start: int
) -> "list[int]":
    """Driver-side inverse (tests / the gate's certification): weave
    targets' spans back into inputs' sentinel slots. Raises on any
    structural mismatch — a silent partial reconstruction would
    defeat the losslessness check."""
    out: "list[int]" = []
    ti = 0
    k = 0
    for tok in inputs:
        if tok == sentinel_start - k:
            if targets[ti] != tok:
                raise ValueError("sentinel order mismatch")
            ti += 1
            nxt = sentinel_start - (k + 1)
            while ti < len(targets) and targets[ti] != nxt:
                out.append(targets[ti])
                ti += 1
            k += 1
        else:
            out.append(tok)
    if ti != len(targets) - 1 or targets[ti] != sentinel_start - k:
        raise ValueError("unconsumed targets / missing close")
    return out


def prefix_lm_split(
    df: DataFrame,
    ids_col: str = "token_ids",
    id_col: str = "doc_id",
    min_prefix: int = 1,
    seed: int = 41,
    inputs_col: str = "inputs",
    targets_col: str = "targets",
) -> DataFrame:
    """The UL2 S-denoiser / prefix-LM split: cut each document's ids
    at a position drawn uniformly from ``[min_prefix, n−1]``
    (deterministically from ``md5(seed, doc id)``) into ``inputs``
    (the visible prefix) and ``targets`` (the continuation to
    predict). ``inputs ++ targets == ids`` exactly. Documents
    shorter than ``min_prefix + 1`` get NULLs — no continuation to
    predict. One Arrow-batched UDF, no shuffle."""
    mp = int(min_prefix)
    if mp < 1:
        raise ValueError(f"min_prefix must be >= 1 (got {min_prefix})")
    sd = int(seed)

    out_type = T.StructType(
        [
            T.StructField("inputs", T.ArrayType(T.IntegerType())),
            T.StructField("targets", T.ArrayType(T.IntegerType())),
        ]
    )

    @F.pandas_udf(out_type)
    def _split(keys: pd.Series, ids: pd.Series) -> pd.DataFrame:
        pairs = [
            _prefix_one(v, k, sd, mp) for k, v in zip(keys, ids)
        ]
        return pd.DataFrame(
            {
                "inputs": [p[0] for p in pairs],
                "targets": [p[1] for p in pairs],
            }
        )

    tmp = df.withColumn(
        "_pl", _split(F.col(id_col).cast("string"), F.col(ids_col))
    )
    return tmp.select(
        *df.columns,
        F.col("_pl.inputs").alias(inputs_col),
        F.col("_pl.targets").alias(targets_col),
    )


def fim_transform(
    df: DataFrame,
    ids_col: str = "token_ids",
    id_col: str = "doc_id",
    fim_rate: float = 0.9,
    spm_rate: float = 0.5,
    pre_id: int = 100_000,
    suf_id: int = 100_001,
    mid_id: int = 100_002,
    seed: int = 41,
    out_col: str = "fim_ids",
    mode_col: str = "fim_mode",
) -> DataFrame:
    """FIM (fill-in-the-middle) transform — Bavarian et al. 2022,
    the pretraining objective code models deploy: with probability
    ``fim_rate`` per document, cut its ids at two uniform points
    into (prefix, middle, suffix) and emit the paper's sentinel
    layouts —

    - PSM (§2.2):
      ``<PRE> prefix <SUF> suffix <MID> middle``;
    - SPM (the paper's joint-compatible variant, appendix D):
      ``<PRE> <SUF> suffix <MID> prefix middle``

    — choosing SPM with probability ``spm_rate`` (the paper trains
    a 50/50 PSM/SPM mixture at fim_rate 0.5–0.9). Untransformed
    documents pass through unchanged with ``mode_col='none'``
    (the paper's AR-data share). ``mode_col`` records
    'psm'/'spm'/'none'.

    Determinism contract (the prefix_lm_split shape): the keep/cut/
    mode draws all derive from ``md5(seed, doc id)``, so the
    transform is a pure function of (ids, seed) — cluster layout
    cannot change it, and a driver-side replay is id-identical
    (gate t53). Both cut points are uniform over [0, n] and may
    coincide (empty middle) or sit at the edges (empty prefix/
    suffix) — the paper keeps those cases so the model learns
    degenerate infills. Losslessness: dropping the three sentinels
    and re-assembling (prefix ++ middle ++ suffix) reconstructs the
    original ids exactly; transformed length is always n + 3.

    The paper cuts at CHARACTER level before encoding so the model
    sees tokenizer-boundary-crossing infills; run this over
    byte-identity ids (one id per UTF-8 byte) to get exactly that,
    or over trained-model ids for the cheaper token-aligned
    variant. Sentinel ids occurring in the DATA raise loudly (the
    span_corruption band rule). NULL/empty ids pass through NULL.
    One Arrow-batched UDF, no shuffle."""
    fr = float(fim_rate)
    sr = float(spm_rate)
    if not 0.0 <= fr <= 1.0:
        raise ValueError(f"fim_rate must be in [0, 1] (got {fim_rate})")
    if not 0.0 <= sr <= 1.0:
        raise ValueError(f"spm_rate must be in [0, 1] (got {spm_rate})")
    sentinels = (int(pre_id), int(suf_id), int(mid_id))
    if len(set(sentinels)) != 3:
        raise ValueError(
            f"pre/suf/mid sentinel ids must be distinct (got {sentinels})"
        )
    sd = int(seed)

    out_type = T.StructType(
        [
            T.StructField("ids", T.ArrayType(T.IntegerType())),
            T.StructField("mode", T.StringType()),
        ]
    )

    @F.pandas_udf(out_type)
    def _fim(keys: pd.Series, ids: pd.Series) -> pd.DataFrame:
        pairs = [
            _fim_one(v, k, sd, fr, sr, sentinels)
            for k, v in zip(keys, ids)
        ]
        return pd.DataFrame(
            {
                "ids": [p[0] for p in pairs],
                "mode": [p[1] for p in pairs],
            }
        )

    tmp = df.withColumn(
        "_fm", _fim(F.col(id_col).cast("string"), F.col(ids_col))
    )
    return tmp.select(
        *df.columns,
        F.col("_fm.ids").alias(out_col),
        F.col("_fm.mode").alias(mode_col),
    )


def reconstruct_fim(
    fim_ids,
    mode: str,
    pre_id: int = 100_000,
    suf_id: int = 100_001,
    mid_id: int = 100_002,
) -> "list[int]":
    """Driver-side inverse (tests / the gate's certification):
    reassemble the original ids from a FIM layout. Raises on any
    structural mismatch — a silent partial reconstruction would
    defeat the losslessness check."""
    ids = [int(t) for t in fim_ids]
    if mode == "none":
        if any(t in (pre_id, suf_id, mid_id) for t in ids):
            raise ValueError("sentinel in untransformed document")
        return ids
    if not ids or ids[0] != pre_id:
        raise ValueError("missing <PRE>")
    if mode == "psm":
        si = ids.index(suf_id)
        mi = ids.index(mid_id)
        if not 0 < si < mi:
            raise ValueError("PSM sentinel order mismatch")
        prefix = ids[1:si]
        suffix = ids[si + 1 : mi]
        middle = ids[mi + 1 :]
    elif mode == "spm":
        if len(ids) < 2 or ids[1] != suf_id:
            raise ValueError("SPM missing <SUF> at position 1")
        mi = ids.index(mid_id)
        suffix = ids[2:mi]
        # prefix ++ middle follow <MID>; the cut between them is not
        # recoverable from the layout alone (by design — the model
        # predicts the continuation), so reconstruction returns the
        # concatenation, which equals prefix ++ middle by identity
        prefix = ids[mi + 1 :]
        middle = []
    else:
        raise ValueError(f"unknown fim mode {mode!r}")
    for part in (prefix, suffix, middle):
        if any(t in (pre_id, suf_id, mid_id) for t in part):
            raise ValueError("stray sentinel inside a segment")
    return prefix + middle + suffix


#: UL2 denoiser classes (Tay et al. 2022 §3.1.2) — per-denoiser
#: default parameters; 'fim' (Bavarian et al. 2022) is the optional
#: fourth class for code corpora, off by default.
_UL2_DEFAULT_RATES = {"r": 0.5, "s": 0.25, "x": 0.25}
_UL2_DEFAULT_PARAMS = {
    "r": {"noise_density": 0.15, "mean_span_length": 3.0},
    "x": {"noise_density": 0.5, "mean_span_length": 3.0},
    "s": {"min_prefix": 1},
    "fim": {"fim_rate": 1.0, "spm_rate": 0.5},
}


def ul2_mixture(
    df: DataFrame,
    ids_col: str = "token_ids",
    id_col: str = "doc_id",
    rates: "dict[str, float] | None" = None,
    params: "dict[str, dict] | None" = None,
    sentinel_start: int = 32_099,
    fim_sentinels: "tuple[int, int, int]" = (
        100_000,
        100_001,
        100_002,
    ),
    seed: int = 41,
    inputs_col: str = "inputs",
    targets_col: str = "targets",
    denoiser_col: str = "denoiser",
) -> DataFrame:
    """UL2 mixture-of-denoisers (Tay et al. 2022 "UL2: Unifying
    Language Learning Paradigms" §3.1.2): per DOCUMENT, draw one
    denoiser class and apply it —

    - ``'r'`` — the R-denoiser: regular T5 span corruption
      (default ``noise_density=0.15, mean_span_length=3``);
    - ``'x'`` — the X-denoiser: EXTREME span corruption (default
      ``noise_density=0.5`` — the paper's aggressive variants);
    - ``'s'`` — the S-denoiser: the prefix-LM split;
    - ``'fim'`` — optional fourth class (rate 0 unless given):
      fill-in-the-middle for code corpora; its stream lands in
      ``inputs_col`` and ``targets_col`` is NULL (FIM is a
      decoder-only objective — the infill target is embedded in
      the stream), with the sub-layout recorded as
      ``'fim:psm'/'fim:spm'/'fim:none'``.

    Each class dispatches to the SAME per-document kernels as the
    standalone operators (``_corrupt_one`` / ``_prefix_one`` /
    ``_fim_one``), with the standalone seed stream — so a document
    assigned 'r' produces exactly :func:`span_corruption`'s output
    for the same seed, and the t56 gate certifies the dispatch by
    replaying each operator on its assigned slice. The ASSIGNMENT
    draw uses an independent stream, ``md5(seed, doc_id +
    ':denoiser')``, consumed against cumulative ``rates`` in SORTED
    class order (documented so any replay agrees); rates must sum
    to 1. ``denoiser_col`` records the draw (the paper prepends a
    mode token [R]/[S]/[X] at train time — that is loader-side; the
    recorded column is what the loader keys on).

    Documents too short for their assigned denoiser (< 2 tokens for
    r/x, < min_prefix+1 for s, empty for fim) keep the assignment
    but emit NULL inputs/targets — the caller decides, the
    span_corruption rule. One Arrow-batched UDF, no shuffle;
    everything is a pure function of (ids, seed)."""
    rts = dict(rates) if rates is not None else dict(_UL2_DEFAULT_RATES)
    unknown = sorted(set(rts) - set(_UL2_DEFAULT_PARAMS))
    if unknown:
        raise ValueError(
            f"unknown denoiser class(es) {unknown}: use r/s/x/fim"
        )
    if not rts or any(v < 0 for v in rts.values()):
        raise ValueError("rates must be a non-empty dict of >= 0")
    if abs(sum(rts.values()) - 1.0) > 1e-9:
        raise ValueError(
            f"rates must sum to 1 (got {sum(rts.values())})"
        )
    prm = {
        k: {**_UL2_DEFAULT_PARAMS[k], **(params or {}).get(k, {})}
        for k in _UL2_DEFAULT_PARAMS
    }
    bad_keys = {
        k: sorted(set((params or {}).get(k, {})) - set(_UL2_DEFAULT_PARAMS[k]))
        for k in (params or {})
        if set((params or {}).get(k, {})) - set(_UL2_DEFAULT_PARAMS.get(k, {}))
    }
    if bad_keys:
        raise ValueError(f"unknown per-denoiser params: {bad_keys}")
    order = sorted(k for k, v in rts.items() if v > 0)
    cum = []
    acc = 0.0
    for kname in order:
        acc += float(rts[kname])
        cum.append((kname, acc))
    s0 = int(sentinel_start)
    sd = int(seed)
    fs = tuple(int(x) for x in fim_sentinels)
    if len(set(fs)) != 3:
        raise ValueError(
            f"fim sentinel ids must be distinct (got {fim_sentinels})"
        )

    def _one(key, ids):
        u = _rng_for(sd, f"{key}:denoiser").random()
        chosen = order[-1]
        for kname, edge in cum:
            if u < edge:
                chosen = kname
                break
        if ids is None:
            return None, None, chosen
        if chosen == "s":
            i, t = _prefix_one(
                ids, key, sd, int(prm["s"]["min_prefix"])
            )
            return i, t, "s"
        if chosen == "fim":
            stream, sub = _fim_one(
                ids,
                key,
                sd,
                float(prm["fim"]["fim_rate"]),
                float(prm["fim"]["spm_rate"]),
                fs,
            )
            if stream is None:
                return None, None, "fim"
            return stream, None, f"fim:{sub}"
        p = prm[chosen]
        i, t = _corrupt_one(
            ids,
            key,
            sd,
            float(p["noise_density"]),
            float(p["mean_span_length"]),
            s0,
        )
        return i, t, chosen

    out_type = T.StructType(
        [
            T.StructField("inputs", T.ArrayType(T.IntegerType())),
            T.StructField("targets", T.ArrayType(T.IntegerType())),
            T.StructField("denoiser", T.StringType()),
        ]
    )

    @F.pandas_udf(out_type)
    def _mix(keys: pd.Series, ids: pd.Series) -> pd.DataFrame:
        rows = [_one(k, v) for k, v in zip(keys, ids)]
        return pd.DataFrame(
            {
                "inputs": [r[0] for r in rows],
                "targets": [r[1] for r in rows],
                "denoiser": [r[2] for r in rows],
            }
        )

    tmp = df.withColumn(
        "_ul", _mix(F.col(id_col).cast("string"), F.col(ids_col))
    )
    return tmp.select(
        *df.columns,
        F.col("_ul.inputs").alias(inputs_col),
        F.col("_ul.targets").alias(targets_col),
        F.col("_ul.denoiser").alias(denoiser_col),
    )
