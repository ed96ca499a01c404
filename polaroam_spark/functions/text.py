"""Text expressions for the large-scale data-pipeline operators —
tokenization, shingling, and portable hashing. All native Column
expressions (split / transform / aggregate higher-order functions);
nothing here leaves the JVM.

Portable hashing: dedup/minhash operators need a hash both Spark and
the DuckDB correctness oracle can compute identically. ``md5`` is
byte-identical across engines, so ``portable_hash64`` folds the first
15 hex digits of an md5 (60 bits) into a non-negative long via
base-16 → base-10 conversion — expressible as
``CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)`` in DuckDB.
(``xxhash64``/``hash`` would be faster but are Spark-private
algorithms; the few extra ns/row of md5 is the price of an
oracle-checkable dedup path. Swap to ``F.xxhash64`` via
``fast_hash64`` where cross-engine parity is not required.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: Column | str) -> Column:
    """Lowercased whitespace tokens, empties dropped."""
    return F.filter(
        F.split(F.lower(_col(text)), r"\s+"), lambda t: t != ""
    )


def word_shingles(
    toks: Column | str, k: int = 3, *, assume_no_nulls: bool = False
) -> Column:
    """k-word shingles (space-joined) from a token array; a document
    shorter than k tokens yields its whole token sequence as one
    shingle. NULL ELEMENTS in a caller-supplied array are dropped
    before shingling (shingles are taken over the non-null token
    sequence) — the r11 zip_with rewrite silently switched from
    concat_ws (skips NULLs inside a window) to concat (propagates
    NULL into the shingle); neither positional-skip nor
    NULL-poisoning is defensible public API over arbitrary arrays,
    so the sequence-filter rule is now pinned (r11 ADVICE).
    ``assume_no_nulls=True`` skips the guard filter — it costs ~25%
    on the shingle micro-bench (11.4 s vs 9.1 s / 48M shingles), so
    internal callers that feed :func:`tokens` output (provably
    null-free) opt out; arbitrary public input must not.

    Built as a zip_with chain over k bulk slices — JVM-side,
    no UDF, and ~5x cheaper than the per-position
    sequence+transform+slice form it replaces (r11 micro-bench,
    .scratch/probe_shingles.py: 48M 3-shingles in 9.9 s vs 51.3 s,
    identical output checksum): the per-position form re-slices the
    token array once per OUTPUT shingle, where the chain slices k
    times total and zips elementwise. This expression sits under
    every shingle consumer (MinHash dedup, fuzzy join, n-gram
    decontamination), evaluated once per corpus scan — it is the
    hot path.
    """
    toks = _col(toks)
    if not assume_no_nulls:
        toks = F.filter(toks, lambda t: t.isNotNull())
    n = F.array_size(toks)
    m = F.greatest(n - (k - 1), F.lit(0))
    acc = F.slice(toks, 1, m)
    for j in range(2, int(k) + 1):
        acc = F.zip_with(
            acc,
            F.slice(toks, j, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(n >= k, acc).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def portable_hash64(value: Column | str, seed: int | Column = 0) -> Column:
    """Deterministic non-negative 60-bit hash reproducible in DuckDB:
    ``conv(substr(md5(seed || ':' || value), 1, 15), 16, 10)``.
    """
    seed_col = F.lit(seed) if isinstance(seed, int) else seed
    payload = F.concat_ws(":", seed_col.cast("string"), _col(value))
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


def fast_hash64(value: Column | str, seed: int = 42) -> Column:
    """JVM-native xxhash64 — the scale path where the oracle does not
    need to reproduce the hash (bucketing, salting, fingerprints that
    are only compared within Spark)."""
    return F.xxhash64(_col(value), F.lit(seed))


def minhash_signature(
    shingles: Column | str, num_hashes: int = 16, portable: bool = False
) -> Column:
    """MinHash signature: for each of ``num_hashes`` seeds, the min
    hash over the shingle set. array<long> of length ``num_hashes``;
    row-wise min-reduction happens JVM-side via transform + array_min.

    Default hash is ``xxhash64`` seeded per signature row — the fast
    JVM-native path (~10x cheaper than md5). ``portable=True`` swaps
    in the md5-based :func:`portable_hash64` when a DuckDB oracle must
    reproduce the signature bit-for-bit.
    """
    sh = _col(shingles)
    if portable:
        hash_fn = lambda t, s: portable_hash64(t, s)  # noqa: E731
    else:
        hash_fn = lambda t, s: F.xxhash64(t, s)  # noqa: E731
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda s: F.array_min(
            F.transform(sh, lambda t: hash_fn(t, s))
        ),
    )


def band_hashes(signature: Column | str, bands: int) -> Column:
    """LSH band keys: split the signature into ``bands`` contiguous
    slices and hash each slice to one bucket key. Two documents whose
    signatures agree on any full band share a band key.
    array<struct<band:int, bucket:long>> — explode it, then equi-join
    on (band, bucket): bucketed candidate generation, never a cross
    join.
    """
    sig = _col(signature)
    n = F.array_size(sig)
    # ceil so every signature element lands in some band (floor would
    # silently ignore the tail when bands doesn't divide the length;
    # slice past the end just yields a shorter final band). An empty
    # band (bands > length) would hash every doc to one bucket and
    # degenerate the band join into an all-pairs product — guard.
    rows_per_band = F.ceil(n / bands).cast("int")
    band_slice = lambda b: F.slice(  # noqa: E731
        sig, b * rows_per_band + 1, rows_per_band
    )
    return F.filter(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.cast("int").alias("band"),
                F.when(
                    F.array_size(band_slice(b)) > 0,
                    portable_hash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                band_slice(b), lambda v: v.cast("string")
                            ),
                        ),
                        seed=b,
                    ),
                ).alias("bucket"),
            ),
        ),
        lambda s: s["bucket"].isNotNull(),
    )


def ngram_set(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams (for exact Jaccard verification)."""
    return F.array_distinct(word_shingles(tokens(text), n, assume_no_nulls=True))


def jaccard(a: Column | str, b: Column | str) -> Column:
    """Exact Jaccard similarity of two array columns (treated as
    sets): |A∩B| / |A∪B|, all JVM-side array ops."""
    a, b = _col(a), _col(b)
    inter = F.array_size(F.array_intersect(a, b)).cast("double")
    union = F.array_size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))
