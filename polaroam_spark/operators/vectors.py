"""Distributed linear algebra over embedding columns: PCA /
whitening for `array<float>` vectors.

Scale shape (the only one that survives 100 TB): the covariance of a
billion d-dim vectors is a ONE-PASS map-side partial aggregation —
each Arrow batch contributes (count, sum, X^T X), each partition one
(1 + d + d*d)-double row — followed by a driver-side reduce and a
d x d eigendecomposition (d is 64..4096 for real embedding tables;
the d^2 driver matrix is KBs..MBs). Projection back over the corpus
is a broadcast (k x d) matmul per Arrow batch. Nothing global ever
shuffles; the corpus is scanned exactly once per phase.

For product quantization use :func:`fit_pq_rotation`, NOT whitening:
PQ retrieval must preserve the caller's metric, so only an orthogonal
transform is legal — fit_pq_rotation is the OPQ non-parametric init
(Ge et al., CVPR 2013: PCA rotation + greedy eigenvalue allocation
balancing per-subspace variance products). Whitening rescales axes
(answers Mahalanobis queries) and is for feature normalization /
decorrelation ahead of scoring models.

Reference parity: the reference engine has no vector linear algebra
(reference core is trajectory analytics); this module is part of the
beyond-reference LLM-pipeline surface, same family as
operators/similarity.py.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _partial_moment_stats(vec_col: str, d: int):
    """mapInPandas kernel: one (n, sum, X^T X flattened) row per
    Arrow batch — the map-side combine of the covariance
    aggregation."""

    def gen(batches: "Iterator[pd.DataFrame]"):
        for pdf in batches:
            if pdf.empty:
                continue
            if pdf[vec_col].isna().any():
                raise ValueError(
                    f"NULL vector in '{vec_col}': moment fitting "
                    "has no NULL semantics — filter "
                    f"(df.filter(F.col('{vec_col}').isNotNull())) "
                    "before fitting"
                )
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if x.shape[1] != d:
                raise ValueError(
                    f"ragged vectors: expected dim {d}, saw {x.shape[1]}"
                )
            yield pd.DataFrame(
                {
                    "n": [np.int64(x.shape[0])],
                    "s": [x.sum(axis=0)],
                    "g": [(x.T @ x).ravel()],
                }
            )

    return gen


def _fit_moments(df: DataFrame, vec_col: str):
    """Shared one-pass fit: (n, mean, eigvals desc, eigvecs
    sign-canonicalized) of the column's covariance."""
    # dimension probe skips NULL vectors (size(NULL) is NULL) so a
    # NULL in row one doesn't poison it; NULLs reaching the kernel
    # still raise the loud ValueError below (r12 ADVICE)
    first = (
        df.select(F.size(F.col(vec_col)).alias("d"))
        .filter(F.col("d").isNotNull())
        .first()
    )
    if first is None:
        raise ValueError(
            "cannot fit on an empty frame (no non-NULL vectors)"
        )
    d = int(first["d"])
    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("g", T.ArrayType(T.DoubleType())),
        ]
    )
    partials = (
        df.select(vec_col)
        .mapInPandas(_partial_moment_stats(vec_col, d), schema=schema)
        .collect()  # bounded: one row per Arrow batch, (1+d+d^2) doubles
    )
    # fixed reduce order => deterministic float sums. The key must
    # be a TOTAL order over partial rows (r13 self-review): ties on
    # (n, s[0]) — replicated shards, symmetric data — would leave
    # the float accumulation order at collect order, which varies
    # across runs; the full tuples break every tie that matters
    # (fully identical partials commute exactly).
    partials.sort(
        key=lambda r: (r["n"], tuple(r["s"]), tuple(r["g"]))
    )
    n = sum(int(r["n"]) for r in partials)
    if n < 2:
        raise ValueError(f"need >= 2 vectors to fit (got {n})")
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in partials:
        s += np.asarray(r["s"])
        g += np.asarray(r["g"]).reshape(d, d)
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    cov = (cov + cov.T) / 2.0  # exact symmetry for eigh
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1]
    eigvals, eigvecs = eigvals[order], eigvecs[:, order]
    # canonical sign: largest-|entry| of each eigenvector positive
    flip = np.sign(
        eigvecs[np.argmax(np.abs(eigvecs), axis=0), np.arange(d)]
    )
    flip[flip == 0] = 1.0
    eigvecs = eigvecs * flip
    return n, d, mean, eigvals, eigvecs


def fit_pca_whitening(
    df: DataFrame,
    vec_col: str = "embedding",
    k: "int | None" = None,
    *,
    eps: float = 1e-9,
    zca: bool = False,
) -> dict:
    """Fit a PCA-whitening model over an ``array<float|double>``
    column: returns ``{"mean": (d,), "components": (k, d),
    "eigvals": (k,), "n": int, "explained": (k,)}`` —
    ``components`` already includes the ``(eigval + eps)^-1/2``
    scaling, so projection is just ``(x - mean) @ components.T``.

    ``zca=True`` rotates back into the input basis
    (``V L^-1/2 V^T``, requires ``k is None``) — the variant that
    stays closest to the original features (Bell & Sejnowski's
    zero-phase whitening); default PCA whitening orders output
    dimensions by explained variance, which is what a PQ/OPQ
    pipeline wants.

    Determinism: batch partials are reduced on the driver in sorted
    order, the eigendecomposition of the d x d covariance is
    deterministic, and each eigenvector's sign is canonicalized
    (largest-|entry| made positive), so the model is a pure function
    of the data for a given partitioning.
    """
    n, d, mean, eigvals, eigvecs = _fit_moments(df, vec_col)
    if zca:
        if k is not None:
            raise ValueError("zca=True requires k=None (square model)")
        scale = 1.0 / np.sqrt(np.maximum(eigvals, 0.0) + eps)
        components = eigvecs @ np.diag(scale) @ eigvecs.T
        out_vals = eigvals
    else:
        kk = d if k is None else int(k)
        if not 1 <= kk <= d:
            raise ValueError(f"k must be in [1, {d}] (got {k})")
        scale = 1.0 / np.sqrt(np.maximum(eigvals[:kk], 0.0) + eps)
        components = (eigvecs[:, :kk] * scale).T  # (k, d)
        out_vals = eigvals[:kk]
    total_var = float(np.maximum(eigvals, 0.0).sum())
    explained = (
        np.maximum(out_vals, 0.0) / total_var
        if total_var > 0
        else np.zeros_like(out_vals)
    )
    return {
        "mean": mean,
        "components": np.asarray(components),
        "eigvals": np.asarray(out_vals),
        "explained": explained,
        "n": n,
        "zca": bool(zca),
    }


def apply_whitening(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "whitened",
) -> DataFrame:
    """Project every vector through a fitted whitening model:
    ``out = (x - mean) @ components.T``. The (k, d) matrix and mean
    ride to executors inside the serialized pandas UDF (KBs..MBs —
    broadcast semantics without an explicit join); each Arrow batch
    is one numpy matmul. NULL in → NULL out."""
    mean = np.asarray(model["mean"], dtype=np.float64)
    comp = np.asarray(model["components"], dtype=np.float64)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _proj(col: pd.Series) -> pd.Series:
        # NULL in -> NULL out (the repo's vector-op convention; a
        # NULL inside np.stack dies with an opaque shape error).
        # Positional reassembly, NOT a masked Series assignment:
        # `out[~mask] = list(rows)` is an invalid pandas masked
        # assignment for 2-D row lists (raises on mixed batches, or
        # silently assigns scalars when the row count equals d —
        # r13 self-review, reproduced live).
        mask = col.isna().to_numpy()
        if mask.any():
            res: "list" = [None] * len(col)
            if (~mask).any():
                x = np.stack(
                    col[~mask].to_numpy()
                ).astype(np.float64)
                vals = list((x - mean) @ comp.T)
                j = 0
                for pos in range(len(col)):
                    if not mask[pos]:
                        res[pos] = vals[j]
                        j += 1
            return pd.Series(res, index=col.index, dtype=object)
        x = np.stack(col.to_numpy()).astype(np.float64)
        y = (x - mean) @ comp.T
        return pd.Series(list(y))

    return df.withColumn(out_col, _proj(F.col(vec_col)))


def pca_whiten(
    df: DataFrame,
    vec_col: str = "embedding",
    k: "int | None" = None,
    out_col: str = "whitened",
    *,
    eps: float = 1e-9,
    zca: bool = False,
) -> "tuple[DataFrame, dict]":
    """Fit + apply in one call; returns ``(frame_with_out_col,
    model)``. See :func:`fit_pca_whitening` for the scale shape and
    determinism contract."""
    model = fit_pca_whitening(df, vec_col, k, eps=eps, zca=zca)
    return apply_whitening(df, model, vec_col, out_col), model


def _eigenvalue_allocation(eigvals: np.ndarray, m: int) -> list:
    """OPQ non-parametric init (Ge et al., CVPR 2013 §4): permute
    principal directions so each of the ``m`` contiguous subspaces
    gets (approximately) the same variance PRODUCT — greedy: walk
    eigenvalues descending, assign each to the unfilled subspace
    with the smallest log-product so far. Returns the permutation
    (output position -> principal-direction index)."""
    d = len(eigvals)
    per = d // m
    floor = max(float(np.max(eigvals)), 1.0) * 1e-12
    lv = np.log(np.maximum(np.asarray(eigvals, dtype=np.float64), floor))
    # CENTER the logs (r12 code review): comparing raw log-product
    # sums across buckets with different fill counts is scale-
    # DEPENDENT — with every eigenvalue < 1 (any l2-normalized
    # corpus) all logs are negative, the fullest bucket always looks
    # smallest, and the greedy degenerates to the identity
    # permutation (no balancing at all). Subtracting the mean log
    # makes each item's contribution zero-mean, so the comparison is
    # fair at any fill count and the allocation is invariant to
    # scaling the spectrum by any constant.
    lv = lv - lv.mean()
    logs = [0.0] * m
    fill: "list[list[int]]" = [[] for _ in range(m)]
    for i in range(d):
        cands = [j for j in range(m) if len(fill[j]) < per]
        j = min(cands, key=lambda j: logs[j])
        logs[j] += float(lv[i])
        fill[j].append(i)
    return [i for bucket in fill for i in bucket]


def _codebook_tensor(codebooks, m: int, d_sub: int):
    """Collect a trained (_m, _code, _cvec) codebook frame into a
    dense (m, k, d_sub) numpy tensor (bounded: M x K x d_sub doubles,
    KBs by construction). Gaps from emptied Lloyd cells are +inf so a
    phantom code can never win an argmin."""
    rows = codebooks.orderBy("_m", "_code").collect()
    k = max(int(r["_code"]) for r in rows) + 1
    books = np.full((m, k, d_sub), np.inf, dtype=np.float64)
    for r in rows:
        books[int(r["_m"]), int(r["_code"])] = np.asarray(
            r["_cvec"], dtype=np.float64
        )
    return books


def _reconstruction_moments(rotated: DataFrame, vec_col: str, books):
    """One mapInPandas pass over the ROTATED corpus: per Arrow batch,
    PQ-encode against the broadcast codebook tensor, reconstruct, and
    emit the partials OPQ's rotation step needs — (n, sum(y yhat^T)
    flattened, squared quantization error). One (1 + d*d + 1)-double
    row per batch; driver reduces in sorted order (the module's
    determinism convention)."""
    m, _, d_sub = books.shape
    d = m * d_sub

    def gen(batches: "Iterator[pd.DataFrame]"):
        for pdf in batches:
            if pdf.empty:
                continue
            y = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yhat = np.empty_like(y)
            for mi in range(m):
                sl = y[:, mi * d_sub : (mi + 1) * d_sub]
                d2 = (
                    (sl[:, None, :] - books[mi][None, :, :]) ** 2
                ).sum(axis=-1)
                yhat[:, mi * d_sub : (mi + 1) * d_sub] = books[mi][
                    d2.argmin(axis=1)
                ]
            yield pd.DataFrame(
                {
                    "n": [np.int64(len(y))],
                    "g": [(y.T @ yhat).ravel()],
                    "err": [float(((y - yhat) ** 2).sum())],
                }
            )

    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("g", T.ArrayType(T.DoubleType())),
            T.StructField("err", T.DoubleType()),
        ]
    )
    parts = rotated.select(vec_col).mapInPandas(
        gen, schema=schema
    ).collect()
    # total-order key: identical-(n, g[0]) partials must still sort
    # deterministically (see _fit_moments)
    parts.sort(key=lambda r: (r["n"], tuple(r["g"]), r["err"]))
    n = sum(int(r["n"]) for r in parts)
    g = np.zeros((d, d))
    err = 0.0
    for r in parts:
        g += np.asarray(r["g"]).reshape(d, d)
        err += float(r["err"])
    return n, g, err


def fit_pq_rotation_iterative(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_subspaces: int = 8,
    codes_per_subspace: int = 64,
    iterations: int = 3,
    kmeans_iterations: int = 2,
) -> dict:
    """FULL OPQ (Ge et al., CVPR 2013 §5, the non-parametric
    solution): start from :func:`fit_pq_rotation`'s eigenvalue-
    allocation init, then alternate (a) PQ codebook training in the
    current rotated space with (b) the orthogonal-Procrustes rotation
    update — ``C = Σ x_c ŷᵀ = Rᵀ Σ y ŷᵀ``, SVD ``C = U S Vᵀ``,
    ``R ← V Uᵀ`` — each step non-increasing in the true objective
    ``Σ‖R x_c − ŷ‖²`` given the other (codebook reseeding between
    iterations can wiggle, which is why the gate pins final-vs-init
    error, not per-step monotonicity).

    Distributed cost, stated honestly: each iteration is the
    codebook train (two skinny shuffles, see
    :func:`~polaroam_spark.operators.similarity.train_pq_codebooks`)
    plus ONE mapInPandas corpus pass accumulating the (d x d)
    cross-moment — everything the driver touches is d², M·K·d_sub,
    or per-batch partial rows, never the corpus. ``iterations``
    full passes is the price of the alternation; the init-only
    :func:`fit_pq_rotation` stays the one-pass default and this is
    the accuracy upgrade when the extra scans are worth it. Measured
    (tests/test_vectors.py): on a clustered NON-Gaussian fixture
    (three differently-oriented low-rank clusters — the case Ge et
    al. §4.3 show the init cannot solve) quantization MSE drops a
    further 13-21% below the init over 4 iterations; on
    near-Gaussian corpora the init is already near-optimal and the
    iteration buys little — check ``history`` before paying for more
    passes.

    Returns the :func:`fit_pca_whitening`-shaped model (``mean``,
    orthonormal ``components`` = the final R, ``n``) plus
    ``history``: per-iteration ``(n, mse)`` of the quantization
    error measured BEFORE that iteration's rotation update — so
    ``history[0]`` is the init-only error and ``history[-1]`` the
    error after the last codebook fit. Train final serving codebooks
    on the returned rotation (the last rotation update makes the
    loop's internal codebooks stale by one step — same compose
    contract as :func:`fit_pq_rotation`).
    """
    from polaroam_spark.operators.similarity import (
        train_pq_codebooks,
    )

    m = int(num_subspaces)
    model = fit_pq_rotation(df, vec_col, m)
    mean = np.asarray(model["mean"], dtype=np.float64)
    R = np.asarray(model["components"], dtype=np.float64)
    d = len(mean)
    d_sub = d // m
    history: "list[tuple[int, float]]" = []
    for _ in range(int(iterations)):
        rot_model = {"mean": mean, "components": R}
        rotated = apply_whitening(
            df.select(id_col, vec_col), rot_model, vec_col, "_rot"
        ).select(id_col, "_rot")
        books_df = train_pq_codebooks(
            rotated,
            data_id=id_col,
            vec_col="_rot",
            num_subspaces=m,
            codes_per_subspace=int(codes_per_subspace),
            kmeans_iterations=int(kmeans_iterations),
        )
        books = _codebook_tensor(books_df, m, d_sub)
        n, g, err = _reconstruction_moments(rotated, "_rot", books)
        history.append((n, err / max(n, 1)))
        c = R.T @ g  # Σ x_c ŷᵀ in the INPUT basis
        u, _s, vt = np.linalg.svd(c)
        R = (u @ vt).T  # argmax_R tr(R C) = V Uᵀ
    return {
        "mean": mean,
        "components": R,
        "n": int(model["n"]),
        "rotation": True,
        "num_subspaces": m,
        "history": history,
    }


def fit_pq_rotation(
    df: DataFrame,
    vec_col: str = "embedding",
    num_subspaces: int = 8,
) -> dict:
    """METRIC-PRESERVING rotation for product quantization — the OPQ
    non-parametric initialization (Ge, He, Ke, Sun, "Optimized
    Product Quantization", CVPR 2013): center, rotate into the PCA
    basis (orthogonal, so every pairwise L2 distance is EXACTLY
    preserved — unlike whitening, which rescales axes and answers
    Mahalanobis queries instead of the caller's), then permute the
    principal directions so each of PQ's contiguous dimension slices
    receives a balanced variance product (greedy eigenvalue
    allocation). Decorrelated, balance-allocated subspaces are the
    independence assumption PQ's per-subspace k-means actually
    relies on; on correlated corpora this is the difference between
    codebooks that quantize structure and codebooks that quantize
    noise (measured, tests/test_vectors.py correlated fixture:
    recall@10 raw 0.61-0.71 vs rotated 0.81-0.85 across seeds at the
    same codebook budget; a rotation cannot hurt an isotropic corpus
    — it is a change of orthonormal basis).

    Compose: ``rot = apply_whitening(corpus, model)`` (the same
    projection kernel — the model's ``components`` are orthonormal
    rows) → ``train_pq_codebooks`` / ``pq_encode`` / ``pq_topk`` on
    the rotated column, and rotate QUERIES through the same model.
    ``num_subspaces`` must divide the dimension (same contract as
    ``train_pq_codebooks``).
    """
    n, d, mean, eigvals, eigvecs = _fit_moments(df, vec_col)
    m = int(num_subspaces)
    if m < 1 or d % m != 0:
        raise ValueError(
            f"num_subspaces must divide dim {d} (got {m})"
        )
    perm = _eigenvalue_allocation(eigvals, m)
    components = eigvecs[:, perm].T  # orthonormal rows, (d, d)
    total = float(np.maximum(eigvals, 0.0).sum())
    out_vals = eigvals[perm]
    return {
        "mean": mean,
        "components": components,
        "eigvals": out_vals,
        "explained": (
            np.maximum(out_vals, 0.0) / total
            if total > 0
            else np.zeros_like(out_vals)
        ),
        "n": n,
        "rotation": True,
        "num_subspaces": m,
    }


def embedding_stats(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension data card for an embedding column:
    ``[dim, n, mean, stddev, vmin, vmax]`` — the validation pass a
    similarity pipeline runs before building indexes (a collapsed
    dimension shows as stddev ~0, an unnormalized ingest as wild
    min/max, a truncated batch as a short ``n`` on the tail dims).
    Ragged vectors are visible rather than an error: a dim that only
    some vectors reach has a smaller ``n``. NULL vectors skipped.

    One ``posexplode`` + ``groupBy(dim)`` — the shuffle carries at
    most one row per (dimension x partition) after map-side partial
    aggregation, independent of row count; values cast to double
    before aggregating so float32 inputs accumulate in double.
    Cross-engine float agreement for mean/stddev is at the rounded
    certification level (summation order differs): round before
    comparing engines.
    """
    v = F.col(vec_col)
    ex = df.filter(v.isNotNull()).select(
        F.posexplode(v).alias("dim", "_x")
    )
    x = F.col("_x").cast("double")
    return (
        ex.groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            F.avg(x).alias("mean"),
            F.stddev_samp(x).alias("stddev"),
            F.min(x).alias("vmin"),
            F.max(x).alias("vmax"),
        )
        .orderBy("dim")
    )


def embedding_norm_stats(
    df: DataFrame, vec_col: str = "embedding", unit_tol: float = 1e-3
) -> DataFrame:
    """One-row L2-norm card: ``[n_vectors, n_null, mean_norm,
    min_norm, max_norm, frac_unit]`` where ``frac_unit`` is the
    fraction of non-null vectors within ``unit_tol`` of unit norm —
    the "is this corpus actually normalized" check cosine pipelines
    should run before trusting dot products. Pure JVM ``aggregate``
    fold per row + one global aggregation, no UDF, no shuffle beyond
    the single-row combine."""
    v = F.col(vec_col)
    norm = F.sqrt(
        F.aggregate(
            v,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    withn = df.select(v.alias("_v"), norm.alias("_norm"))
    nn = F.col("_v").isNotNull()
    unit = (
        F.abs(F.col("_norm") - 1.0) <= F.lit(float(unit_tol))
    ) & nn
    return withn.agg(
        F.count("*").alias("n_vectors"),
        F.sum((~nn).cast("long")).alias("n_null"),
        F.avg(F.when(nn, F.col("_norm"))).alias("mean_norm"),
        F.min(F.when(nn, F.col("_norm"))).alias("min_norm"),
        F.max(F.when(nn, F.col("_norm"))).alias("max_norm"),
        (
            F.sum(unit.cast("long"))
            / F.sum(nn.cast("long")).cast("double")
        ).alias("frac_unit"),
    )
