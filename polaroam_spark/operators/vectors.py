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

The whitening model doubles as the OPQ-style rotation for product
quantization (Ge et al., CVPR 2013 use a learned rotation before PQ;
PCA-whitening is its classic closed-form initialization — decorrelate
+ equalize variance so subspace k-means quantizes isotropic
residuals).

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
    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("cannot fit whitening on an empty frame")
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
    # fixed reduce order => deterministic float sums
    partials.sort(key=lambda r: (r["n"], r["s"][0] if r["s"] else 0.0))
    n = sum(int(r["n"]) for r in partials)
    if n < 2:
        raise ValueError(f"need >= 2 vectors to fit whitening (got {n})")
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
    is one numpy matmul."""
    mean = np.asarray(model["mean"], dtype=np.float64)
    comp = np.asarray(model["components"], dtype=np.float64)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _proj(col: pd.Series) -> pd.Series:
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
