"""Vector expressions over array<float|double> columns — native
higher-order functions (zip_with / aggregate), no UDFs, so similarity
scoring stays JVM-side and codegen-friendly.

Beyond-reference capability (BASELINE.json north star): the reference
has no embedding operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ accumulated in double, left-to-right."""
    prods = F.zip_with(
        _col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _col(a),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
