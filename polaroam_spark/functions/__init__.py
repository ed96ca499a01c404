from polaroam_spark.functions.distance import (
    euclidean_m,
    grid_snap,
    haversine_m,
    zorder_key,
)
from polaroam_spark.functions.datetimes import (
    epoch_seconds,
    iso_weekday,
    local_time,
    date_trunc_str,
)
from polaroam_spark.functions.vectors import (
    cosine_similarity,
    dequantize_int8,
    dot_product,
    l2_norm,
    l2_normalize,
    make_scorer,
    quantize_int8,
)

__all__ = [
    "haversine_m",
    "euclidean_m",
    "grid_snap",
    "zorder_key",
    "iso_weekday",
    "epoch_seconds",
    "local_time",
    "date_trunc_str",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "l2_normalize",
    "make_scorer",
    "quantize_int8",
    "dequantize_int8",
]
