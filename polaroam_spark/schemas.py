"""Canonical schemas (SURVEY.md §1).

The reference packs the (lat, lon) pair of a stop event into a
fixed-size ``Array(Float64, 2)`` column ``event_maps``
(reference models.py:133-138); Spark has no fixed-size array type, so
we keep two double columns — an intentional, documented divergence.
"""

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Raw trajectory input (reference models.py:27-38).
PINGS = StructType(
    [
        StructField("uid", StringType()),
        StructField("latitude", DoubleType()),
        StructField("longitude", DoubleType()),
        StructField("timestamp", LongType()),  # unix seconds
    ]
)

PINGS_WITH_ERROR = StructType(
    PINGS.fields + [StructField("error", DoubleType())]
)

# fit_predict output (reference models.py:133-138).
STOP_EVENTS = StructType(
    [
        StructField("uid", StringType()),
        StructField("stop_events", LongType()),  # -1 = transit/noise
        StructField("latitude", DoubleType()),
        StructField("longitude", DoubleType()),
        StructField("timestamp", LongType()),
    ]
)

# Per-event medians (reference models.py:169-176).
STOP_MEDIANS = StructType(
    [
        StructField("uid", StringType()),
        StructField("stop_events", LongType()),
        StructField("latitude", DoubleType()),
        StructField("longitude", DoubleType()),
        StructField("start_timestamp", LongType()),
        StructField("end_timestamp", LongType()),
    ]
)

# Clustered stops + medoid stats (reference models.py:209-217, 239-244).
STOP_LOCATIONS = StructType(
    STOP_MEDIANS.fields
    + [
        StructField("stop_locations", LongType()),  # -1 = noise
        StructField("cluster_counts", LongType()),
        StructField("cluster_latitude", DoubleType()),
        StructField("cluster_longitude", DoubleType()),
    ]
)

# Embeddings table (beyond-reference similarity operators).
EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
        StructField("label", IntegerType()),
    ]
)
