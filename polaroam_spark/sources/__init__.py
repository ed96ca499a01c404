from polaroam_spark.sources.avro import (
    read_avro,
    register_avro_source,
    write_avro,
)
from polaroam_spark.sources.io import (
    hash_uid,
    localize_timestamps,
    read_pings_csv,
    read_pings_parquet,
    users_with_min_days,
    write_bucketed_table,
    write_partitioned,
    write_sorted_partitioned,
)

__all__ = [
    "read_pings_parquet",
    "read_pings_csv",
    "localize_timestamps",
    "hash_uid",
    "users_with_min_days",
    "write_partitioned",
    "write_sorted_partitioned",
    "write_bucketed_table",
    "read_avro",
    "register_avro_source",
    "write_avro",
]
