from polaroam_spark.operators.stops import detect_stops, stop_medians
from polaroam_spark.operators.clustering import (
    cluster_stops_dbscan,
    cluster_medoids,
)
from polaroam_spark.operators.homework import (
    prepare_labeling,
    detect_home,
    detect_work,
    home_work_wide,
)
from polaroam_spark.operators.postprocess import compute_intervals

__all__ = [
    "detect_stops",
    "stop_medians",
    "cluster_stops_dbscan",
    "cluster_medoids",
    "prepare_labeling",
    "detect_home",
    "detect_work",
    "home_work_wide",
    "compute_intervals",
]
