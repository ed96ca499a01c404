"""polaroam_spark — a PySpark-native mobility-analytics engine.

Re-expresses the capabilities of the reference engine (ollin18/PolaRoam,
a Polars-based stop-detection library; see SURVEY.md) as idiomatic Spark
DataFrame pipelines, designed for 100 TB scale:

- stop detection (per-user sessionization) as pure window expressions
  (reference: utils.py:350-413) — no UDF in the hot path;
- spatial clustering of stops (DBSCAN eps/min_samples=2, reference
  utils.py:203-215) both as an Arrow-batched per-user grouped UDF and as
  a fully distributed grid-join + connected-components plan;
- home / work labeling (reference models.py:271-453) as native
  aggregations + broadcast label joins;
- plus large-scale data-pipeline operators beyond the reference:
  dedup (exact / MinHash-LSH / SimHash / embedding), similarity
  search (LSH / IVF / PQ / OPQ), text analysis and curation (rule,
  LM, DSIR, and trained-classifier quality filters), byte-level BPE
  tokenization and sequence packing, streaming variants, and
  multimodal (image/audio) near-dup plumbing.
"""

from polaroam_spark.cache import unpersist_caches
from polaroam_spark.session import get_spark
from polaroam_spark.api import StopDetect, HWEstimate

__all__ = ["get_spark", "StopDetect", "HWEstimate", "unpersist_caches"]

__version__ = "0.1.0"
