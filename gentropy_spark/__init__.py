"""gentropy_spark — a PySpark-native statistical-genetics & data-pipeline engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of opentargets/gentropy (reference:
/root/reference), plus large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Design tenets:
- Declarative DataFrame plans; Catalyst does the physical planning.
- Column-expression kernels over UDFs; Pandas UDFs only where the
  semantics are genuinely iterative per-group.
- Every operator is a DataFrame -> DataFrame transform partitioned on
  high-cardinality keys; no driver-side collect in any hot path.
"""

from gentropy_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.6.0"
