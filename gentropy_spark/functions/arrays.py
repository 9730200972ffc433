"""Array scoring kernels (SURVEY §2.A7).

Re-expresses gentropy's array helpers
(/root/reference/src/gentropy/common/spark.py:724
``calculate_harmonic_sum``) as Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Normalisation constant: sum_{k=1..1000} 1/k^2 (as in the reference).
HARMONIC_NORM = sum(1 / ((i + 1) ** 2) for i in range(1000))


def harmonic_sum(arr: Column) -> Column:
    """Σ_i sorted_desc(arr)[i] / i² / HARMONIC_NORM (i is 1-based).

    Left-to-right fold over the descending sort — same accumulation
    order as the DuckDB oracle's list_sum(list_transform(...)).
    """
    sorted_desc = F.sort_array(arr, asc=False)
    return F.aggregate(
        F.zip_with(
            sorted_desc,
            F.sequence(F.lit(1), F.size(arr)),
            lambda score, pos: score / (pos * pos),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.lit(HARMONIC_NORM)
