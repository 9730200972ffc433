"""Property-based tests (hypothesis) for kernels and operator invariants.

Complements the oracle gate: the oracle proves Spark==DuckDB; these
prove both match the *mathematical* contract on arbitrary inputs.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gentropy_spark.functions.distributions import (
    chi2_isf_1df_col,
    norm_sf_col,
    probit_col,
)
from gentropy_spark.functions.stats import pvalue_from_neglog, split_pvalue
from gentropy_spark.operators.clumping import window_clump

# One shared strategy run per property keeps Spark round-trips bounded:
# generate a batch of values, evaluate them in one DataFrame.


@settings(max_examples=10, deadline=None)
@given(st.lists(st.floats(min_value=1e-12, max_value=1.0, exclude_max=False), min_size=1, max_size=30))
def test_pvalue_split_roundtrip(spark, ps):
    """split → recompose must reproduce p within mantissa rounding (3dp)."""
    df = spark.createDataFrame([(p,) for p in ps], ["p"])
    m, e = split_pvalue(F.col("p"))
    rows = df.select("p", m, e).collect()
    for r in rows:
        recomposed = r.p_mantissa * 10.0 ** r.p_exponent
        assert abs(recomposed - r.p) <= 0.0005 * 10.0 ** r.p_exponent
        assert 1.0 <= r.p_mantissa < 10.0 or (r.p_mantissa == 10.0)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.floats(min_value=0.01, max_value=300.0), min_size=1, max_size=30))
def test_pvalue_from_neglog_roundtrip(spark, nlps):
    df = spark.createDataFrame([(x,) for x in nlps], ["nlp"])
    m, e = pvalue_from_neglog(F.col("nlp"))
    for r in df.select("nlp", m, e).collect():
        assert abs(-(math.log10(r.p_mantissa) + r.p_exponent) - r.nlp) < 1e-6


@settings(max_examples=10, deadline=None)
@given(st.lists(st.floats(min_value=0.001, max_value=0.999), min_size=1, max_size=30))
def test_probit_monotone_and_symmetric(spark, ps):
    df = spark.createDataFrame([(p,) for p in sorted(set(ps))], ["p"])
    rows = df.select(
        "p",
        probit_col(F.col("p")).alias("z"),
        norm_sf_col(probit_col(F.col("p"))).alias("sf_of_z"),
        chi2_isf_1df_col(F.col("p")).alias("chi2"),
    ).collect()
    zs = [r.z for r in rows]
    assert zs == sorted(zs)  # monotone in p
    for r in rows:
        # norm_sf(probit(p)) == 1 - p (within kernel tolerance)
        assert abs(r.sf_of_z - (1.0 - r.p)) < 5e-6
        assert r.chi2 >= 0


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),  # pos
            st.floats(min_value=0.0, max_value=100.0),  # signif
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=2_000),
)
def test_window_clump_invariants(spark, points, window):
    """Invariants for any input: (1) cluster leads are at least one
    gap-boundary apart across clusters, (2) every point belongs to
    exactly one cluster, (3) the lead carries the cluster max signif."""
    data = [("s", "c", pos, i, sig) for i, (pos, sig) in enumerate(points)]
    df = spark.createDataFrame(
        data, ["study_id", "contig", "pos", "point_id", "signif"]
    )
    leads = window_clump(df, window=window).collect()
    assert sum(r.n_members for r in leads) == len(points)
    by_cluster = sorted(leads, key=lambda r: r.cluster_start)
    for a, b in zip(by_cluster, by_cluster[1:]):
        assert b.cluster_start - a.cluster_end > window  # separated clusters
    max_by_cluster = {}
    for pos, sig in points:
        for r in by_cluster:
            if r.cluster_start <= pos <= r.cluster_end:
                max_by_cluster.setdefault(r.cluster_seq, 0.0)
                max_by_cluster[r.cluster_seq] = max(
                    max_by_cluster[r.cluster_seq], sig
                )
    for r in leads:
        assert r.lead_signif == max_by_cluster[r.cluster_seq]
