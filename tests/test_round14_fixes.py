"""Round-14 fixes: exact TreeSHAP explanations, the coloc
beta-ratio directionality column, the embedding_dup_pairs quadratic
guard, and the bench native-sums symmetry rewriter."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# --- l2g_explain: exact interventional TreeSHAP ---------------------------
def _eval_ast(node, x):
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "ind":
        return 1.0 if x[node[1]] <= node[2] else 0.0
    a, b = _eval_ast(node[1], x), _eval_ast(node[2], x)
    return a + b if kind == "add" else a - b if kind == "sub" else a * b


def test_shap_local_accuracy_axiom():
    """sum(shap) + base == margin EXACTLY (Shapley efficiency) — per
    tree the coalition values telescope, so the identity must hold to
    float tolerance for ANY input, including out-of-range values."""
    from gentropy_spark.operators.l2g_model import (
        FEATURES,
        TREES,
        _eval_tree,
        shap_ast,
    )

    phis, base = shap_ast()
    rng = np.random.default_rng(7)
    for _ in range(100):
        x = {f: float(rng.uniform(-0.5, 1.5)) for f in FEATURES}
        cols = {f: np.array([x[f]]) for f in FEATURES}
        margin = sum(_eval_tree(t, cols, 1)[0] for t in TREES)
        total = base + sum(_eval_ast(a, x) for a in phis.values())
        assert abs(total - margin) < 1e-9


def test_shap_matches_bruteforce_on_synthetic_background():
    """Closed-form phi == brute-force Shapley over an explicit
    background matrix, with the frozen tables recomputed from that
    matrix — validates the coalition-value algebra (incl. the joint
    background terms) independently of the frozen constants."""
    import itertools
    import math

    from gentropy_spark.operators import l2g_model as M

    rng = np.random.default_rng(11)
    n_bg = 400
    bg = {f: rng.uniform(0, 1.2, n_bg) for f in M.FEATURES}
    # Recompute the frozen tables from this synthetic background.
    cdf = {
        (g, t): float((bg[g] <= t).mean()) for (g, t) in M.BG_CDF
    }
    joint = {
        ((g1, t1), (g2, t2)): float(
            ((bg[g1] <= t1) & (bg[g2] <= t2)).mean()
        )
        for ((g1, t1), (g2, t2)) in M.BG_JOINT
    }
    old_cdf, old_joint = M.BG_CDF, M.BG_JOINT
    M.BG_CDF, M.BG_JOINT = cdf, joint
    try:
        phis, base = M.shap_ast()
    finally:
        M.BG_CDF, M.BG_JOINT = old_cdf, old_joint

    mat = np.column_stack([bg[f] for f in M.FEATURES])
    fidx = {f: i for i, f in enumerate(M.FEATURES)}

    def margin_rows(m):
        cols = {f: m[:, fidx[f]] for f in M.FEATURES}
        return sum(M._eval_tree(t, cols, len(m)) for t in M.TREES)

    used = sorted(phis)
    fact = math.factorial
    x = mat[rng.integers(n_bg)]
    n = len(used)
    for g in used:
        tot = 0.0
        others = [u for u in used if u != g]
        for k in range(n):
            w = fact(k) * fact(n - 1 - k) / fact(n)
            for s in itertools.combinations(others, k):
                m1, m0 = mat.copy(), mat.copy()
                for f in s:
                    m1[:, fidx[f]] = x[fidx[f]]
                    m0[:, fidx[f]] = x[fidx[f]]
                m1[:, fidx[g]] = x[fidx[g]]
                tot += w * (margin_rows(m1).mean() - margin_rows(m0).mean())
        mine = _eval_ast(phis[g], {f: float(x[fidx[f]]) for f in M.FEATURES})
        assert abs(mine - tot) < 1e-9, (g, mine, tot)
    assert abs(base - margin_rows(mat).mean()) < 1e-9


def test_l2g_explain_sums_to_margin_on_real_rows(spark, sf_dir):
    from gentropy_spark.operators.l2g_model import shap_columns
    from gentropy_spark.plans.l2g import q_l2g_features, q_l2g_explain

    phis, base = shap_columns()
    feats = q_l2g_features(spark, sf_dir)
    from gentropy_spark.operators.l2g_model import FEATURES, margin_udf

    margin = margin_udf()(*[F.col(c) for c in FEATURES])
    total = F.lit(base)
    for g in sorted(phis):
        total = total + phis[g]
    bad = feats.select(
        (F.abs(total - margin) > 1e-9).alias("bad")
    ).filter("bad").count()
    assert bad == 0
    # The registry key carries every column the schema promises.
    cols = set(q_l2g_explain(spark, sf_dir).columns)
    assert {"margin", "shap_base"} <= cols
    assert any(c.startswith("shap_") and c != "shap_base" for c in cols)


# --- coloc directionality column -------------------------------------------
def test_coloc_outputs_beta_ratio_sign_avg(spark, sf_dir):
    from gentropy_spark.plans.genomics import q_coloc, q_ecaviar

    for fn in (q_coloc, q_ecaviar):
        df = fn(spark, sf_dir)
        assert "beta_ratio_sign_avg" in df.columns
        rows = df.select("beta_ratio_sign_avg").limit(50).collect()
        for r in rows:
            v = r[0]
            assert v is None or -1.0 <= v <= 1.0


# --- embedding_dup_pairs quadratic guard ------------------------------------
def test_embedding_dup_pairs_guards_unblocked_crossjoin(spark, sf_dir):
    from gentropy_spark.operators.similarity import embedding_dup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError, match="allow_quadratic"):
        embedding_dup_pairs(emb, block_col=None)
    # Explicit opt-in still works for deliberately tiny inputs.
    tiny = emb.limit(20)
    out = embedding_dup_pairs(
        tiny, block_col=None, allow_quadratic=True, min_cosine=-1.0
    )
    assert out.count() > 0


# --- bench native-sums symmetry rewriter ------------------------------------
def test_to_native_sums_rewrites_parity_casts():
    import bench

    sql = (
        "SELECT CAST(SUM(CAST(a * (1 - b) AS DECIMAL(38,6))) AS DOUBLE) "
        "AS x, CAST(SUM(CAST(c AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) "
        "AS y, SUM(d) AS z FROM t"
    )
    out = bench._to_native_sums(sql)
    assert out == (
        "SELECT SUM(a * (1 - b)) AS x, SUM(c) / COUNT(*) AS y, "
        "SUM(d) AS z FROM t"
    )
    # Values must be identical up to float reduction order: both forms
    # aggregate the same expression. (DuckDB evaluates both.)
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT range/7.0 AS a, 0.25 AS b, range/3.0 AS c, range::DOUBLE AS d FROM range(1000)")
    v1 = con.execute(sql).fetchall()[0]
    v2 = con.execute(out).fetchall()[0]
    for p, q in zip(v1, v2):
        assert abs(p - q) < 1e-6


# --- composable post-coloc annotation surfaces -------------------------------
def test_append_study_metadata_and_drop_trans_effects(spark):
    from gentropy_spark.operators.coloc import (
        append_study_metadata,
        drop_trans_effects,
    )

    coloc_df = spark.createDataFrame(
        [(1, 10, 0.9), (2, 20, 0.8), (3, 30, 0.7)],
        "left_study_locus_id long, right_study_locus_id long, h4 double",
    )
    study_locus = spark.createDataFrame(
        [(10, 100, False), (20, 200, True), (30, 300, None)],
        "study_locus_id long, study_id long, is_trans_qtl boolean",
    )
    study_index = spark.createDataFrame(
        [(100, "ENSG1", "eqtl"), (200, "ENSG2", "pqtl"), (300, None, "gwas")],
        "study_id long, gene_id string, study_type string",
    )
    out = append_study_metadata(
        coloc_df,
        study_locus,
        study_index,
        metadata_cols=["gene_id", "study_type"],
        colocalisation_side="right",
    )
    rows = {r["right_study_locus_id"]: r for r in out.collect()}
    assert rows[10]["right_gene_id"] == "ENSG1"
    assert rows[20]["right_study_type"] == "pqtl"
    assert rows[30]["right_gene_id"] is None
    assert out.count() == 3  # right join preserves every coloc row

    with pytest.raises(ValueError, match="colocalisation_side"):
        append_study_metadata(
            coloc_df, study_locus, study_index,
            metadata_cols=["gene_id"], colocalisation_side="middle",
        )

    # trans filter: right locus 20 is trans; NULL (30) counts as cis.
    kept = sorted(
        r["right_study_locus_id"]
        for r in drop_trans_effects(coloc_df, study_locus).collect()
    )
    assert kept == [10, 30]


# --- PQ ANN sanity -----------------------------------------------------------
def test_pq_topk_shape_and_selfmatch(spark, sf_dir):
    from gentropy_spark.operators.similarity import pq_topk
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("vec")
    )
    # ADC is asymmetric (query vs the QUANTIZED corpus vector), so a
    # generic self pair carries its own quantization error — but a
    # CODEBOOK SEED's subvectors are codewords, so querying a seed
    # vector must find itself at ADC distance exactly 0, rank 1.
    seed_id = corpus.agg(F.min("corpus_id")).collect()[0][0]
    queries = corpus.filter(F.col("corpus_id") == seed_id).select(
        F.col("corpus_id").alias("query_id"), "vec"
    )
    out = pq_topk(queries, corpus, k=3).collect()
    assert len(out) == 3
    by_rank = {r["pq_rank"]: r for r in out}
    assert by_rank[1]["corpus_id"] == seed_id
    assert by_rank[1]["adc_dist"] == 0.0
    assert by_rank[1]["cosine"] == 1.0
    assert all(r["adc_dist"] >= 0.0 for r in out)


# --- lint: no plan-level caller of the driver-side LD densifier --------------
def test_no_plan_calls_locus_numpy_matrix():
    """operators/ld_backend.py locus_numpy_matrix is a deliberate
    driver-side per-locus densifier (the reference's own posture) —
    any batch path in plans/ must route through the distributed
    locus_dense_matrices (operators/ld_matrix.py) instead. Source
    lint per the r13 verdict's anti-pattern note."""
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "gentropy_spark")
    offenders = []
    for p in glob.glob(os.path.join(root, "plans", "*.py")):
        if "locus_numpy_matrix" in open(p).read():
            offenders.append(os.path.basename(p))
    assert offenders == [], offenders
