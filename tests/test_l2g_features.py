"""Tests for the extended L2G feature families and the trainer step.

Mirrors the reference's feature-matrix doctests
(dataset/l2g_features/*, method/l2g/feature_factory.py,
method/l2g/trainer.py): per-family invariants, factory assembly
completeness, and trainer determinism (two fits → identical ensemble).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from gentropy_spark.plans.l2g_features import (
    E2G_FEAT_COLS,
    EXT_FEAT_COLS,
    GENE_FEAT_COLS,
    VEP_FEAT_COLS,
    assemble_locus_features,
    q_l2g_gene_features,
    q_l2g_interval_features,
    q_l2g_vep_features,
)


def test_vep_features_ranges(spark, sf_dir):
    df = q_l2g_vep_features(spark, sf_dir)
    rows = df.collect()
    assert rows
    sevs = {0.66, 0.4, 0.25, 0.2}
    for r in rows:
        assert r.vep_max in sevs
        assert 0.0 <= r.vep_mean <= r.vep_max + 1e-12
        # neighbourhood values are ratios in [0, 1]
        assert 0.0 <= r.vep_max_nbh <= 1.0
        assert 0.0 <= r.vep_mean_nbh <= 1.0
    # At least one protein-coding gene per locus has the regional max
    # → its vep_max_nbh is exactly 1.0 somewhere.
    assert any(r.vep_max_nbh == 1.0 for r in rows)


def test_gene_features_counts_consistent(spark, sf_dir):
    df = q_l2g_gene_features(spark, sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.protein_gene_count_w <= r.gene_count_w
        assert r.is_protein_coding in (0.0, 1.0)
        assert r.credset_confidence in (1.0, 0.75, 0.5, 0.25, 0.0)
        # biotype is deterministic on the grid
        if r.is_protein_coding == 1.0:
            assert r.gene_id % 4 != 0


def test_interval_features_locus_mean_centred(spark, sf_dir):
    df = q_l2g_interval_features(spark, sf_dir)
    rows = df.collect()
    # sparse at sf0.001 but must be well-formed
    for r in rows:
        assert r.e2g_mean >= 0.0
        assert r.e2g_mean_nbh >= 0.0


def test_factory_assembles_all_families(spark, sf_dir):
    out = assemble_locus_features(spark, sf_dir)
    assert set(EXT_FEAT_COLS) <= set(out.columns)
    from gentropy_spark.plans.l2g_features import DIST_FEAT_COLS

    assert set(
        VEP_FEAT_COLS + GENE_FEAT_COLS + E2G_FEAT_COLS + DIST_FEAT_COLS
    ) == set(EXT_FEAT_COLS)
    # no nulls anywhere after 0-fill
    n_null = out.select(
        F.greatest(
            *[F.col(c).isNull().cast("int") for c in EXT_FEAT_COLS]
        ).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert n_null == 0
    # the key is unique (feature tables must not duplicate matrix rows)
    total = out.count()
    distinct = out.select("study_id", "contig", "cluster_seq", "gene_id").distinct().count()
    assert total == distinct


def test_extended_matrix_contains_all_families(spark, sf_dir):
    from gentropy_spark.plans.l2g import q_l2g_features

    m = q_l2g_features(spark, sf_dir)
    assert set(EXT_FEAT_COLS) <= set(m.columns)
    # lead rows carry real (non-zero) family values somewhere
    nonzero = m.agg(F.max("vep_max").alias("v")).collect()[0].v
    assert nonzero > 0.0


def test_trainer_is_deterministic(spark, sf_dir):
    from gentropy_spark.operators.l2g_trainer import train_l2g

    a = train_l2g(spark, sf_dir, n_trees=4, n_folds=3)
    b = train_l2g(spark, sf_dir, n_trees=4, n_folds=3)
    assert a["trees"] == b["trees"]
    assert a["features"] == b["features"]
    assert a["cv"] == b["cv"]
    assert a["threshold"] == b["threshold"]


def test_trainer_artifact_serves(spark, sf_dir):
    """The artifact's name-form trees evaluate identically through the
    serving margin (same _eval_tree contract as the frozen model)."""
    import numpy as np

    from gentropy_spark.operators.l2g_model import _eval_tree
    from gentropy_spark.operators.l2g_trainer import train_l2g

    art = train_l2g(spark, sf_dir, n_trees=3, n_folds=2)
    feats = art["features"]
    n = 7
    rng_vals = np.linspace(0.0, 1.0, n)
    cols = {f: rng_vals for f in feats}
    total = np.zeros(n)
    for tree in art["trees"]:
        total += _eval_tree(tree, cols, n)
    assert np.isfinite(total).all()


def test_trainer_depth3_deterministic_and_deeper(spark, sf_dir):
    """r7 capacity upgrade: depth >= 3 trees must (a) rerun
    byte-identically and (b) actually use the extra depth somewhere
    (a path of length 3 exists in at least one tree)."""
    from gentropy_spark.operators.l2g_trainer import train_l2g

    kw = dict(n_trees=4, n_folds=3, max_depth=3, min_child_weight=2.0)
    a = train_l2g(spark, sf_dir, **kw)
    b = train_l2g(spark, sf_dir, **kw)
    assert a["trees"] == b["trees"]
    assert a["params"]["max_depth"] == 3

    def depth(t):
        if "leaf" in t:
            return 0
        return 1 + max(depth(t["left"]), depth(t["right"]))

    assert max(depth(t) for t in a["trees"]) == 3


def test_trainer_early_stopping_truncates():
    """Early stopping must stop at the best validation round: with a
    validation fold whose labels the features cannot explain (pure
    noise), the held-out loss stops improving quickly and the ensemble
    is truncated below n_trees."""
    import numpy as np

    from gentropy_spark.operators.l2g_trainer import fit_gbm

    n = 200
    X = np.linspace(0.0, 1.0, n).reshape(-1, 1)
    y = (X[:, 0] > 0.5).astype(np.float64)
    valid = np.zeros(n, dtype=bool)
    valid[::4] = True
    # flip the validation labels so more boosting rounds HURT held-out loss
    y_train_informative = y.copy()
    y_train_informative[valid] = 1.0 - y[valid]
    trees = fit_gbm(
        X,
        y_train_informative,
        n_trees=30,
        lr=0.3,
        max_depth=2,
        early_stopping_rounds=3,
        valid_mask=valid,
    )
    assert 0 < len(trees) < 30


def test_trainer_l1_regularization_zeroes_weak_leaves():
    """reg_alpha soft-thresholds leaf gradients: with alpha larger than
    any |gradient sum|, every leaf must be exactly 0."""
    import numpy as np

    from gentropy_spark.operators.l2g_trainer import fit_tree

    n = 50
    X = np.linspace(0.0, 1.0, n).reshape(-1, 1)
    g = np.random.default_rng(0).normal(scale=0.01, size=n)  # tiny grads
    h = np.full(n, 0.25)

    def leaves(t):
        if "leaf" in t:
            return [t["leaf"]]
        return leaves(t["left"]) + leaves(t["right"])

    t = fit_tree(X, g, h, max_depth=2, alpha=1e6)
    assert all(v == 0.0 for v in leaves(t))
