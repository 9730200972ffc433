"""Deterministic L2G trainer step (reference: method/l2g/trainer.py:1-625).

The reference's LocusToGeneTrainer fits a gradient-boosted classifier
over the L2G feature matrix with study-aware cross-validation and
persists the fitted model plus evaluation metrics. This module
re-expresses that as a fully deterministic step:

- Feature matrix + gold standard are built DISTRIBUTED (the extended
  ``l2g_feature_matrix`` — every feature family — joined to
  ``l2g_gold_standard`` labels).
- The post-aggregation matrix (one row per locus-gene pair, ~10⁴ rows
  per 10⁷ raw variants) is collected driver-side for the exact-greedy
  GBM fit — the same posture as the reference, whose trainer collects
  the matrix to pandas for sklearn. The heavy lifting (scans, joins,
  windows over the raw data) stays on the cluster; only the tiny
  aggregated matrix crosses to the driver.
- No RNG anywhere: folds are ``study_id % n_folds`` (study-grouped —
  all loci of a study share a fold, so no leakage across folds, the
  reference's GroupKFold-by-study), rows are sorted by
  (point_id, study_id, gene_id) before the fit so float accumulation
  order is reproducible, and splits are exact-greedy over unique
  rounded thresholds. Two runs produce byte-identical ensembles.

The fitted artifact is a plain dict (features, trees, cv metrics,
calibrated threshold) — freeze it into operators/l2g_model.py to serve
via the Arrow-batched ``margin_udf`` / oracle ``margin_sql`` pair.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def fit_stump2(X: np.ndarray, g: np.ndarray, h: np.ndarray, lam: float = 1.0) -> dict:
    """Best depth-2 tree (root + 2 child splits) minimizing the
    second-order boosting objective. Exact greedy over unique rounded
    thresholds — deterministic, no sampling."""

    def best_split(idx):
        best = None
        Gt, Ht = g[idx].sum(), h[idx].sum()
        base = -(Gt * Gt) / (Ht + lam)
        for j in range(X.shape[1]):
            vals = np.unique(np.round(X[idx, j], 6))
            if len(vals) < 2:
                continue
            for thr in (vals[:-1] + vals[1:]) / 2.0:
                m = X[idx, j] <= thr
                Gl, Hl = g[idx][m].sum(), h[idx][m].sum()
                Gr, Hr = Gt - Gl, Ht - Hl
                gain = base + (Gl * Gl) / (Hl + lam) + (Gr * Gr) / (Hr + lam)
                if best is None or gain > best[0] + 1e-12:
                    best = (gain, j, float(thr))
        return best

    def leaf(idx):
        return -g[idx].sum() / (h[idx].sum() + lam)

    all_idx = np.arange(len(g))
    root = best_split(all_idx)
    if root is None:
        return {"leaf": float(leaf(all_idx))}
    _, j, thr = root
    lm = X[:, j] <= thr
    node: dict = {"feat": j, "thr": thr}
    for side, idx in (("left", all_idx[lm]), ("right", all_idx[~lm])):
        sub = best_split(idx)
        if sub is None:
            node[side] = {"leaf": float(leaf(idx))}
        else:
            _, js, ts = sub
            ms = X[idx, js] <= ts
            node[side] = {
                "feat": js,
                "thr": ts,
                "left": {"leaf": float(leaf(idx[ms]))},
                "right": {"leaf": float(leaf(idx[~ms]))},
            }
    return node


def predict_tree(tree: dict, X: np.ndarray) -> np.ndarray:
    if "leaf" in tree:
        return np.full(len(X), tree["leaf"])
    m = X[:, tree["feat"]] <= tree["thr"]
    out = np.empty(len(X))
    out[m] = predict_tree(tree["left"], X[m])
    out[~m] = predict_tree(tree["right"], X[~m])
    return out


def fit_gbm(
    X: np.ndarray, y: np.ndarray, n_trees: int = 12, lr: float = 0.3
) -> list[dict]:
    """Logistic-loss boosting with depth-2 trees (index-form trees)."""
    margin = np.zeros(len(y))
    trees = []
    for _ in range(n_trees):
        p = 1.0 / (1.0 + np.exp(-margin))
        g, h = p - y, p * (1.0 - p)
        t = fit_stump2(X, g, h)
        trees.append(t)
        margin += lr * predict_tree(t, X)
    return trees


def predict_margin(trees: list[dict], X: np.ndarray, lr: float) -> np.ndarray:
    m = np.zeros(len(X))
    for t in trees:
        m += lr * predict_tree(t, X)
    return m


def exact_auc(p: np.ndarray, y: np.ndarray) -> float:
    pos, neg = p[y == 1], p[y == 0]
    if len(pos) == 0 or len(neg) == 0:
        return float("nan")
    return float(
        (pos[:, None] > neg[None, :]).mean()
        + 0.5 * (pos[:, None] == neg[None, :]).mean()
    )


def logloss(p: np.ndarray, y: np.ndarray) -> float:
    eps = 1e-12
    return float(-np.mean(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)))


def _scale_tree(tree: dict, features: list[str], lr: float) -> dict:
    """Index-form tree → frozen name-form tree with lr-scaled leaves."""
    if "leaf" in tree:
        return {"leaf": round(tree["leaf"] * lr, 9)}
    out = {"feat": features[tree["feat"]], "thr": round(tree["thr"], 9)}
    out["left"] = _scale_tree(tree["left"], features, lr)
    out["right"] = _scale_tree(tree["right"], features, lr)
    return out


def train_l2g(
    spark: SparkSession,
    sf_dir: str,
    n_trees: int = 12,
    lr: float = 0.3,
    n_folds: int = 5,
) -> dict:
    """Run the full training step; returns the frozen-model artifact.

    Artifact keys: ``features`` (column order), ``trees`` (name-form,
    lr-scaled — drop-in for operators/l2g_model.py TREES), ``cv`` (per
    held-out-fold AUC/logloss), ``train`` (full-data metrics),
    ``threshold`` (score of the Youden-style best F1 cut on training
    predictions), ``n_rows``/``n_pos``.
    """
    from gentropy_spark.operators.l2g_model import FEATURES
    from gentropy_spark.plans.l2g import q_l2g_features, q_l2g_gold_standard

    feats = q_l2g_features(spark, sf_dir)
    gold = q_l2g_gold_standard(spark, sf_dir)
    # Deterministic collect: total order fixes float accumulation.
    df = (
        feats.join(gold, on=["point_id", "study_id", "gene_id"])
        .orderBy("point_id", "study_id", "gene_id")
        .toPandas()
    )
    features = [c for c in FEATURES if c in df.columns] + [
        c
        for c in df.columns
        if c
        not in (
            "point_id",
            "study_id",
            "contig",
            "gene_id",
            "label",
            *FEATURES,
        )
    ]
    X = df[features].to_numpy(dtype=np.float64)
    y = (df["label"] == "positive").to_numpy(dtype=np.float64)
    folds = (df["study_id"] % n_folds).to_numpy()

    cv = []
    for k in range(n_folds):
        tr, te = folds != k, folds == k
        if te.sum() == 0 or len(np.unique(y[tr])) < 2:
            continue
        trees_k = fit_gbm(X[tr], y[tr], n_trees=n_trees, lr=lr)
        p = 1.0 / (1.0 + np.exp(-predict_margin(trees_k, X[te], lr)))
        cv.append(
            {
                "fold": k,
                "n_test": int(te.sum()),
                "auc": round(exact_auc(p, y[te]), 6),
                "logloss": round(logloss(p, y[te]), 6),
            }
        )

    trees = fit_gbm(X, y, n_trees=n_trees, lr=lr)
    p = 1.0 / (1.0 + np.exp(-predict_margin(trees, X, lr)))
    # Best-F1 threshold over the unique predicted scores (deterministic).
    best_thr, best_f1 = 0.5, -1.0
    for thr in np.unique(np.round(p, 6)):
        pred = p >= thr
        tp = float((pred & (y == 1)).sum())
        if tp == 0:
            continue
        prec = tp / pred.sum()
        rec = tp / (y == 1).sum()
        f1 = 2 * prec * rec / (prec + rec)
        if f1 > best_f1 + 1e-12:
            best_f1, best_thr = f1, float(thr)
    return {
        "features": features,
        "trees": [_scale_tree(t, features, lr) for t in trees],
        "cv": cv,
        "train": {
            "auc": round(exact_auc(p, y), 6),
            "logloss": round(logloss(p, y), 6),
        },
        "threshold": best_thr,
        "n_rows": int(len(y)),
        "n_pos": int(y.sum()),
        "params": {"n_trees": n_trees, "lr": lr, "n_folds": n_folds},
    }
