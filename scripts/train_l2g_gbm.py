"""One-time trainer for the frozen L2G gradient-boosted scorer.

Trains a small deterministic GBM (logistic loss, depth-2 regression
trees, exact greedy splits) on the sf0.01 feature matrix joined to the
gold-standard labels, then prints the ensemble as a Python literal to
freeze into gentropy_spark/operators/l2g_model.py. Mirrors the role of
the reference's method/l2g/trainer.py (GBM on L2G features) with a
reproducible, dependency-free artifact.
"""

from __future__ import annotations

import numpy as np


def fit_stump2(X, g, h, lam=1.0):
    """Best depth-2 tree (root + 2 child splits) minimizing the
    second-order boosting objective. Returns nested dict."""
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
    node = {"feat": j, "thr": thr}
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


def predict_tree(tree, X):
    if "leaf" in tree:
        return np.full(len(X), tree["leaf"])
    m = X[:, tree["feat"]] <= tree["thr"]
    out = np.empty(len(X))
    out[m] = predict_tree(tree["left"], X[m])
    out[~m] = predict_tree(tree["right"], X[~m])
    return out


def main() -> None:
    from gentropy_spark.plans.l2g import (
        _COLOC_FEAT_COLS,
        q_l2g_features,
        q_l2g_gold_standard,
    )
    from gentropy_spark.session import get_session

    spark = get_session("l2g_gbm_train")
    sf = "/root/testdata/sf0.01"
    feats = q_l2g_features(spark, sf)
    gold = q_l2g_gold_standard(spark, sf)
    df = feats.join(gold, on=["point_id", "study_id", "gene_id"]).toPandas()
    FEATURES = [
        "max_weight", "rel_weight", "n_hits", "genes_in_flank",
        *_COLOC_FEAT_COLS,
    ]
    X = df[FEATURES].to_numpy(dtype=np.float64)
    y = (df["label"] == "positive").to_numpy(dtype=np.float64)
    print(f"rows {len(y)}, positives {int(y.sum())}")

    lr, n_trees = 0.3, 12
    margin = np.zeros(len(y))
    trees = []
    for _ in range(n_trees):
        p = 1.0 / (1.0 + np.exp(-margin))
        g, h = p - y, p * (1.0 - p)
        t = fit_stump2(X, g, h)
        trees.append(t)
        margin += lr * predict_tree(t, X)
    p = 1.0 / (1.0 + np.exp(-margin))
    auc_num = 0
    pos, neg = p[y == 1], p[y == 0]
    # exact AUC on the training set (small)
    auc = (pos[:, None] > neg[None, :]).mean() + 0.5 * (
        pos[:, None] == neg[None, :]
    ).mean()
    print(f"train logloss {-np.mean(y*np.log(p+1e-12)+(1-y)*np.log(1-p+1e-12)):.4f}  AUC {auc:.4f}")

    def scale(tree):
        if "leaf" in tree:
            return {"leaf": round(tree["leaf"] * lr, 9)}
        out = {"feat": FEATURES[tree["feat"]], "thr": round(tree["thr"], 9)}
        out["left"] = scale(tree["left"])
        out["right"] = scale(tree["right"])
        return out

    import pprint

    print("FEATURES =", FEATURES)
    print("TREES = ", end="")
    pprint.pprint([scale(t) for t in trees], width=100)


if __name__ == "__main__":
    main()
