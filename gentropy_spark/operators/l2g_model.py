"""Frozen L2G gradient-boosted scorer (SURVEY §2.H3 upgrade, r3).

Re-expresses the role of the reference's GBM L2G model
(/root/reference/src/gentropy/method/l2g/model.py + trainer.py:1-625:
gradient-boosted classifier over the L2G feature matrix, persisted and
applied via a pandas predict) as a DEPENDENCY-FREE frozen artifact:

- ``TREES`` is a 12-tree, depth-2 boosted ensemble (logistic loss,
  learning-rate-scaled leaves) trained once by
  ``scripts/train_l2g_gbm.py`` on the sf0.01 feature matrix joined to
  the gold-standard labels, then frozen here for reproducibility.
- Serving is Arrow-batched: ``margin_udf`` evaluates the ensemble with
  numpy boolean masks over whole batches (the scale path — a
  CASE-WHEN expression chain would re-enter the codegen-size trap for
  big ensembles), summing tree outputs in fixed order so the margin is
  bit-reproducible; the sigmoid stays JVM-side where the engine's
  exp/round parity rules already hold.
- ``margin_sql`` emits the identical ensemble as DuckDB CASE WHEN text
  (same comparison semantics, same left-to-right addition), so the
  scorer is fully value-hash oracle-checkable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

FEATURES = ['max_weight', 'rel_weight', 'n_hits', 'genes_in_flank', 'eqtl_h4_max', 'eqtl_h4_nbh', 'eqtl_clpp_max', 'eqtl_clpp_nbh', 'pqtl_h4_max', 'pqtl_h4_nbh', 'pqtl_clpp_max', 'pqtl_clpp_nbh', 'sqtl_h4_max', 'sqtl_h4_nbh', 'sqtl_clpp_max', 'sqtl_clpp_nbh', 'vep_max', 'vep_mean', 'vep_max_nbh', 'vep_mean_nbh', 'gene_count_w', 'protein_gene_count_w', 'is_protein_coding', 'credset_confidence', 'e2g_mean', 'e2g_mean_nbh', 'distance_sentinel_tss', 'distance_sentinel_tss_nbh', 'distance_sentinel_footprint', 'distance_sentinel_footprint_nbh', 'distance_tss_mean', 'distance_tss_mean_nbh', 'distance_footprint_mean', 'distance_footprint_mean_nbh']
TREES = [{'feat': 'max_weight',
  'left': {'feat': 'max_weight',
           'left': {'leaf': -0.12},
           'right': {'leaf': -0.598040816},
           'thr': 0.0004905},
  'right': {'feat': 'max_weight',
            'left': {'leaf': 0.12},
            'right': {'leaf': 0.599345692},
            'thr': 0.501422},
  'thr': 0.5},
 {'feat': 'max_weight',
  'left': {'feat': 'max_weight',
           'left': {'leaf': -0.463398671},
           'right': {'leaf': -0.086611072},
           'thr': 0.498578},
  'right': {'feat': 'eqtl_h4_max',
            'left': {'leaf': 0.464227681},
            'right': {'leaf': 0.086544281},
            'thr': 0.99978},
  'thr': 0.5},
 {'feat': 'max_weight',
  'left': {'feat': 'eqtl_h4_max',
           'left': {'leaf': -0.402171044},
           'right': {'leaf': -0.064745951},
           'thr': 0.970348},
  'right': {'feat': 'pqtl_h4_max',
            'left': {'leaf': 0.403025554},
            'right': {'leaf': 0.064654109},
            'thr': 0.9999175},
  'thr': 0.5},
 {'feat': 'max_weight',
  'left': {'feat': 'pqtl_h4_max',
           'left': {'leaf': -0.367553315},
           'right': {'leaf': -0.048910768},
           'thr': 0.994302},
  'right': {'feat': 'sqtl_h4_max',
            'left': {'leaf': 0.368587364},
            'right': {'leaf': 0.048804231},
            'thr': 0.9979715},
  'thr': 0.5},
 {'feat': 'max_weight',
  'left': {'feat': 'sqtl_h4_max',
           'left': {'leaf': -0.345785558},
           'right': {'leaf': -0.037023112},
           'thr': 0.7953455},
  'right': {'feat': 'distance_sentinel_tss',
            'left': {'leaf': 0.347108673},
            'right': {'leaf': 0.036906362},
            'thr': 0.999957},
  'thr': 0.5},
 {'feat': 'max_weight',
  'left': {'feat': 'sqtl_clpp_max',
           'left': {'leaf': -0.331136787},
           'right': {'leaf': -0.027991547},
           'thr': 0.0188325},
  'right': {'feat': 'distance_sentinel_tss',
            'left': {'leaf': 0.332860669},
            'right': {'leaf': 0.035848339},
            'thr': 0.999957},
  'thr': 0.5},
 {'feat': 'max_weight',
  'left': {'feat': 'vep_max',
           'left': {'leaf': -0.320729877},
           'right': {'leaf': -0.021117674},
           'thr': 0.455},
  'right': {'feat': 'sqtl_h4_max',
            'left': {'leaf': 0.32300457},
            'right': {'leaf': 0.027565473},
            'thr': 0.9979715},
  'thr': 0.5},
 {'feat': 'max_weight',
  'left': {'feat': 'distance_sentinel_footprint',
           'left': {'leaf': -0.312926792},
           'right': {'leaf': -0.015898568},
           'thr': 0.969289},
  'right': {'feat': 'pqtl_h4_max',
            'left': {'leaf': 0.315931468},
            'right': {'leaf': 0.021270489},
            'thr': 0.9999175},
  'thr': 0.5},
 {'feat': 'max_weight',
  'left': {'feat': 'distance_sentinel_footprint',
           'left': {'leaf': -0.306691645},
           'right': {'leaf': -0.015672593},
           'thr': 0.969289},
  'right': {'feat': 'eqtl_h4_max',
            'left': {'leaf': 0.310663671},
            'right': {'leaf': 0.016664244},
            'thr': 0.99978},
  'thr': 0.5},
 {'feat': 'max_weight',
  'left': {'feat': 'vep_max',
           'left': {'leaf': -0.301334658},
           'right': {'leaf': -0.011872978},
           'thr': 0.455},
  'right': {'feat': 'max_weight',
            'left': {'leaf': 0.013795311},
            'right': {'leaf': 0.306558065},
            'thr': 0.501422},
  'thr': 0.5},
 {'feat': 'max_weight',
  'left': {'feat': 'sqtl_clpp_max',
           'left': {'leaf': -0.296314622},
           'right': {'leaf': -0.008991902},
           'thr': 0.0188325},
  'right': {'feat': 'distance_sentinel_tss',
            'left': {'leaf': 0.303162499},
            'right': {'leaf': 0.011706465},
            'thr': 0.999957},
  'thr': 0.5},
 {'feat': 'max_weight',
  'left': {'feat': 'sqtl_h4_max',
           'left': {'leaf': -0.291206251},
           'right': {'leaf': -0.006824058},
           'thr': 0.7953455},
  'right': {'feat': 'sqtl_h4_max',
            'left': {'leaf': 0.30013544},
            'right': {'leaf': 0.008885533},
            'thr': 0.9979715},
  'thr': 0.5}]


def _eval_tree(tree: dict, cols: dict[str, np.ndarray], n: int) -> np.ndarray:
    if "leaf" in tree:
        return np.full(n, tree["leaf"])
    mask = cols[tree["feat"]] <= tree["thr"]
    out = np.empty(n)
    out[mask] = _eval_tree(tree["left"], {k: v[mask] for k, v in cols.items()}, int(mask.sum()))
    out[~mask] = _eval_tree(
        tree["right"], {k: v[~mask] for k, v in cols.items()}, int((~mask).sum())
    )
    return out


def margin_udf() -> "callable":
    """Arrow-batched ensemble margin: sum of tree outputs in tree order
    (fixed-order float64 adds — bit-reproducible and equal to the SQL
    form's left-associated addition chain)."""

    @pandas_udf("double")
    def _margin(*feature_cols: pd.Series) -> pd.Series:
        n = len(feature_cols[0])
        if n == 0:
            return pd.Series([], dtype="float64")
        cols = {
            name: s.to_numpy(dtype=np.float64)
            for name, s in zip(FEATURES, feature_cols)
        }
        total = np.zeros(n)
        for tree in TREES:
            total += _eval_tree(tree, cols, n)
        return pd.Series(total)

    return _margin


def _tree_sql(tree: dict) -> str:
    # Scientific notation: DuckDB parses plain decimal literals as
    # DECIMAL, which would make the oracle margin exact-decimal while
    # the Spark UDF sums float64 — '.17e' keeps both engines in DOUBLE.
    if "leaf" in tree:
        return format(tree["leaf"], ".17e")
    return (
        f"CASE WHEN {tree['feat']} <= {format(tree['thr'], '.17e')} "
        f"THEN {_tree_sql(tree['left'])} ELSE {_tree_sql(tree['right'])} END"
    )


def margin_sql() -> str:
    """The identical ensemble as one left-associated DuckDB expression."""
    return " + ".join(f"({_tree_sql(t)})" for t in TREES)


# --- exact TreeSHAP for the frozen ensemble (SURVEY H3 explain surface) ----
# Re-expresses dataset/l2g_prediction.py:180-303 ``L2GPrediction.explain``
# (shap.TreeExplainer over a 1000-row random background sample) as a
# CLOSED-FORM interventional TreeSHAP: every tree is depth <= 2, so each
# tree touches at most 3 distinct features and the Shapley enumeration
# is over <= 8 coalitions whose value functions v(S) = E_b[T(x_S, b_~S)]
# reduce to per-node background CDF constants. Two deliberate
# re-architecture choices vs the reference, both documented here:
# - The background is the FULL frozen training feature matrix (the same
#   sf0.01 matrix scripts/train_l2g_gbm.py trained on), not a 1000-row
#   RNG sample — deterministic, so the explanations are value-hash
#   oracle-checkable.
# - Contributions are in MARGIN (log-odds) space where Shapley
#   efficiency is exact (sum(shap) + base == margin, the local-accuracy
#   axiom, property-tested in tests/test_round14_fixes.py); the
#   reference approximates probability-space output.
#
# BG_CDF holds P(feature <= threshold) over the training matrix for
# every (feature, threshold) node in TREES — frozen model artifact,
# regenerated alongside TREES by scripts/train_l2g_gbm.py.
BG_N = 4887
BG_CDF = {
    ("distance_sentinel_footprint", 0.969289): 0.7341927562922038,
    ("distance_sentinel_tss", 0.999957): 0.9997953754859832,
    ("eqtl_h4_max", 0.970348): 0.9989768774299161,
    ("eqtl_h4_max", 0.99978): 0.9997953754859832,
    ("max_weight", 0.0004905): 0.0002046245140167792,
    ("max_weight", 0.498578): 0.24984653161448742,
    ("max_weight", 0.5): 0.2500511561285042,
    ("max_weight", 0.501422): 0.25025578064252096,
    ("pqtl_h4_max", 0.994302): 0.9987722529158993,
    ("pqtl_h4_max", 0.9999175): 0.9997953754859832,
    ("sqtl_clpp_max", 0.0188325): 0.9991815019439328,
    ("sqtl_h4_max", 0.7953455): 0.9979537548598322,
    ("sqtl_h4_max", 0.9979715): 0.9995907509719665,
    ("vep_max", 0.455): 0.9111929609167179,
}
# Joint P(root_cond AND child_cond) over the training matrix for every
# (root node, child node) pair co-occurring in a tree — v(S) terms
# where BOTH path conditions are marginalized need the empirical
# JOINT, not a product of marginals (features correlate; e.g. every
# high-max_weight row also has high QTL H4s here). Frozen with TREES.
BG_JOINT = {
    (("max_weight", 0.5), ("distance_sentinel_footprint", 0.969289)): 0.24984653161448742,
    (("max_weight", 0.5), ("distance_sentinel_tss", 0.999957)): 0.2500511561285042,
    (("max_weight", 0.5), ("eqtl_h4_max", 0.970348)): 0.24984653161448742,
    (("max_weight", 0.5), ("eqtl_h4_max", 0.99978)): 0.2500511561285042,
    (("max_weight", 0.5), ("max_weight", 0.0004905)): 0.0002046245140167792,
    (("max_weight", 0.5), ("max_weight", 0.498578)): 0.24984653161448742,
    (("max_weight", 0.5), ("max_weight", 0.501422)): 0.2500511561285042,
    (("max_weight", 0.5), ("pqtl_h4_max", 0.994302)): 0.24984653161448742,
    (("max_weight", 0.5), ("pqtl_h4_max", 0.9999175)): 0.2500511561285042,
    (("max_weight", 0.5), ("sqtl_clpp_max", 0.0188325)): 0.24984653161448742,
    (("max_weight", 0.5), ("sqtl_h4_max", 0.7953455)): 0.24984653161448742,
    (("max_weight", 0.5), ("sqtl_h4_max", 0.9979715)): 0.24984653161448742,
    (("max_weight", 0.5), ("vep_max", 0.455)): 0.24984653161448742,
}


# Tiny expression AST shared by the Column and SQL renderers so both
# engines evaluate the STRUCTURALLY IDENTICAL double arithmetic (the
# margin_sql parity precedent): ('lit', f) | ('ind', feat, thr) |
# ('add'|'sub'|'mul', a, b). Smart constructors constant-fold
# eagerly, keeping the emitted expressions small.
def _lit(x):
    return ("lit", float(x))


def _is_lit(n):
    return n[0] == "lit"


def _add(a, b):
    if _is_lit(a) and _is_lit(b):
        return _lit(a[1] + b[1])
    if _is_lit(a) and a[1] == 0.0:
        return b
    if _is_lit(b) and b[1] == 0.0:
        return a
    return ("add", a, b)


def _sub(a, b):
    if _is_lit(a) and _is_lit(b):
        return _lit(a[1] - b[1])
    if _is_lit(b) and b[1] == 0.0:
        return a
    return ("sub", a, b)


def _mul(a, b):
    if _is_lit(a) and _is_lit(b):
        return _lit(a[1] * b[1])
    if _is_lit(a) and a[1] == 1.0:
        return b
    if _is_lit(b) and b[1] == 1.0:
        return a
    if (_is_lit(a) and a[1] == 0.0) or (_is_lit(b) and b[1] == 0.0):
        return _lit(0.0)
    return ("mul", a, b)


def _tree_leaves(tree: dict) -> list[tuple[tuple, float]]:
    """Root-to-leaf paths: [(((feat, op, thr), ...), leaf_value)]."""
    if "leaf" in tree:
        return [((), tree["leaf"])]
    out = []
    for op, child in (("le", tree["left"]), ("gt", tree["right"])):
        for conds, val in _tree_leaves(child):
            out.append((((tree["feat"], op, tree["thr"]),) + conds, val))
    return out


def _bg_prob(conds: list[tuple]) -> float:
    """Empirical background probability of a path's marginalized conds.

    Depth-2 paths carry at most TWO conditions, so every case is exact
    from the frozen tables: one cond -> per-threshold CDF; two conds on
    the SAME feature -> interval arithmetic over the CDF; two conds on
    DIFFERENT features (root then child, path order) -> inclusion/
    exclusion over the frozen pairwise JOINT."""
    if len(conds) == 1:
        g, op, t = conds[0]
        f = BG_CDF[(g, t)]
        return f if op == "le" else 1.0 - f
    (g1, op1, t1), (g2, op2, t2) = conds
    if g1 == g2:
        les = [t for _, op, t in conds if op == "le"]
        gts = [t for _, op, t in conds if op == "gt"]
        hi = min((BG_CDF[(g1, t)] for t in les), default=1.0)
        lo = max((BG_CDF[(g1, t)] for t in gts), default=0.0)
        return max(hi - lo, 0.0)
    j = BG_JOINT[((g1, t1), (g2, t2))]
    f1, f2 = BG_CDF[(g1, t1)], BG_CDF[(g2, t2)]
    if op1 == "le":
        return j if op2 == "le" else f1 - j
    return (f2 - j) if op2 == "le" else 1.0 - f1 - f2 + j


def _coalition_value(leaves, players_in, feats_order):
    """AST for v(S) = E_background[T(x_S, b_~S)] over the empirical
    joint background (exact for depth-2 paths, see _bg_prob)."""
    total = _lit(0.0)
    for conds, val in leaves:
        term = _lit(val)
        for g in feats_order:
            if g not in players_in:
                continue
            for c in conds:
                if c[0] != g:
                    continue
                _, op, thr = c
                ind = ("ind", g, thr)
                term = _mul(term, ind if op == "le" else _sub(_lit(1.0), ind))
        bg_conds = [c for c in conds if c[0] not in players_in]
        if bg_conds:
            term = _mul(term, _lit(_bg_prob(bg_conds)))
        total = _add(total, term)
    return total


def _factorial(n: int) -> int:
    return 1 if n <= 1 else n * _factorial(n - 1)


def shap_ast() -> tuple[dict[str, tuple], float]:
    """Per-feature SHAP ASTs plus the (python float) base value.

    phi_g = sum over S subseteq P\\{g} of |S|!(p-1-|S|)!/p! *
    (v(S+g) - v(S)), accumulated across trees in tree order so both
    renderers produce the same left-associated addition chain."""
    from itertools import combinations

    phis: dict[str, tuple] = {}
    base = 0.0
    for tree in TREES:
        leaves = _tree_leaves(tree)
        feats_order = []
        for conds, _ in leaves:
            for g, _, _ in conds:
                if g not in feats_order:
                    feats_order.append(g)
        players = sorted(feats_order)
        p = len(players)
        vcache = {
            frozenset(s): _coalition_value(leaves, frozenset(s), feats_order)
            for k in range(p + 1)
            for s in combinations(players, k)
        }
        v_empty = vcache[frozenset()]
        assert _is_lit(v_empty)
        base += v_empty[1]
        for g in players:
            others = [q for q in players if q != g]
            phi = _lit(0.0)
            for k in range(len(others) + 1):
                w = _factorial(k) * _factorial(p - 1 - k) / _factorial(p)
                for s in combinations(others, k):
                    gain = _sub(
                        vcache[frozenset(s) | {g}], vcache[frozenset(s)]
                    )
                    phi = _add(phi, _mul(_lit(w), gain))
            phis[g] = _add(phis[g], phi) if g in phis else phi
    return phis, base


def _render_column(node):
    from pyspark.sql import functions as F

    kind = node[0]
    if kind == "lit":
        return F.lit(node[1])
    if kind == "ind":
        return F.when(F.col(node[1]) <= node[2], 1.0).otherwise(0.0)
    a, b = _render_column(node[1]), _render_column(node[2])
    return a + b if kind == "add" else a - b if kind == "sub" else a * b


def _render_sql(node) -> str:
    kind = node[0]
    if kind == "lit":
        return format(node[1], ".17e")
    if kind == "ind":
        return (
            f"(CASE WHEN {node[1]} <= {format(node[2], '.17e')} "
            f"THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END)"
        )
    op = {"add": "+", "sub": "-", "mul": "*"}[kind]
    return f"({_render_sql(node[1])} {op} {_render_sql(node[2])})"


def shap_columns() -> tuple[dict[str, "object"], float]:
    """(feature -> margin-space SHAP Column, base value)."""
    phis, base = shap_ast()
    return {g: _render_column(a) for g, a in phis.items()}, base


def shap_sql_exprs() -> tuple[dict[str, str], float]:
    """(feature -> DuckDB SHAP expression text, base value)."""
    phis, base = shap_ast()
    return {g: _render_sql(a) for g, a in phis.items()}, base
