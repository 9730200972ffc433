"""Randomized cross-checks for the r16 operators (the BPE
property-test pattern): seeded random inputs, pure-python references,
exact comparison. Ties are deliberately manufactured (duplicated
vectors, tiny value grids) to stress the (dist, id) tie-break chain.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pytest


def _rand_vectors(rng, n, dim, dup_frac=0.25, grid=None):
    """Random vectors with a duplicated fraction (tie stress); an
    optional coarse value grid makes exact distance TIES likely."""
    X = rng.uniform(-2.0, 2.0, size=(n, dim))
    if grid:
        X = np.round(X * grid) / grid
    n_dup = int(n * dup_frac)
    if n_dup:
        src = rng.randint(0, n, size=n_dup)
        dst = rng.randint(0, n, size=n_dup)
        X[dst] = X[src]
    return X


def test_two_level_exact_regime_randomized(spark):
    """Whenever every cell is probed (n_probe >= K2) the two-level
    assignment must equal brute-force nearest-centroid with the
    (rounded dist, centroid_id) tie-break — across random shapes,
    duplicate-heavy inputs, and tie-inducing value grids."""
    from gentropy_spark.operators.similarity import two_level_nearest_centroid

    rng = np.random.RandomState(20260816)
    for case in range(12):
        n = int(rng.randint(20, 90))
        dim = int(rng.choice([2, 3, 5, 8]))
        k = int(rng.randint(2, min(16, n)))
        k2 = int(rng.randint(1, max(2, int(math.isqrt(k)) + 2)))
        grid = int(rng.choice([2, 4, 0]))  # 0 = continuous
        X = _rand_vectors(rng, n, dim, grid=grid or None)
        pts = [(i, [float(v) for v in X[i]]) for i in range(n)]
        vdf = spark.createDataFrame(pts, "vec_id long, v array<double>")
        cdf = spark.createDataFrame(
            pts[:k], "centroid_id long, c array<double>"
        )
        odf = spark.createDataFrame(
            pts[:k2], "cell_id long, cellv array<double>"
        )
        got = {
            r.vec_id: (r.centroid_id, r.dist2)
            for r in two_level_nearest_centroid(
                vdf, cdf, odf, n_probe=k2
            ).collect()
        }
        exp = {}
        for vid, v in pts:
            best = min(
                (
                    (
                        round(
                            float(
                                sum(
                                    (a - b) * (a - b)
                                    for a, b in zip(v, c)
                                )
                            ),
                            6,
                        ),
                        cid,
                    )
                    for cid, c in pts[:k]
                )
            )
            exp[vid] = (best[1], best[0])
        assert got == exp, f"case {case}: n={n} dim={dim} k={k} k2={k2}"


def _python_ivfpq(X, qids, cids, n_lists, n_probe, n_sub, n_codes, k):
    """Pure-python replication of ivfpq_topk's conventions."""
    dim = X.shape[1]
    sub = dim // n_sub
    emb = {i: X[i] for i in range(len(X))}
    cents = sorted(cids)[:n_lists]

    def sqd(a, b):
        return round(float(sum((x - y) * (x - y) for x, y in zip(a, b))), 6)

    assigned = {
        c: min(cents, key=lambda t: (sqd(emb[c], emb[t]), t)) for c in cids
    }
    seeds = sorted(cids)[:n_codes]
    books = {}
    for m in range(n_sub):
        books[m] = {
            code + 1: emb[s][m * sub : (m + 1) * sub]
            for code, s in enumerate(seeds)
        }
    codes = {}
    for c in cids:
        codes[c] = {
            m: min(
                books[m],
                key=lambda code: (
                    sqd(emb[c][m * sub : (m + 1) * sub], books[m][code]),
                    code,
                ),
            )
            for m in range(n_sub)
        }
    out = {}
    for q in qids:
        probed = sorted(cents, key=lambda t: (sqd(emb[q], emb[t]), t))[
            :n_probe
        ]
        cand = [c for c in cids if assigned[c] in probed]
        scored = []
        for c in cand:
            from decimal import Decimal

            adc = sum(
                Decimal(
                    str(
                        sqd(
                            emb[q][m * sub : (m + 1) * sub],
                            books[m][codes[c][m]],
                        )
                    )
                )
                for m in range(n_sub)
            )
            scored.append((float(adc), c))
        scored.sort()
        out[q] = [(c, r + 1, d) for r, (d, c) in enumerate(scored[:k])]
    return out


def test_ivfpq_matches_python_replication(spark):
    """ivfpq_topk equals a pure-python replication of the full layout
    (list assignment, raw-vector PQ codes, probed ADC, top-k) on
    random duplicate-heavy corpora."""
    from gentropy_spark.operators.similarity import ivfpq_topk

    rng = np.random.RandomState(42)
    for case in range(5):
        n = int(rng.randint(40, 120))
        dim = 8
        n_sub, n_codes, n_lists, n_probe, k = 4, 6, 5, 2, 3
        X = _rand_vectors(rng, n, dim, grid=4)
        qids = list(range(3))
        cids = list(range(3, n))
        qdf = spark.createDataFrame(
            [(i, [float(v) for v in X[i]]) for i in qids],
            "query_id long, vec array<double>",
        )
        cdf = spark.createDataFrame(
            [(i, [float(v) for v in X[i]]) for i in cids],
            "corpus_id long, vec array<double>",
        )
        got = defaultdict(list)
        for r in ivfpq_topk(
            qdf,
            cdf,
            n_lists=n_lists,
            n_probe=n_probe,
            n_subvectors=n_sub,
            n_codes=n_codes,
            k=k,
            dim=dim,
        ).collect():
            got[r.query_id].append(
                (r.corpus_id, r.ivfpq_rank, round(r.adc_dist, 6))
            )
        for q in got:
            got[q].sort(key=lambda t: t[1])
        exp = _python_ivfpq(
            X, qids, cids, n_lists, n_probe, n_sub, n_codes, k
        )
        exp = {
            q: [(c, r, round(d, 6)) for c, r, d in rows]
            for q, rows in exp.items()
        }
        assert dict(got) == {q: exp[q] for q in exp if exp[q]}, (
            f"case {case}"
        )


def test_kn_perplexity_randomized_corpora(spark, tmp_path):
    """E50 on 10 random small-vocab corpora (repetition-heavy, so the
    continuation/history counts differ materially from raw counts)
    against the pure-python KN reference."""
    from gentropy_spark.plans.llm_pipeline import (
        LM_KN_DISCOUNT,
        q_lm_kn_perplexity,
    )

    rng = np.random.RandomState(7)
    vocab = ["a", "b", "c", "dd", "ee"]
    for case in range(4):
        docs = []
        for did in range(1, int(rng.randint(3, 7))):
            n_words = int(rng.randint(3, 30))
            words = [vocab[rng.randint(0, len(vocab))] for _ in range(n_words)]
            docs.append((did, " ".join(words)))
        # need at least one bigram per doc
        docs = [(d, t) for d, t in docs if len(t.split()) >= 2]
        path = f"{tmp_path}/c{case}"
        spark.createDataFrame(
            docs, "doc_id long, text string"
        ).write.mode("overwrite").parquet(f"{path}/documents.parquet")

        all_bi = []
        per_doc = {}
        for did, text in docs:
            ws = text.split()
            bs = list(zip(ws, ws[1:]))
            per_doc[did] = bs
            all_bi.extend(bs)
        c12 = Counter(all_bi)
        c1 = Counter(a for a, _ in all_bi)
        n_after = Counter(a for a, _ in set(all_bi))
        n_before = Counter(b for _, b in set(all_bi))
        T = len(c12)
        D = LM_KN_DISCOUNT

        def p(a, b):
            return (c12[(a, b)] - D) / c1[a] + (D * n_after[a] / c1[a]) * (
                n_before[b] / T
            )

        exp = {}
        for did, bs in per_doc.items():
            nlls = [round(-math.log2(p(a, b)), 9) for a, b in bs]
            h = sum(nlls) / len(nlls)
            exp[did] = (len(bs), round(h, 6), round(2**h, 4))
        got = {
            r.doc_id: (r.n_bigrams, r.cross_entropy_bits, r.perplexity)
            for r in q_lm_kn_perplexity(spark, path).collect()
        }
        assert got == exp, f"case {case}: docs={docs}"
