"""Late-r9 LLM-pipeline operators (E33-E38): independent python
references at sf0.001 plus structural invariants.

The DuckDB oracle gate already proves cross-engine value parity; these
tests prove the SHARED algorithm is the intended one by recomputing it
a third way (plain python) from the raw parquet.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import duckdb
import pytest

TOK_RE = re.compile(r"[^a-z0-9]+")


def _docs(sf_dir):
    return duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()


def _toks(text):
    return [t for t in TOK_RE.split(text.lower()) if t]


# --- E33 dedup_substring ---------------------------------------------------
def test_dedup_substring_matches_python_reference(spark, sf_dir):
    from gentropy_spark.plans.llm_pipeline import SUBSTR_K, q_dedup_substring

    docs = _docs(sf_dir)
    occ = Counter()
    windows = {}
    for doc_id, text in docs:
        t = _toks(text)
        ws = [
            hashlib.md5(" ".join(t[i : i + SUBSTR_K]).encode()).hexdigest()
            for i in range(len(t) - SUBSTR_K + 1)
        ]
        windows[doc_id] = ws
        occ.update(ws)
    expected = {
        doc_id: (len(ws), sum(1 for h in ws if occ[h] > 1))
        for doc_id, ws in windows.items()
    }
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_fraction"])
        for r in q_dedup_substring(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for doc_id, (nw, nd) in expected.items():
        gnw, gnd, frac = got[doc_id]
        assert (gnw, gnd) == (nw, nd), doc_id
        assert frac == pytest.approx(round(nd / max(nw, 1), 6), abs=1e-9)
    # if the corpus carries exact-duplicate docs (sf-dependent), their
    # windows must all be flagged (dup_fraction == 1)
    texts = Counter(text for _, text in docs)
    for d, t in docs:
        if texts[t] > 1 and len(_toks(t)) >= SUBSTR_K:
            assert got[d][2] == 1.0
    # near-dup structure exists at every SF: some window repeats
    assert any(nd > 0 for _, nd, _ in got.values())


# --- E34 quality_gopher ----------------------------------------------------
def test_quality_gopher_matches_python_reference(spark, sf_dir):
    from gentropy_spark.plans import llm_pipeline as L

    rows = {r["doc_id"]: r for r in L.q_quality_gopher(spark, sf_dir).collect()}
    n_keep = 0
    for doc_id, text in _docs(sf_dir):
        ws = [w for w in re.split(r"\s+", text) if w]
        toks = set(_toks(text))
        n = len(ws)
        denom = max(n, 1)
        mean_len = round(sum(len(w) for w in ws) / denom, 6)
        sym = round(
            (text.count("#") + len(re.findall(r"\.\.\.", text))) / denom, 6
        )
        alpha = round(
            sum(1 for w in ws if re.search("[a-zA-Z]", w)) / denom, 6
        )
        stop = sum(1 for s in L.GOPHER_STOPWORDS if s in toks)
        r = rows[doc_id]
        assert r["n_words"] == n
        assert r["mean_word_len"] == pytest.approx(mean_len, abs=1e-9)
        assert r["symbol_ratio"] == pytest.approx(sym, abs=1e-9)
        assert r["alpha_word_ratio"] == pytest.approx(alpha, abs=1e-9)
        assert r["n_stop_hits"] == stop
        keep = (
            L.GOPHER_MIN_WORDS <= n <= L.GOPHER_MAX_WORDS
            and L.GOPHER_MIN_MEAN_LEN <= mean_len <= L.GOPHER_MAX_MEAN_LEN
            and sym < L.GOPHER_MAX_SYMBOL_RATIO
            and alpha >= L.GOPHER_MIN_ALPHA_RATIO
            and stop >= L.GOPHER_MIN_STOP_HITS
        )
        assert r["keep"] == keep, doc_id
        n_keep += keep
    # the decision must be discriminative on the synthetic corpus
    assert 0 < n_keep < len(rows)


# --- E35 doc_entropy -------------------------------------------------------
def test_doc_entropy_matches_python_reference(spark, sf_dir):
    from gentropy_spark.plans.llm_pipeline import q_doc_entropy

    rows = {r["doc_id"]: r for r in q_doc_entropy(spark, sf_dir).collect()}
    for doc_id, text in _docs(sf_dir):
        c = Counter(_toks(text))
        n = sum(c.values())
        r = rows[doc_id]
        assert r["n_tokens"] == n
        assert r["n_distinct"] == len(c)
        if n:
            h = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
            assert r["entropy"] == pytest.approx(round(h, 6), abs=1e-6)
            assert r["max_tok_ratio"] == pytest.approx(
                round(max(c.values()) / n, 6), abs=1e-9
            )


# --- E36 minhash_calibration ----------------------------------------------
def test_minhash_calibration_invariants(spark, sf_dir):
    from gentropy_spark.plans.llm_pipeline import q_minhash_calibration

    rows = q_minhash_calibration(spark, sf_dir).collect()
    assert rows
    texts = dict(_docs(sf_dir))
    for r in rows:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["abs_err"] == pytest.approx(
            round(abs(r["est_jaccard"] - r["jaccard"]), 6), abs=1e-9
        )
        # identical documents: identical shingle sets => identical
        # signatures => both estimator and exact must be 1
        if texts[r["id_a"]] == texts[r["id_b"]]:
            assert r["est_jaccard"] == 1.0 and r["jaccard"] == 1.0
    # the estimator must actually discriminate across candidates
    assert len({r["est_jaccard"] for r in rows}) > 1


# --- E37 cms_heavy_hitters -------------------------------------------------
def test_cms_matches_python_reference(spark, sf_dir):
    from gentropy_spark.functions.xhash import M1, seed_coeffs
    from gentropy_spark.plans.llm_pipeline import (
        CMS_D,
        CMS_W,
        q_cms_heavy_hitters,
    )

    def py_poly_hash(s, nchars=32, base=31, mod=M1):
        h = 1
        for k in range(nchars):
            h = (h * base + (ord(s[k]) if k < len(s) else 0)) % mod
        return (h * base + len(s)) % mod

    true_n = Counter()
    for _, text in _docs(sf_dir):
        true_n.update(_toks(text))
    coeffs = seed_coeffs(CMS_D)
    grid = [[0] * CMS_W for _ in range(CMS_D)]
    buckets = {}
    for tok, n in true_n.items():
        h = py_poly_hash(tok)
        bs = [((h * a + c) % M1) % CMS_W for a, c in coeffs]
        buckets[tok] = bs
        for d, b in enumerate(bs):
            grid[d][b] += n
    rows = {r["tok"]: r for r in q_cms_heavy_hitters(spark, sf_dir).collect()}
    assert set(rows) == set(true_n)
    for tok, n in true_n.items():
        est = min(grid[d][b] for d, b in enumerate(buckets[tok]))
        r = rows[tok]
        assert r["true_n"] == n
        assert r["est_n"] == est
        assert r["overcount"] == est - n
        assert r["est_n"] >= r["true_n"]  # CMS one-sided error guarantee


# --- E38 zipf_fit ----------------------------------------------------------
def test_zipf_fit_matches_python_reference(spark, sf_dir):
    from gentropy_spark.plans.llm_pipeline import q_zipf_fit

    true_n = Counter()
    for _, text in _docs(sf_dir):
        true_n.update(_toks(text))
    ranked = sorted(true_n.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [round(math.log(i + 1), 6) for i in range(len(ranked))]
    ys = [round(math.log(c), 6) for _, c in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    (row,) = q_zipf_fit(spark, sf_dir).collect()
    assert row["n_vocab"] == n
    assert row["n_tokens"] == sum(true_n.values())
    assert row["zipf_slope"] == pytest.approx(slope, abs=1e-5)
    assert row["zipf_intercept"] == pytest.approx(intercept, abs=1e-5)
    assert row["r2"] == pytest.approx(r2, abs=1e-5)
    assert row["zipf_slope"] < 0  # frequency decreases with rank


# --- empty/degenerate-document parity (review finding r9) -----------------
def test_gopher_and_quality_parity_on_empty_docs(spark, tmp_path):
    """DuckDB list_sum([]) is NULL while Spark F.aggregate init-0 is 0;
    both oracles must COALESCE so an empty or whitespace-only document
    keeps identical flags cross-engine (latent until a corpus refresh
    ships such a doc — the oracle gate never sees one today)."""
    import duckdb as dk
    import pandas as pd

    from gentropy_spark.plans import llm_pipeline as L

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["", "   \t  ", "### ... ###", "the quick brown fox " * 20],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [0, 6, 11, 400],
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    docs.to_parquet(d / "documents.parquet", index=False)
    con = dk.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    for fn, sql in [
        (L.q_quality_gopher, L.QUALITY_GOPHER_SQL),
        (L.q_text_quality, L.TEXT_QUALITY_SQL),
    ]:
        sdf = fn(spark, str(d))
        srows = {tuple(r)[0]: tuple(r)[1:] for r in sdf.collect()}
        res = con.execute(sql)
        cols = [c[0] for c in res.description]
        assert cols == sdf.columns
        drows = {r[0]: r[1:] for r in res.fetchall()}
        assert srows.keys() == drows.keys()
        for k in srows:
            for sv, dv in zip(srows[k], drows[k]):
                if isinstance(sv, float):
                    assert dv == pytest.approx(sv, abs=1e-9), (fn.__name__, k)
                else:
                    assert sv == dv, (fn.__name__, k)


# --- A23 hll_distinct ------------------------------------------------------
def test_hll_matches_python_reference(spark, sf_dir):
    from gentropy_spark.functions.xhash import M1
    from gentropy_spark.plans.relational import (
        HLL_ALPHA,
        HLL_M,
        HLL_SUB_BITS,
        q_hll_distinct,
    )

    def py_poly_hash(s, nchars=32, base=31, mod=M1):
        h = 1
        for k in range(nchars):
            h = (h * base + (ord(s[k]) if k < len(s) else 0)) % mod
        return (h * base + len(s)) % mod

    ev = duckdb.sql(
        f"SELECT event_type, CAST(user_id AS VARCHAR) FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    regs: dict[str, dict[int, int]] = {}
    exact: dict[str, set] = {}
    for et, uk in ev:
        h = py_poly_hash(uk)
        w = h // HLL_M
        rho = (HLL_SUB_BITS + 1) if w == 0 else (
            HLL_SUB_BITS + 1 - w.bit_length()
        )
        r = regs.setdefault(et, {})
        j = h % HLL_M
        r[j] = max(r.get(j, 0), rho)
        exact.setdefault(et, set()).add(uk)
    rows = {r["event_type"]: r for r in q_hll_distinct(spark, sf_dir).collect()}
    assert set(rows) == set(regs)
    for et, r in regs.items():
        z = sum(2.0 ** -m for m in r.values()) + (HLL_M - len(r))
        raw = HLL_ALPHA * HLL_M * HLL_M / z
        zeros = HLL_M - len(r)
        if raw <= 2.5 * HLL_M and zeros > 0:
            est = round(HLL_M * math.log(HLL_M / zeros), 6)
        else:
            est = round(raw, 6)
        got = rows[et]
        assert got["n_registers_hit"] == len(r)
        assert got["exact_distinct"] == len(exact[et])
        assert got["est_distinct"] == pytest.approx(est, abs=1e-6)
        # HLL with m=64 has ~13% standard error; 3 sigma bound
        assert abs(est - len(exact[et])) / len(exact[et]) < 0.4


# --- E39 bigram_pmi --------------------------------------------------------
def test_bigram_pmi_matches_python_reference(spark, sf_dir):
    from gentropy_spark.plans.llm_pipeline import PMI_MIN_COUNT, q_bigram_pmi

    c12 = Counter()
    for _, text in _docs(sf_dir):
        t = _toks(text)
        c12.update(zip(t, t[1:]))
    c1 = Counter()
    c2 = Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        c2[w2] += c
    n = sum(c12.values())
    expected = {
        (w1, w2): (c, round(math.log(c * n / (c1[w1] * c2[w2])), 6))
        for (w1, w2), c in c12.items()
        if c >= PMI_MIN_COUNT
    }
    got = {
        (r["w1"], r["w2"]): (r["n_pair"], r["pmi"])
        for r in q_bigram_pmi(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for k, (c, pmi) in expected.items():
        assert got[k][0] == c
        assert got[k][1] == pytest.approx(pmi, abs=1e-6)


# --- E40 ann_recall_eval ---------------------------------------------------
def test_ann_recall_eval_consistent_with_components(spark, sf_dir):
    from gentropy_spark.plans.llm_pipeline import (
        q_ann_cosine_topk,
        q_ann_ivf,
        q_ann_ivfpq,
        q_ann_lsh,
        q_ann_pq,
        q_ann_pca_topk,
        q_ann_recall_eval,
    )

    truth = {
        (r["query_id"], r["corpus_id"])
        for r in q_ann_cosine_topk(spark, sf_dir).collect()
    }
    retrieved = {
        "lsh": {
            (r["query_id"], r["corpus_id"])
            for r in q_ann_lsh(spark, sf_dir).collect()
        },
        "ivf": {
            (r["query_id"], r["corpus_id"])
            for r in q_ann_ivf(spark, sf_dir).collect()
        },
        "pq": {
            (r["query_id"], r["corpus_id"])
            for r in q_ann_pq(spark, sf_dir).collect()
        },
        # r16: the composed IVF-PQ leg joined the eval
        "ivfpq": {
            (r["query_id"], r["corpus_id"])
            for r in q_ann_ivfpq(spark, sf_dir).collect()
        },
        # r17: the PCA-banded prefilter leg (E53)
        "pca": {
            (r["query_id"], r["corpus_id"])
            for r in q_ann_pca_topk(spark, sf_dir).collect()
        },
    }
    rows = q_ann_recall_eval(spark, sf_dir).collect()
    assert len(rows) == 5 * len({q for q, _ in truth})
    for r in rows:
        got = {
            p for p in retrieved[r["method"]] if p[0] == r["query_id"]
        }
        hits = got & {p for p in truth if p[0] == r["query_id"]}
        assert r["n_retrieved"] == len(got)
        assert r["n_hit"] == len(hits)
        assert r["recall_at_5"] == pytest.approx(
            round(len(hits) / 5.0, 6), abs=1e-9
        )
        assert 0.0 <= r["recall_at_5"] <= 1.0


# --- E41 dup_pagerank ------------------------------------------------------
def test_dup_pagerank_matches_python_reference(spark, sf_dir):
    from gentropy_spark.plans.llm_pipeline import (
        PR_DAMP,
        PR_ITERS,
        q_dedup_minhash,
        q_dup_pagerank,
    )

    pairs = [
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in q_dedup_minhash(spark, sf_dir).collect()
    ]
    edges: dict[int, list[tuple[int, float]]] = {}
    for a, b, w in pairs:
        edges.setdefault(a, []).append((b, w))
        edges.setdefault(b, []).append((a, w))
    wsum = {u: round(sum(w for _, w in nb), 6) for u, nb in edges.items()}
    n = len(edges)
    pr = {u: round(1.0 / n, 12) for u in edges}
    for _ in range(PR_ITERS):
        inflow: dict[int, float] = {u: 0.0 for u in edges}
        for u, nb in edges.items():
            for v, w in nb:
                inflow[v] += round(pr[u] * w / wsum[u], 12)
        pr = {
            u: round((1.0 - PR_DAMP) / n + PR_DAMP * inflow[u], 12)
            for u in edges
        }
    rows = {r["doc_id"]: r for r in q_dup_pagerank(spark, sf_dir).collect()}
    assert set(rows) == set(edges)
    total = 0.0
    for u in edges:
        assert rows[u]["degree"] == len(edges[u])
        assert rows[u]["strength"] == pytest.approx(wsum[u], abs=1e-9)
        assert rows[u]["pagerank"] == pytest.approx(round(pr[u], 6), abs=1e-6)
        total += rows[u]["pagerank"]
    # rank mass is conserved on a graph with no dangling nodes
    assert total == pytest.approx(1.0, abs=1e-3)


# --- E42 chunk_documents ---------------------------------------------------
def test_chunk_documents_matches_python_reference(spark, sf_dir):
    from gentropy_spark.plans.llm_pipeline import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        q_chunk_documents,
    )

    expected = {}
    for doc_id, text in _docs(sf_dir):
        t = _toks(text)
        if not t:
            continue
        last_start = max(len(t) - (CHUNK_SIZE - CHUNK_STRIDE), 1)
        for start in range(1, last_start + 1, CHUNK_STRIDE):
            ntok = min(CHUNK_SIZE, len(t) - start + 1)
            h = hashlib.md5(
                " ".join(t[start - 1 : start - 1 + ntok]).encode()
            ).hexdigest()
            expected[(doc_id, (start - 1) // CHUNK_STRIDE)] = (
                start,
                ntok,
                h,
            )
    got = {
        (r["doc_id"], r["chunk_idx"]): (
            r["start_tok"],
            r["n_tokens"],
            r["chunk_hash"],
        )
        for r in q_chunk_documents(spark, sf_dir).collect()
    }
    assert got == expected
    # overlap invariant: consecutive chunks overlap by size - stride
    assert CHUNK_SIZE > CHUNK_STRIDE


# --- E43 source_drift ------------------------------------------------------
def test_source_drift_matches_python_reference(spark, sf_dir):
    from gentropy_spark.plans.llm_pipeline import q_source_drift

    sc: dict[tuple, int] = Counter()
    rows_raw = duckdb.sql(
        f"SELECT source, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    for src, text in rows_raw:
        for t in _toks(text):
            sc[(src, t)] += 1
    corpus = Counter()
    for (s, t), c in sc.items():
        corpus[t] += c
    v = len(corpus)
    n_corpus = sum(corpus.values())
    src_tot = Counter()
    for (s, t), c in sc.items():
        src_tot[s] += c
    got = {r["source"]: r for r in q_source_drift(spark, sf_dir).collect()}
    assert set(got) == set(src_tot)
    for s, n_src in src_tot.items():
        kl = js = 0.0
        for t, c_t in corpus.items():
            p = (sc.get((s, t), 0) + 1) / (n_src + v)
            q = (c_t + 1) / (n_corpus + v)
            m = (p + q) / 2
            kl += p * math.log(p / q)
            js += (p * math.log(p / m) + q * math.log(q / m)) / 2
        r = got[s]
        assert r["n_tokens"] == n_src
        assert r["kl_vs_corpus"] == pytest.approx(kl, abs=1e-5)
        assert r["js_divergence"] == pytest.approx(js, abs=1e-5)
        assert r["kl_vs_corpus"] >= 0 and r["js_divergence"] >= 0


# --- r11: Bloom-filter decontamination --------------------------------------
def test_bloom_decontaminate_dominates_exact(spark, sf_dir):
    """The Bloom probe must never miss a truly contaminated shingle
    (no false negatives — per-doc bloom hits >= exact contaminated
    count), the overshoot is the deterministic false-positive mass,
    and the filter's word table stays at its fixed size bound."""
    from pyspark.sql import functions as F

    from gentropy_spark.plans.llm_pipeline import (
        BLOOM_M_BITS,
        BLOOM_WORD_BITS,
        q_bloom_decontaminate,
        q_decontaminate,
    )

    bloom = {
        r["doc_id"]: r["n_bloom_hits"]
        for r in q_bloom_decontaminate(spark, sf_dir).collect()
    }
    exact = {
        r["doc_id"]: r["n_contaminated"]
        for r in q_decontaminate(spark, sf_dir).collect()
    }
    assert bloom.keys() == exact.keys()
    assert all(bloom[d] >= exact[d] for d in exact)
    # some docs ARE contaminated (the probe is not vacuous)
    assert any(v > 0 for v in exact.values())


def test_bloom_probe_side_is_explode_free(spark, sf_dir):
    """r12 (verdict #8): training shingles evaluate their K Bloom
    probes INLINE against the broadcast dense word array — no
    K-way position explode on the probe side. The only Generate
    nodes allowed are the two shingle generators plus the (tiny)
    bench-side position explode that builds the filter."""
    from gentropy_spark.plans.llm_pipeline import (
        BLOOM_M_BITS,
        BLOOM_WORD_BITS,
        q_bloom_decontaminate,
    )
    from gentropy_spark.session import release_caches

    # cache-free plan: a live InMemoryRelation from an earlier test
    # PRINTS its cached subtree (including its Generate), which would
    # double-count nodes that execute once
    release_caches()
    plan = (
        q_bloom_decontaminate(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    n_generate = plan.count("Generate ")
    assert n_generate <= 3, f"{n_generate} Generate nodes:\n{plan[:2000]}"
    # the probe-side conjunction reads the broadcast array inline
    assert "bloom_words" in plan
    # fixed-size guarantee: the filter can never exceed M/word_bits words
    assert BLOOM_M_BITS // BLOOM_WORD_BITS == 4096
