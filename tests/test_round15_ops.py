"""Round-15 additions: locus_statistics_boundaries (C12, reference
study_locus.py:1342) and locus_study_type / annotate_study_type (C13,
reference study_locus.py:233 + study_index.py:226).

Value-exactness is the driver oracle gate (both keys verified at
sf0.001/0.01/0.1 when added); these pin the semantic invariants the
hash gate can't express.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_boundaries_superset_of_cluster_members(spark):
    """Boundary-bounded tags are a SUPERSET of the cluster's own
    members: the flanked [locus_start, locus_end] window contains every
    baseline-significant point that formed the locus, plus any
    sub-significant tags in the flanks — so n_tags >= n_members, with
    the lead position always inside the bounds."""
    from gentropy_spark.plans.genomics import (
        q_locus_breaker,
        q_locus_statistics_boundaries,
    )

    loci = {
        (r.study_id, r.contig, r.cluster_seq): r
        for r in q_locus_breaker(spark, SF).collect()
    }
    rows = q_locus_statistics_boundaries(spark, SF).collect()
    assert rows and len(rows) == len(loci)
    for r in rows:
        base = loci[(r.study_id, r.contig, r.cluster_seq)]
        assert r.n_tags >= base.n_members
        assert 0 < r.n_unique_positions <= r.n_tags
        assert r.locus_start <= r.lead_pos <= r.locus_end
        assert r.tag_signal_mass > 0.0


def test_boundaries_counts_all_points_in_window(spark):
    """Spot-check one locus against a brute-force recount of the raw
    sumstats inside its boundaries (no significance filter)."""
    from gentropy_spark.plans.genomics import (
        q_locus_statistics_boundaries,
        sumstats,
    )

    r = q_locus_statistics_boundaries(spark, SF).orderBy(
        F.col("n_tags").desc(), "study_id", "contig", "cluster_seq"
    ).first()
    brute = (
        sumstats(spark, SF)
        .filter(
            (F.col("study_id") == r.study_id)
            & (F.col("contig") == r.contig)
            & (F.col("pos") >= r.locus_start)
            & (F.col("pos") <= r.locus_end)
        )
        .count()
    )
    assert r.n_tags == brute


def test_annotate_study_type_operator_semantics(spark):
    """Reference contract (study_locus.py:233): LEFT join — loci with
    unknown studies keep NULL type, nothing is filtered — and a stale
    study_type column on the locus side is replaced, not duplicated."""
    from gentropy_spark.operators.coloc import annotate_study_type

    loci = spark.createDataFrame(
        [(1, 10, "stale"), (2, 20, "stale"), (3, 30, None)],
        "study_id int, locus_id int, study_type string",
    )
    idx = spark.createDataFrame(
        [(1, "gwas"), (3, "eqtl")], "study_id int, study_type string"
    )
    out = annotate_study_type(loci, idx)
    assert out.columns.count("study_type") == 1
    got = {r.locus_id: r.study_type for r in out.collect()}
    assert got == {10: "gwas", 20: None, 30: "eqtl"}


def test_bpe_encode_accounting_invariants(spark):
    """Encode applies the SAME merges the trainer emitted, so the
    per-doc accounting is tightly constrained: every word yields at
    least one token and at most its character count; merges never
    cross word boundaries (tokens >= words); chars-per-token is the
    total ratio; and every tokenizable document is covered."""
    from gentropy_spark.plans.llm_pipeline import q_bpe_encode

    from decimal import ROUND_HALF_UP, Decimal

    rows = q_bpe_encode(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_words <= r.n_bpe_tokens <= r.n_chars
        assert r.chars_per_token >= 1.0
        # HALF_UP, not python round() (banker's): a doc with
        # n_bpe_tokens = 128 hits an EXACT binary tie (141/128 =
        # 1.1015625) where Spark and DuckDB both round up.
        want = float(
            Decimal(r.n_chars / r.n_bpe_tokens).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        assert abs(r.chars_per_token - want) < 1e-9
    # doc coverage: one row per document with >= 1 token
    n_docs = (
        spark.read.parquet(f"{SF}/documents.parquet").count()
    )
    assert len(rows) == n_docs


def test_bpe_encode_merges_reduce_tokens(spark, tmp_path):
    """On a corpus where the learned merges fire, BPE token counts are
    strictly below character counts (the merges actually applied) —
    checked against hand-computable words."""
    import pandas as pd

    from gentropy_spark.plans.llm_pipeline import q_bpe_encode

    texts = ["llll llll", "llll", "anan anan banana", "ll lab lab"]
    pd.DataFrame({"doc_id": range(len(texts)), "text": texts}).to_parquet(
        tmp_path / "documents.parquet"
    )
    got = {r.doc_id: r for r in q_bpe_encode(spark, str(tmp_path)).collect()}
    # merges learned: 'l l' (x10), 'a n' (x6), 'an an', 'll ll'
    # (test_bpe_merge_fold_adjacent_occurrences pins this table).
    # llll -> [llll] (l l, then ll ll): 1 token per word
    assert got[0].n_bpe_tokens == 2 and got[0].n_chars == 8
    assert got[1].n_bpe_tokens == 1
    # anan -> [anan]; banana -> [b, anan, a]
    assert got[2].n_bpe_tokens == 1 + 1 + 3
    # ll -> [ll]; lab -> [l, a, b] (no 'l a' merge learned)
    assert got[3].n_bpe_tokens == 1 + 3 + 3


def test_bpe_merge_fold_randomized_cross_engine(spark):
    """Property test for the merge fold: 300 seeded-random symbol
    strings (short alphabet so adjacent/overlapping occurrences are
    dense) merged against a random pair — Spark's aggregate-HOF fold,
    DuckDB's list_reduce fold, and a Python greedy reference must
    agree on every row. Guards the kernel the r14 advisory hit far
    beyond the four hand-picked corpus words."""
    import random

    import duckdb

    from gentropy_spark.plans.llm_pipeline import BPE_MERGE_FOLD_EXPR

    rng = random.Random(1815)
    alphabet = ["a", "b", "ab", "ba", "aa"]
    cases = []
    for i in range(300):
        syms = [rng.choice(alphabet) for _ in range(rng.randint(1, 12))]
        a, b = rng.choice(alphabet), rng.choice(alphabet)
        cases.append((i, " ".join(syms), f"{a} {b}"))

    def ref_merge(sym: str, pair: str) -> str:
        a, b = pair.split(" ")
        syms, out, i = sym.split(" "), [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return " ".join(out)

    expected = {i: ref_merge(s, p) for i, s, p in cases}

    df = spark.createDataFrame(cases, "id int, sym string, _bp string")
    got_spark = {
        r.id: r.merged
        for r in df.select(
            "id", F.expr(BPE_MERGE_FOLD_EXPR).alias("merged")
        ).collect()
    }
    assert got_spark == expected

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE cases(id INT, sym VARCHAR, pair VARCHAR)"
    )
    con.executemany("INSERT INTO cases VALUES (?, ?, ?)", cases)
    duck_fold = """
      SELECT id,
        CASE WHEN len(string_split(sym, ' ')) = 1 THEN sym
        ELSE list_reduce(string_split(sym, ' '),
          (acc, x) -> CASE
            WHEN regexp_extract(acc, '[^ ]*$') = split_part(pair, ' ', 1)
             AND x = split_part(pair, ' ', 2)
            THEN regexp_replace(acc, '[^ ]*$',
              split_part(pair, ' ', 1) || split_part(pair, ' ', 2))
            ELSE acc || ' ' || x END) END AS merged
      FROM cases
    """
    got_duck = dict(con.execute(duck_fold).fetchall())
    assert got_duck == expected


def test_semi_lead_stream_carry_across_arrow_batches(spark):
    """The r15 mapInPandas rewrite of semi_lead_clump streams whole
    partitions; a group straddling two Arrow batches must be carried
    over intact. Force 7-row batches over clusters of width 1..60 and
    compare against an in-test per-group Python walk."""
    from gentropy_spark.operators.clumping import semi_lead_clump

    rows = []
    pid = 0
    # deterministic layout: clusters of growing size, positions spaced
    # so some pairs fall inside the prune window and some outside
    for study in (1, 2):
        base = 0
        for width in (1, 3, 60, 2, 25):
            for i in range(width):
                pid += 1
                rows.append(
                    (pid, study, "c", base + i * 40, float((pid * 37) % 101))
                )
            base += 100_000  # new gap-cluster
    df = spark.createDataFrame(
        rows, "point_id long, study_id long, contig string, pos long, signif double"
    )

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        got = {
            r.point_id: r.is_semi_lead
            for r in semi_lead_clump(df, window=100).collect()
        }
    finally:
        # Restore BOTH ways: when the key was previously unset, leaving
        # maxRecordsPerBatch=7 on the session-scoped SparkSession would
        # silently shrink Arrow batches for every later pandas-UDF test
        # in the run (r15 advisory).
        if old is not None:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old
            )
        else:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")

    # reference: same walk, plain python per cluster
    def clusters(points):
        points = sorted(points, key=lambda r: (r[3], r[0]))
        out, cur, prev = [], [], None
        for r in points:
            if prev is not None and r[3] - prev > 100:
                out.append(cur)
                cur = []
            cur.append(r)
            prev = r[3]
        if cur:
            out.append(cur)
        return out

    expected = {}
    for study in (1, 2):
        pts = [r for r in rows if r[1] == study]
        for cl in clusters(pts):
            chosen = []
            for r in sorted(cl, key=lambda r: (-r[4], r[3], r[0])):
                ok = all(abs(r[3] - c) >= 100 for c in chosen)
                if ok:
                    chosen.append(r[3])
                expected[r[0]] = ok
    assert got == expected
    assert len(got) == len(rows)


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_boundaries_plan_is_broadcast_range_join(spark):
    """Scale-posture pin: the clumped side is the broadcast dimension
    (reference study_locus.py:1365 broadcasts it too) and the agg side
    broadcasts back for the left join — the sumstat fact table must
    never reach a sort-merge exchange or a nested-loop join."""
    from gentropy_spark.plans.genomics import q_locus_statistics_boundaries

    plan = _formatted(q_locus_statistics_boundaries(spark, SF))
    # exactly two joins, both broadcast-hash ("formatted" prints each
    # node twice: tree line + detail block)
    assert plan.count("Join type:") == 2
    assert plan.count("+- BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_locus_study_type_plan_broadcasts_lut(spark):
    from gentropy_spark.plans.genomics import q_locus_study_type

    plan = _formatted(q_locus_study_type(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_locus_study_type_never_filters(spark):
    """Annotation preserves the locus table's cardinality (the LUT is
    unique per study, the join is LEFT) and every non-null type comes
    from the 5-value segment mapping."""
    from gentropy_spark.plans.genomics import (
        _SEGMENT_STUDY_TYPE,
        q_locus_study_type,
        q_window_clump_leads,
    )

    rows = q_locus_study_type(spark, SF).collect()
    assert len(rows) == q_window_clump_leads(spark, SF).count()
    types = {r.study_type for r in rows}
    assert types - {None} <= set(_SEGMENT_STUDY_TYPE.values())
