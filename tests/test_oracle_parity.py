"""Oracle parity harness — mirrors the driver's correctness gate.

For every registry entry with an oracle, run the Spark query and the
DuckDB SQL on the same sf0.001 parquet and compare row count, column
names, and sorted values (floats exactly — the queries are designed
for bit-level agreement; any mismatch here means the driver's
value-hash gate would fail too).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from gentropy_spark.plans import full_registry

REGISTRY = full_registry()
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bool):
        return bool(v)
    return v


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    # key=repr: tuples may mix None with floats, which plain < rejects.
    return sorted(
        (tuple(_norm_cell(r[i]) for i in idx) for r in rows), key=repr
    )


@pytest.mark.parametrize(
    "name", [n for n, s in REGISTRY.items() if s.oracle is not None]
)
def test_oracle_parity(spark, sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    res = con.execute(spec.oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"

    sn = _norm_rows(s_cols, s_rows)
    dn = _norm_rows(d_cols, d_rows)
    mismatches = [
        (a, b) for a, b in zip(sn, dn) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize(
    "name", [n for n, s in REGISTRY.items() if s.oracle is None]
)
def test_rows_only_queries_run(spark, sf_dir, name):
    sdf = REGISTRY[name].fn(spark, sf_dir)
    assert sdf.count() >= 0
