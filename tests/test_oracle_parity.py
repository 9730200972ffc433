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


def _spark_dtype_class(dt) -> str:
    """Collapse a Spark type to its pandas-bridge physical class.

    The driver's hash gate compares pandas values, so what matters is
    the dtype each engine's pandas bridge produces, not the logical
    type: Spark DECIMAL surfaces as `object` (decimal.Decimal) while
    DuckDB DECIMAL converts to float64 — identical values, failed
    hash. This classifier encodes that bridge.
    """
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "spark-decimal"  # pandas object — never hash-matches DuckDB
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.DateType):
        return "date"
    return "obj"


def _duck_dtype_class(type_name: str) -> str:
    t = type_name.upper()
    if t == "HUGEINT":
        return "hugeint"  # pandas float64/object — never pair with int
    if t.startswith("DECIMAL"):
        return "float"  # DuckDB's pandas bridge converts DECIMAL to float64
    if t in {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}:
        return "int"
    if t in {"FLOAT", "REAL", "DOUBLE"}:
        return "float"
    if t == "VARCHAR":
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t == "DATE":
        return "date"
    return "obj"


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
    # Physical-dtype-class gate (binding only, no re-execution): the
    # driver hashes pandas values, so a Spark int64 against a DuckDB
    # HUGEINT — or a Spark DECIMAL against anything — fails its hash
    # even when every value is equal. Assert class parity up front so
    # a dtype regression is caught here, not in CORRECTNESS_r{N}.
    d_types = {
        r[0]: r[1]
        for r in con.execute(f"DESCRIBE (\n{spec.oracle}\n)").fetchall()
    }
    con.close()
    s_types = {f.name: f.dataType for f in sdf.schema.fields}
    dtype_mismatches = []
    for c in s_cols:
        sc = _spark_dtype_class(s_types[c])
        dc = _duck_dtype_class(d_types.get(c, "?"))
        if sc != dc:
            dtype_mismatches.append((c, sc, d_types.get(c, "?")))
    assert not dtype_mismatches, (
        f"{name}: pandas-bridge dtype class mismatch (driver hash would "
        f"fail even with equal values): {dtype_mismatches}"
    )

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
