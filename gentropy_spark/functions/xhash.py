"""Cross-engine deterministic hashing (SURVEY §2.E3/E4/E6 upgrade).

``xxhash64`` is Spark-only, so any operator built on it can only be
rows-checked against the DuckDB oracle. This module provides a seeded
polynomial (Horner) hash built ONLY from arithmetic both engines
evaluate identically — ``ascii``/``substr``/``length``, 64-bit integer
``*``/``+``/``%`` — so MinHash signatures, SimHash fingerprints and
LSH band buckets come out bit-identical in Spark and DuckDB and the
full value-hash gate applies.

Design notes for 100 TB:
- The Spark side is a fully unrolled Column expression (no UDF, no
  higher-order function): stays inside whole-stage codegen.
- Horner with base 31/37 mod a ~2^31 prime: every intermediate fits
  int64 — max ``(2^31)·37 + 0x10FFFF``, since ``ascii()`` returns full
  Unicode CODE POINTS (≤ 0x10FFFF, not bytes) in BOTH engines, which
  is also what keeps every ``%`` operand non-negative for parity.
- Truncation to the first ``nchars`` chars plus a length mix keeps the
  expression bounded; collisions only widen LSH candidate sets, which
  downstream exact verification filters — output quality is preserved.

Mirrors the role of reference hash utilities (study_locus.py:628 uses
md5-of-keys for ids) without copying any implementation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Two independent 31-bit channels (distinct primes & bases).
M1, B1 = 2_147_483_647, 31  # 2^31 - 1 (Mersenne prime)
M2, B2 = 2_147_483_629, 37
# Band-bucket combiner base (any odd constant < 2^21 keeps mod-free
# intermediates < 2^63 when combined with 31-bit minima).
BAND_B = 1_000_003


def poly_hash(
    col: Column | str, nchars: int = 32, base: int = B1, mod: int = M1
) -> Column:
    """Horner hash of the first ``nchars`` chars + length mix (Spark side).

    ``ascii(substring(s, k, 1))`` is 0 past the end of the string in
    both engines, so short strings need no special-casing.

    Pass a STRING (column name or Spark-SQL fragment) to take the
    single-round-trip ``F.expr`` path (r17): the Column-operator form
    issues ~10 py4j calls per Horner level (~0.5s of driver wall per
    call at nchars=32), where one parsed SQL string builds the
    IDENTICAL expression tree in one round trip. The Column overload
    stays for call sites whose input cannot be referenced from SQL
    text (HOF lambda variables). The string form is interpolated into
    SQL text UNESCAPED — it is a TRUSTED fragment (engine-internal
    column names / expressions only), never user data.
    """
    if isinstance(col, str):
        return F.expr(_poly_hash_spark_sql(col, nchars, base, mod))
    # Every operand is explicitly BIGINT: mixed int/long literals in a
    # 33-deep nested expression make the analyzer's type-coercion
    # fixed-point exceed its iteration cap.
    b, m = F.lit(base).cast("long"), F.lit(mod).cast("long")
    h: Column = F.lit(1).cast("long")
    for k in range(1, nchars + 1):
        h = (h * b + F.ascii(F.substring(col, k, 1)).cast("long")) % m
    return (h * b + F.length(col).cast("long")) % m


def _poly_hash_spark_sql(
    expr: str, nchars: int = 32, base: int = B1, mod: int = M1
) -> str:
    """The identical Horner chain as Spark-SQL text — the same explicit
    BIGINT casts as the Column form (the analyzer's type-coercion
    fixed-point cap applies to parsed trees too)."""
    b = f"CAST({base} AS BIGINT)"
    m = f"CAST({mod} AS BIGINT)"
    h = "CAST(1 AS BIGINT)"
    for k in range(1, nchars + 1):
        h = (
            f"(({h}) * {b} + CAST(ascii(substring({expr}, {k}, 1)) AS BIGINT))"
            f" % {m}"
        )
    return f"(({h}) * {b} + CAST(length({expr}) AS BIGINT)) % {m}"


def poly_hash_sql(expr: str, nchars: int = 32, base: int = B1, mod: int = M1) -> str:
    """The identical Horner hash as DuckDB SQL text."""
    h = "CAST(1 AS BIGINT)"
    for k in range(1, nchars + 1):
        h = f"(({h}) * {base} + ascii(substr({expr}, {k}, 1))) % {mod}"
    return f"(({h}) * {base} + LENGTH({expr})) % {mod}"


def seed_coeffs(num: int, mod: int = M1) -> list[tuple[int, int]]:
    """Deterministic (a, c) affine-rehash coefficients per MinHash seed.

    h_s = (a_s·h + c_s) mod M — the standard one-base-hash universal
    family; a_s kept odd and nonzero.
    """
    out = []
    for s in range(num):
        a = (s * 2_654_435_761 + 1) % mod
        if a % 2 == 0:
            a += 1
        c = (s * 40_503 + 17) % mod
        out.append((a, c))
    return out


def seeded(h: Column, a: int, c: int, mod: int = M1) -> Column:
    """Affine rehash of a base hash (Spark side); int64-safe (a,h < 2^31)."""
    return (h * a + c) % mod


def seeded_sql(expr: str, a: int, c: int, mod: int = M1) -> str:
    return f"(({expr}) * {a} + {c}) % {mod}"


def band_bucket(minima: list[Column], mod: int = M1) -> Column:
    """Combine per-band MinHash minima into one bucket id (Horner)."""
    h = minima[0] % mod
    for m in minima[1:]:
        h = (h * BAND_B + m) % mod
    return h


def band_bucket_sql(exprs: list[str], mod: int = M1) -> str:
    h = f"(({exprs[0]}) % {mod})"
    for e in exprs[1:]:
        h = f"((({h}) * {BAND_B} + ({e})) % {mod})"
    return h
