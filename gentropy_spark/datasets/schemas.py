"""Canonical dataset schemas + recursive schema comparison (SURVEY §2.F3+).

Re-expresses the reference's schema layer
(/root/reference/src/gentropy/common/schemas.py:59 compare_array_schemas,
:121 compare_struct_schemas, plus the versioned JSON schema assets under
dataset/schemas/) with the same checking semantics, as original code:

1. duplicated columns in the observed schema;
2. missing MANDATORY (non-nullable) columns;
3. unexpected (extra) columns — reported, not fatal;
4. non-matching types;
5. recursion into struct fields and array element types.

``CANONICAL`` holds the engine's versioned canonical schemas; a dataset
producer validates with ``validate_against(df.schema, "sumstats")`` and
decides policy from the returned issue dict (the reference fails on
mandatory/type issues and tolerates unexpected columns — helper
``is_fatal`` encodes that split).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import types as T


def compare_structs(
    observed: T.StructType,
    expected: T.StructType,
    prefix: str = "",
    issues: defaultdict[str, list[str]] | None = None,
) -> defaultdict[str, list[str]]:
    """Recursively collect schema issues (observed vs expected)."""
    if issues is None:
        issues = defaultdict(list)

    names = [f.name for f in observed.fields]
    for name in sorted({n for n in names if names.count(n) > 1}):
        issues["duplicated_columns"].append(f"{prefix}{name}")

    observed_by_name = {f.name: f for f in observed.fields}
    expected_by_name = {f.name: f for f in expected.fields}

    for f in expected.fields:
        if not f.nullable and f.name not in observed_by_name:
            issues["missing_mandatory_columns"].append(f"{prefix}{f.name}")

    for name, field in observed_by_name.items():
        if name not in expected_by_name:
            issues["unexpected_columns"].append(f"{prefix}{name}")
            continue
        obs_t, exp_t = field.dataType, expected_by_name[name].dataType
        if obs_t.typeName() != exp_t.typeName():
            issues["columns_with_non_matching_type"].append(
                f'column "{prefix}{name}": {obs_t.typeName()} != {exp_t.typeName()}'
            )
        elif isinstance(obs_t, T.StructType):
            compare_structs(obs_t, exp_t, f"{prefix}{name}.", issues)
        elif isinstance(obs_t, T.ArrayType):
            _compare_arrays(obs_t, exp_t, f"{prefix}{name}", issues)
    return issues


def _compare_arrays(
    observed: T.ArrayType,
    expected: T.ArrayType,
    prefix: str,
    issues: defaultdict[str, list[str]],
) -> None:
    obs_e, exp_e = observed.elementType, expected.elementType
    if obs_e.typeName() != exp_e.typeName():
        issues["columns_with_non_matching_type"].append(
            f'column "{prefix}[]": {obs_e.typeName()} != {exp_e.typeName()}'
        )
    elif isinstance(obs_e, T.StructType):
        compare_structs(obs_e, exp_e, f"{prefix}[].", issues)
    elif isinstance(obs_e, T.ArrayType):
        _compare_arrays(obs_e, exp_e, f"{prefix}[]", issues)


def is_fatal(issues: dict[str, list[str]]) -> bool:
    """Reference policy: mandatory/type/duplication issues fail the
    dataset; unexpected columns are tolerated."""
    fatal_keys = (
        "missing_mandatory_columns",
        "columns_with_non_matching_type",
        "duplicated_columns",
    )
    return any(issues.get(k) for k in fatal_keys)


def _req(name: str, dtype: T.DataType) -> T.StructField:
    return T.StructField(name, dtype, nullable=False)


def _opt(name: str, dtype: T.DataType) -> T.StructField:
    return T.StructField(name, dtype, nullable=True)


# Versioned canonical schemas (role of dataset/schemas/*.json).
CANONICAL: dict[str, tuple[str, T.StructType]] = {
    "sumstats": (
        "1.0",
        T.StructType(
            [
                _req("point_id", T.LongType()),
                _req("study_id", T.LongType()),
                _req("contig", T.StringType()),
                _req("pos", T.LongType()),
                _req("signif", T.DoubleType()),
            ]
        ),
    ),
    "study_locus": (
        "1.0",
        T.StructType(
            [
                _req("study_id", T.LongType()),
                _req("contig", T.StringType()),
                _req("cluster_seq", T.LongType()),
                _req("locus_start", T.LongType()),
                _req("locus_end", T.LongType()),
                _opt("lead_point_id", T.LongType()),
                _opt("lead_signif", T.DoubleType()),
            ]
        ),
    ),
    "credible_set": (
        "1.0",
        T.StructType(
            [
                _req("study_id", T.LongType()),
                _req("contig", T.StringType()),
                _req("cluster_seq", T.LongType()),
                _req("point_id", T.LongType()),
                _opt("pics_pp", T.DoubleType()),
            ]
        ),
    ),
    "documents": (
        "1.0",
        T.StructType(
            [
                _req("doc_id", T.LongType()),
                _req("text", T.StringType()),
            ]
        ),
    ),
    "embeddings": (
        "1.0",
        T.StructType(
            [
                _req("vec_id", T.LongType()),
                _req("embedding", T.ArrayType(T.FloatType())),
                _opt("label", T.IntegerType()),
            ]
        ),
    ),
}


def validate_against(
    observed: T.StructType, canonical_name: str
) -> dict[str, list[str]]:
    """Compare an observed schema against a named canonical schema."""
    if canonical_name not in CANONICAL:
        raise KeyError(
            f"unknown canonical schema {canonical_name!r}; "
            f"have {sorted(CANONICAL)}"
        )
    _, expected = CANONICAL[canonical_name]
    return dict(compare_structs(observed, expected))
