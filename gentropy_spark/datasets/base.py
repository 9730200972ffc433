"""Typed dataset wrapper (SURVEY §2.F3).

Re-expresses the reference's Dataset base
(/root/reference/src/gentropy/dataset/dataset.py: schema-validated
wrapper with ``validate_schema``, ``filter``, flag helpers) as a thin
composition layer: the wrapped object is ALWAYS a plain DataFrame —
operators take/return DataFrames and never require the wrapper, so
Catalyst sees undecorated plans.

Validation semantics kept from the reference:
- missing mandatory columns fail fast;
- extra columns are allowed (the reference allows subsetting with
  unexpected columns flagged) but recorded;
- nullability is advisory (parquet round-trips relax it), as in the
  reference's flexible schema comparison.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SchemaValidationError(ValueError):
    pass


@dataclass
class TypedDataset:
    df: DataFrame
    schema: T.StructType
    name: str = "dataset"
    extra_columns: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        expected = {f.name: f.dataType for f in self.schema.fields}
        got = {f.name: f.dataType for f in self.df.schema.fields}
        missing = expected.keys() - got.keys()
        if missing:
            raise SchemaValidationError(
                f"{self.name}: missing mandatory columns {sorted(missing)}"
            )
        mistyped = {
            name: (str(got[name]), str(expected[name]))
            for name in expected
            if got[name].simpleString() != expected[name].simpleString()
        }
        if mistyped:
            raise SchemaValidationError(f"{self.name}: type mismatches {mistyped}")
        self.extra_columns = sorted(got.keys() - expected.keys())

    def filter(self, condition: Column) -> "TypedDataset":
        return TypedDataset(self.df.filter(condition), self.schema, self.name)

    def flag(self, flag_col: str, condition: Column, flag_value: str) -> "TypedDataset":
        """Append ``flag_value`` to an array-typed QC column where
        condition holds (reference dataset.py QC-flag pattern)."""
        existing = (
            F.col(flag_col)
            if flag_col in self.df.columns
            else F.array().cast("array<string>")
        )
        updated = F.when(
            condition, F.array_union(existing, F.array(F.lit(flag_value)))
        ).otherwise(existing)
        new_schema = self.schema
        if flag_col not in {f.name for f in self.schema.fields}:
            new_schema = self.schema.add(flag_col, T.ArrayType(T.StringType()))
        return TypedDataset(
            self.df.withColumn(flag_col, updated), new_schema, self.name
        )

    def valid_rows(self, flag_col: str = "qualityControls") -> DataFrame:
        """Rows with an empty QC flag array."""
        if flag_col not in self.df.columns:
            return self.df
        return self.df.filter(F.size(F.col(flag_col)) == 0)
