"""Allele string operations (SURVEY §2 — variant_direction surface).

Re-expresses /root/reference/src/gentropy/dataset/variant_direction.py
(:125 ``is_strand_ambiguous``, :162 ``reverse``, :189 ``complement``,
:219 ``variant_type``) as Column expressions. Variant type coding:
1=SNP, 2=INS, 3=DEL, 4=MNP (matching the reference's enum).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def reverse_allele(allele: Column) -> Column:
    return F.reverse(F.upper(allele))


def complement_allele(allele: Column) -> Column:
    return F.translate(F.upper(allele), "ACGT", "TGCA")


def is_strand_ambiguous(ref: Column, alt: Column) -> Column:
    """True when alt's reverse complement equals ref (palindromic pair)."""
    ref_u, alt_u = F.upper(ref), F.upper(alt)
    return (
        (F.length(ref_u) == F.length(alt_u))
        & (F.reverse(complement_allele(alt_u)) == ref_u)
    )


def variant_type(ref: Column, alt: Column) -> Column:
    """1=SNP, 2=INS, 3=DEL, 4=MNP (reference coding)."""
    ref_u, alt_u = F.upper(ref), F.upper(alt)
    return (
        F.when(F.length(alt_u) > F.length(ref_u), F.lit(2))
        .when(F.length(alt_u) < F.length(ref_u), F.lit(3))
        .when((F.length(alt_u) == 1) & (F.length(ref_u) == 1), F.lit(1))
        .otherwise(F.lit(4))
        .cast("int")
    )
