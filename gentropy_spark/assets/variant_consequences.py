"""Ensembl Variation consequence terms — static public asset (r9).

Mirrors the reference's assets/variant_consequences.py surface
(Consequence records, ``map_sequence_ontology`` and ``map_score``) as
a flat data table instead of a dataclass-per-enum-member. The terms,
SO accessions, impacts and ranks are the public Ensembl Variation
ranking (ensembl-variation Utils/Constants.pm); the score is the
reference's ``1 - rank / max(rank)`` rounded to 2 dp.

Note: the reference file carries a mechanical find-and-replace typo
("incomplete_labelinal_codon_variant"); this table uses the correct
public Ensembl term ``incomplete_terminal_codon_variant``
(SO_0001626).

The severity semantics consumed by the engine's queries live in
plans/variants.py (H29/H57/H75) over the synthetic gene grid; this
module is the full-fidelity public lookup for users porting reference
code that imports the asset directly.
"""

from __future__ import annotations

from typing import NamedTuple


class Consequence(NamedTuple):
    id: str
    label: str
    impact: str
    rank: int

    @property
    def score(self) -> float:
        return round(1.0 - self.rank / MAX_RANK, 2)


MAX_RANK = 41

# (SO accession, label, impact, rank) — ensembl-variation ranking.
_TABLE: tuple[tuple[str, str, str, int], ...] = (
    ("SO_0001893", "transcript_ablation", "HIGH", 1),
    ("SO_0001574", "splice_acceptor_variant", "HIGH", 2),
    ("SO_0001575", "splice_donor_variant", "HIGH", 3),
    ("SO_0001587", "stop_gained", "HIGH", 4),
    ("SO_0001589", "frameshift_variant", "HIGH", 5),
    ("SO_0001578", "stop_lost", "HIGH", 6),
    ("SO_0002012", "start_lost", "HIGH", 7),
    ("SO_0001889", "transcript_amplification", "HIGH", 8),
    ("SO_0001907", "feature_elongation", "HIGH", 9),
    ("SO_0001906", "feature_truncation", "HIGH", 10),
    ("SO_0001821", "inframe_insertion", "MODERATE", 11),
    ("SO_0001822", "inframe_deletion", "MODERATE", 12),
    ("SO_0001583", "missense_variant", "MODERATE", 13),
    ("SO_0001818", "protein_altering_variant", "MODERATE", 14),
    ("SO_0001787", "splice_donor_5th_base_variant", "LOW", 15),
    ("SO_0001630", "splice_region_variant", "LOW", 16),
    ("SO_0002170", "splice_donor_region_variant", "LOW", 17),
    ("SO_0002169", "splice_polypyrimidine_tract_variant", "LOW", 18),
    ("SO_0001626", "incomplete_terminal_codon_variant", "LOW", 19),
    ("SO_0002019", "start_retained_variant", "LOW", 20),
    ("SO_0001567", "stop_retained_variant", "LOW", 21),
    ("SO_0001819", "synonymous_variant", "LOW", 22),
    ("SO_0001580", "coding_sequence_variant", "MODIFIER", 23),
    ("SO_0001620", "mature_miRNA_variant", "MODIFIER", 24),
    ("SO_0001623", "5_prime_UTR_variant", "MODIFIER", 25),
    ("SO_0001624", "3_prime_UTR_variant", "MODIFIER", 26),
    ("SO_0001792", "non_coding_transcript_exon_variant", "MODIFIER", 27),
    ("SO_0001627", "intron_variant", "MODIFIER", 28),
    ("SO_0001621", "NMD_transcript_variant", "MODIFIER", 29),
    ("SO_0001619", "non_coding_transcript_variant", "MODIFIER", 30),
    ("SO_0001968", "coding_transcript_variant", "MODIFIER", 31),
    ("SO_0001631", "upstream_gene_variant", "MODIFIER", 32),
    ("SO_0001632", "downstream_gene_variant", "MODIFIER", 33),
    ("SO_0001895", "TFBS_ablation", "MODERATE", 34),
    ("SO_0001892", "TFBS_amplification", "MODIFIER", 35),
    ("SO_0001782", "TF_binding_site_variant", "MODIFIER", 36),
    ("SO_0001894", "regulatory_region_ablation", "MODIFIER", 37),
    ("SO_0001891", "regulatory_region_amplification", "MODIFIER", 38),
    ("SO_0001566", "regulatory_region_variant", "MODIFIER", 39),
    ("SO_0001628", "intergenic_variant", "MODIFIER", 40),
    ("SO_0001060", "sequence_variant", "MODIFIER", 41),
)

CONSEQUENCES: tuple[Consequence, ...] = tuple(
    Consequence(*row) for row in _TABLE
)


def map_sequence_ontology() -> dict[str, str]:
    """label → SO accession (reference classmethod parity)."""
    return {c.label: c.id for c in CONSEQUENCES}


def map_score() -> dict[str, float]:
    """label → severity score 1 - rank/41, 2 dp (reference parity)."""
    return {c.label: c.score for c in CONSEQUENCES}
