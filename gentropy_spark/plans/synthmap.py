"""Shared constants of the synthetic genome mapping.

The engine's genomics queries reinterpret the TPC-H-ish event stream as
summary statistics; these constants define the deterministic gene-grid
geometry both the L2G plans and the genomics trans-QTL queries use.
Kept in their own module so plans can share them without import cycles.
"""

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
BASE_US = 1_704_067_200_000_000  # 2024-01-01 UTC in µs
GENE_SPACING_US = 21_600_000_000  # 6 h
GENE_WIDTH_US = 14_400_000_000  # 4 h
V2G_FLANK_US = 7_200_000_000  # 2 h — genes cover 4h+2*2h = 8h > 6h spacing,
# so loci reach 1-2 candidate genes and the gold standard has negatives
