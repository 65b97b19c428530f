"""Bitflag quality projections — pure column expressions.

Mirrors the reference's summary-quality mapping (products.py:1787-1816
get_summary_qual_flag / get_qual_mask): a u4 bitflag word maps to severity
{0=GOOD, 1=SUSPECT, 2=DEGRADED, 3=BAD} by testing three mask words, highest
severity wins. Bit constants mirror products.py:36-56.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# severity levels (products.py:30-33 QUAL_IND_* pattern)
GOOD, SUSPECT, DEGRADED, BAD = 0, 1, 2, 3

# engine bit constants (disjoint bits, assembled per cell like
# raster_agg.py:304-371 wse/area/sig0 qual roll-ups)
QUAL_IND_SUS_UNCERT = 1 << 1
QUAL_IND_SUS_FEW_PIX = 1 << 2
QUAL_IND_SUS_BLOCKING_WIDTH = 1 << 3
QUAL_IND_DEG_OUT_OF_RANGE = 1 << 11
QUAL_IND_BAD_OUT_OF_BOUNDS = 1 << 20
QUAL_IND_BAD_NO_PIXELS = 1 << 21
QUAL_IND_BAD_FEW_PIXELS = 1 << 22


def summary_qual_col(flag: Column, sus_mask: int, deg_mask: int, bad_mask: int) -> Column:
    """Highest-severity-wins summary flag from a bitflag word."""
    return (
        F.when(flag.bitwiseAND(F.lit(bad_mask)) > 0, F.lit(BAD))
        .when(flag.bitwiseAND(F.lit(deg_mask)) > 0, F.lit(DEGRADED))
        .when(flag.bitwiseAND(F.lit(sus_mask)) > 0, F.lit(SUSPECT))
        .otherwise(F.lit(GOOD))
    )


def summary_qual_sql(flag_sql: str, sus_mask: int, deg_mask: int, bad_mask: int) -> str:
    """DuckDB/ANSI twin of summary_qual_col (bitwise AND spelled ``&``)."""
    return (
        f"(CASE WHEN (({flag_sql}) & {bad_mask}) > 0 THEN 3 "
        f"WHEN (({flag_sql}) & {deg_mask}) > 0 THEN 2 "
        f"WHEN (({flag_sql}) & {sus_mask}) > 0 THEN 1 ELSE 0 END)"
    )
