"""Shared determinism helpers for oracle-differential queries.

Why DECIMAL: a double sum is partition-order dependent — Spark's 32-way
partial aggregation and DuckDB's sequential scan accumulate in different
orders, so the low bits differ and an exact value-hash comparison fails.
Casting each addend to DECIMAL first makes the sum exact (the cast itself is
round-to-nearest of the *same* IEEE double in both engines, hence
identical), and the final DECIMAL -> DOUBLE cast is deterministic. This is
also the right call at 100 TB: money aggregation in decimal is standard, and
Spark decimal sums stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale 4 covers money values (2dp) and money*discount products (4dp)
# exactly; precision 30 leaves ~26 integer digits of headroom for 100 TB
# scale sums.
DEC = "decimal(30,4)"


def dsum(col: Column | str) -> Column:
    """Exact sum surfaced as DOUBLE: sum(cast(x as decimal)) :: double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Deterministic average: exact decimal sum cast to double, / count.

    Both engines then perform the same single IEEE division. (Plain
    ``avg(double)`` would be order-dependent; ``avg(decimal)`` has
    engine-specific result types.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    """DuckDB-side twin of dsum()."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,4))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB-side twin of davg()."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,4))) AS DOUBLE) / COUNT({expr})"
