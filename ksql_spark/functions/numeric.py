"""Cross-engine-portable numeric contracts.

``round(x, d)`` on doubles is NOT portable between Spark and DuckDB:
Spark rounds HALF_UP on the exact decimal expansion of the double, while
DuckDB rounds on the float product ``x * 10^d`` — for values within
~1e-10 of a d-th-digit half boundary the two disagree (proven at sf0.1 in
round 5: 3/5,000 ``quality_score`` rows flipped; BENCH/BASELINE.md).
Ratio-valued columns (averages, Jaccard/cosine similarities, normalized
features) land on or near those boundaries routinely, so every
oracle-checked ratio column uses this contract instead:

    floor(x * 1e6 + 0.5) / 1e6

which is pure IEEE multiply/add/floor/divide — bit-identical in any
engine for |x| < 2^53 / 1e6.  Columns that are exact k-decimal decimals
by construction (sums/min/max of 2-decimal inputs, 2x2-decimal products)
stay on ``round``: their distance to the nearest half boundary is >= 1e-5
while double error is ~1e-10 (see BENCH/ROUND_AUDIT_r06.md).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_round(col: Column, digits: int = 6) -> Column:
    """Engine-portable half-up rounding of a double column."""
    scale = float(10 ** digits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def sql_portable_round(expr: str, digits: int = 6) -> str:
    """The identical contract as ANSI/DuckDB SQL text."""
    scale = float(10 ** digits)
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"
