"""Deterministic fixed-point arithmetic for cross-engine float parity.

``round(x, 2)`` is NOT portable across engines: Spark rounds the decimal
expansion of the double (BigDecimal HALF_UP) while DuckDB computes
``round(x*100)/100`` in binary — on half-boundaries (common for money
values like 15352.905) they disagree by one cent. What IS portable is
round-to-integer of the *same* double: both engines round half away from
zero for positives and see bit-identical inputs.

So: measures are converted per row to scaled integers
(``round(x*scale) :: long``), aggregated in exact integer arithmetic
(associative — immune to fp summation-order noise across partitions),
and divided back at the end (same integer / same literal → identical
double in every engine).

Scale note: LongType fixed-point overflows past ~9.2e18; at 100 TB
(10^10+ rows) production aggregates would use Spark's DECIMAL(38,6)
sums instead — same plan shape, Tungsten-native. The long path here is
the oracle-parity mode.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fixed(col: Column | str, scale: int = 100) -> Column:
    """Per-row scaled-integer conversion: round(x*scale) as long."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("double") * scale, 0).cast("long")


def unfixed(col: Column, scale: int = 100) -> Column:
    """Back to double: identical integer / identical literal everywhere."""
    return col.cast("double") / F.lit(float(scale))
