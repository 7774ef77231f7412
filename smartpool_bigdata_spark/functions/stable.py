"""Deterministic floating-point aggregates.

``sum()``/``avg()`` over DOUBLE are summation-order dependent: a distributed
engine adds partitions in nondeterministic order, so two runs (or two
engines) differ in the last ~3 ulps. Rounding the result does NOT fix this —
when the true value sits near a rounding boundary the noise flips the last
kept digit (observed round-1: ``-51.3788`` vs ``-51.3787``).

The fix: cast each addend to an exact DECIMAL *before* summation. Decimal
addition is associative and commutative, so the sum is bit-identical
regardless of partition order, parallelism, or engine — then one final
cast-to-double and round is deterministic. Cost: decimal sum is a few ×
slower per element than double sum, which is noise next to scan+shuffle cost
at 100 TB; correctness-critical aggregates (anything hashed, ranked, or
compared across engines) should pay it, throwaway exploration need not.

The reference never hit this because it only eyeballed results; an engine
with a value-hash correctness gate must sum deterministically.

DuckDB-oracle equivalents (same algebra, spelled in SQL):

* sum:  ``round(CAST(sum(CAST(x AS DECIMAL(38,10))) AS DOUBLE), s)``
* avg:  ``round(CAST(sum(CAST(x AS DECIMAL(38,10))) AS DOUBLE) / count(x), s)``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 28 integer digits / 10 fractional: exact for addends up to 1e28 with
# 1e-10 resolution — ample for 100 TB of sub-trillion money/metric values,
# and Spark's sum(DECIMAL(38,10)) keeps the full 38-digit headroom.
DECIMAL_T = "decimal(38,10)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def stable_sum(col: Column | str, scale: int | None = 2, dec: str = DECIMAL_T) -> Column:
    """Order-independent sum of a double column/expression.

    Returns DOUBLE rounded to ``scale`` (pass ``scale=None`` to skip
    rounding; the unrounded value is still deterministic).
    """
    s = F.sum(_col(col).cast(dec)).cast("double")
    return s if scale is None else F.round(s, scale)


def stable_avg(col: Column | str, scale: int | None = 4, dec: str = DECIMAL_T) -> Column:
    """Order-independent mean: exact decimal sum ÷ non-null count.

    One double division at the end — deterministic given deterministic
    inputs. Null-correct (divides by ``count(col)``, not ``count(*)``).
    """
    c = _col(col)
    a = F.sum(c.cast(dec)).cast("double") / F.count(c)
    return a if scale is None else F.round(a, scale)
