"""Cross-engine-exact rounding for ratio-valued outputs.

``round(x, 6)`` is NOT portable for ratios of integers: Spark rounds the
shortest decimal representation (BigDecimal HALF_UP) while DuckDB rounds
the raw double, and when a ratio k/n terminates at exactly 7 decimal
digits (n = 2^a*5^b with max(a,b) = 7 — e.g. n = 128 tokens, n = 640
customers) the two disagree on the trailing-5 boundary. Found by the
sf0.1 oracle-parity sweep on cume_dist (640-customer nation).

``r6`` implements half-up rounding purely in IEEE double arithmetic —
floor(x * 1e6 + 0.5) / 1e6 — the same bit-for-bit computation in both
engines, so equality is guaranteed by construction instead of by luck of
the data. (For negative inputs this rounds toward +inf — e.g.
-0.1234565 -> -0.123456. Most callers feed non-negative ratios; the
signed statistics that use it — r_autocorrelation's acf — accept
toward-+inf as their cross-engine contract and say so in their
docstrings. Equality across engines holds either way: floor is floor.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCALE = 1_000_000


def rN(col: Column, digits: int) -> Column:
    """Half-up round to ``digits`` decimal places in pure IEEE double
    arithmetic — floor(x * 10^d + 0.5) / 10^d — identical bit-for-bit in
    Spark and DuckDB, unlike native ``round`` (see module docstring)."""
    scale = 10**digits
    return F.floor(col * scale + F.lit(0.5)) / scale


def rN_sql(expr: str, digits: int) -> str:
    scale = 10**digits
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"


def r6(col: Column) -> Column:
    return rN(col, 6)


def r6_sql(expr: str) -> str:
    return rN_sql(expr, 6)
