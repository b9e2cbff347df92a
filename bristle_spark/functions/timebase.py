"""Shared day-index origin for every daily-resampled analytic key.

All keys that collapse ``events.ts`` to an integer day index (OLS
trend, DiD, pretrend, rolling correlation, the daily-cents CTE family)
measure days relative to THIS one epoch, spliced into both the Spark
plan and the DuckDB oracle from the single literal below — a drifted
copy of the constant silently shifts the intercept's meaning on one
side only (ADVICE r14).  2020-01-01 predates every generated fixture
timestamp, so day indexes are always non-negative.
"""

DAY_EPOCH = "2020-01-01"
