"""Merge gate for r_incremental_rollup (VERDICT r8 ask #2).

The query maintains a daily rollup incrementally: partial aggregates
for the already-landed prefix of each day (hour < INCR_CUTOVER_HOUR)
are MERGED with partials for the late tail of the SAME days.  These
tests pin the two properties the driver's oracle row alone cannot:

1. *Non-degeneracy*: a majority of (day, event_type) keys really do
   carry one partial from EACH side of the cutover, so the final
   re-aggregation merges two genuine partials — it is not a disjoint
   union in disguise (the ADVICE-r7 failure mode this gate exists to
   prevent from regressing).
2. *Merge is load-bearing*: replacing merge(partials) with a plain
   union of the two partial tables diverges from the full recompute.
   If a refactor ever drops the re-aggregation, this test goes red
   even though each partial row is individually "correct".
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bristle_spark.catalog import load_table
from bristle_spark.queries.analytic import INCR_CUTOVER_HOUR, r_incremental_rollup


def _partials(ev, pred):
    return (
        ev.filter(pred)
        .groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def test_most_keys_merge_two_partials(spark, sf_dir):
    """Majority of (day, event_type) keys must have events on BOTH
    sides of the within-day cutover — the fixture property that makes
    the driver's merge==recompute row a real merge test."""
    ev = load_table(spark, sf_dir, "events")
    existing = _partials(ev, F.hour("ts") < INCR_CUTOVER_HOUR)
    arriving = _partials(ev, F.hour("ts") >= INCR_CUTOVER_HOUR)

    n_keys = existing.select("day", "event_type").union(
        arriving.select("day", "event_type")
    ).distinct().count()
    n_both = existing.join(arriving, ["day", "event_type"], "inner").count()
    assert n_keys > 0
    # sf0.001 measures 121/150; any fixture SF stays well above half.
    assert n_both / n_keys > 0.5, f"merge degenerate: {n_both}/{n_keys} keys two-sided"


def test_union_instead_of_merge_fails(spark, sf_dir):
    """The broken variant — union of partials WITHOUT the final
    re-aggregation — must disagree with the query (and hence with the
    full-recompute oracle): every two-sided key appears twice with
    split counts.  Guards the algebraic step itself."""
    ev = load_table(spark, sf_dir, "events")
    existing = _partials(ev, F.hour("ts") < INCR_CUTOVER_HOUR)
    arriving = _partials(ev, F.hour("ts") >= INCR_CUTOVER_HOUR)
    broken_rows = existing.unionByName(arriving).count()

    merged = r_incremental_rollup(spark, sf_dir)
    merged_rows = merged.count()
    assert broken_rows > merged_rows, (
        "union-of-partials indistinguishable from merge — gate degenerate"
    )


def test_merge_equals_full_recompute(spark, sf_dir):
    """merge(partials) == one-shot recompute, checked engine-side
    (the driver checks the same identity against DuckDB)."""
    ev = load_table(spark, sf_dir, "events")
    recompute = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    merged = r_incremental_rollup(spark, sf_dir).select("day", "event_type", "n_events")
    assert merged.exceptAll(recompute).count() == 0
    assert recompute.exceptAll(merged).count() == 0
