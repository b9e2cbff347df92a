"""The driver supplies its *own* SparkSession to entry()/queries().
Simulate a hostile session (wrong timezone, ANSI on, case-insensitive,
no nanos support) and require the engine to self-correct via
ensure_session_confs."""

from __future__ import annotations

from bristle_spark.registry import all_specs
from bristle_spark.session import _ensured_sessions

SPECS = all_specs()


def _hostile_session(spark):
    s = spark.newSession()
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    s.conf.set("spark.sql.session.timeZone", "America/New_York")
    s.conf.set("spark.sql.ansi.enabled", "true")
    s.conf.set("spark.sql.caseSensitive", "false")
    _ensured_sessions.discard(id(s))
    return s


def test_events_query_survives_hostile_session(spark, sf_dir):
    hostile = _hostile_session(spark)
    # events has TIMESTAMP(NANOS): unreadable without nanosAsLong
    rows = SPECS["r_tumbling_window"].fn(hostile, sf_dir).collect()
    assert len(rows) > 0
    assert hostile.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    assert hostile.conf.get("spark.sql.session.timeZone") == "UTC"


def test_entry_contract_on_fresh_session(spark):
    import __spark_entry__ as entry_mod

    hostile = _hostile_session(spark)
    df = entry_mod.entry(hostile)
    assert len(df.collect()) > 0
